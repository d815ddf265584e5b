package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** The per-file attach layer (FileConstAttr / FileLongAttr /
  * DvDeleted / MetadataPathDecode) is CODEGEN'D (r14): these cases
  * run the full lakehouse read shapes with codegen fallback DISABLED,
  * so a Janino compile error in any generated attach expression fails
  * the suite instead of silently degrading to interpreted eval — and
  * assert the attach expressions sit INSIDE a WholeStageCodegen span.
  * The k-partition-column tuple collapse (one shared path→tuple map,
  * k struct extractions) is exercised by the two-partition-column
  * fixtures.
  */
class AttachCodegenSpec extends SparkSpec {
  import spark.implicits._

  private def noFallback[A](body: => A): A = {
    val conf = spark.conf
    val savedFb = conf.getOption("spark.sql.codegen.fallback")
    val savedFm = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      savedFb.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      savedFm.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("two-partition-column Delta + DV delete reads fully codegen'd") {
    val dir = tempDir("acg-delta").toString + "/t"
    val df = (1L to 20L).map(i => (i, (i % 2).toInt, s"g${i % 3}", s"v$i"))
      .toDF("id", "p", "q", "v")
    DeltaWrite.append(spark, df, dir, partitionBy = Seq("p", "q"))
    DeltaWrite.deleteWhereDv(spark, dir,
      Seq(Seq(Filter("id", "in", Seq(3L, 8L)))))
    noFallback {
      val t = new DeltaTable("t", dir)
      val out = t(spark, ReadArgs.empty)
      // the attach expressions live inside a WholeStageCodegen span
      val plan = out.queryExecution.executedPlan
      val spans = plan.collect { case w: WholeStageCodegenExec => w }
      assert(spans.exists(w =>
        w.toString.contains("graft_file_const_attr")), plan.toString)
      val got = out.select("id", "p", "q").as[(Long, Int, String)]
        .collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == (1L to 20L).filterNot(Set(3L, 8L)))
      got.foreach { case (i, p, q) =>
        assert(p == (i % 2).toInt && q == s"g${i % 3}")
      }
    }
  }

  test("row-tracking read (FileLongAttr) survives codegen-only mode") {
    val dir = tempDir("acg-rt").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "pre")).toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableRowTracking" -> "true"))
    DeltaWrite.append(spark, (10L to 12L).map(i => (i, "a")).toDF("id", "v"), dir)
    noFallback {
      val t = new DeltaTable("t", dir)
      val ids = t(spark, ReadArgs(extra = Map(t.RowIdsKey -> true)))
        .select("id", "_row_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(ids(1L).isEmpty) // pre-feature file: null id, not invented
      assert(ids.filterKeys(_ >= 10L).values.flatten
        .map(_.asInstanceOf[Long]).toSeq.sorted == Seq(0L, 1L, 2L))
    }
  }

  test("Iceberg eq-delete + identity-partition read survives codegen-only mode") {
    val dir = tempDir("acg-ice").toString + "/t"
    val df = (1L to 12L).map(i => (i, (i % 2).toInt, s"v$i")).toDF("id", "p", "v")
    IcebergWrite.append(spark, df, dir, partitionBy = Seq("p"))
    IcebergWrite.deleteEquality(spark, dir,
      Seq(Tuple1(4L), Tuple1(7L)).toDF("id"))
    noFallback {
      val got = new IcebergTable("t", dir)(spark, ReadArgs.empty)
        .select("id", "p").as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == (1L to 12L).filterNot(Set(4L, 7L)))
      got.foreach { case (i, p) => assert(p == (i % 2).toInt) }
    }
  }

  test("CDF range read (tuple attach on the _change_data leg) survives codegen-only mode") {
    val dir = tempDir("acg-cdf").toString + "/t"
    DeltaWrite.append(spark,
      (1L to 8L).map(i => (i, (i % 2).toInt, s"v$i")).toDF("id", "p", "v"),
      dir, partitionBy = Seq("p"))
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.updateWhere(spark, dir,
      Seq(Seq(Filter("id", "=", 3L))), Seq("v" -> "'V3'"))
    noFallback {
      val changes = DeltaChanges.between(spark, dir, 2, 2)
        .select("id", "p", "_change_type")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      assert(changes.toSet == Set(
        (3L, 1, "update_preimage"), (3L, 1, "update_postimage")), changes.toSeq)
    }
  }

  test("DML positional scan (DV delete on a partitioned table) survives codegen-only mode") {
    val dir = tempDir("acg-dml").toString + "/t"
    DeltaWrite.append(spark,
      (1L to 12L).map(i => (i, (i % 3).toInt, s"v$i")).toDF("id", "p", "v"),
      dir, partitionBy = Seq("p"))
    noFallback {
      // the delete's candidate scan attaches partition tuples and
      // row positions; the surviving read applies the DV filter —
      // both inside generated code
      DeltaWrite.deleteWhereDv(spark, dir,
        Seq(Seq(Filter("id", "in", Seq(2L, 7L, 12L)))))
      val got = new DeltaTable("t", dir)(spark, ReadArgs.empty)
        .select("id", "p").as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == (1L to 12L).filterNot(Set(2L, 7L, 12L)))
      got.foreach { case (i, p) => assert(p == (i % 3).toInt) }
    }
  }

  test("Hudi MOR upsert read (MetadataPathDecode) survives codegen-only mode") {
    val dir = tempDir("acg-hudi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    HudiWrite.upsert(spark,
      Seq((2L, "B", 0), (3L, "c", 0)).toDF("id", "v", "part"), dir)
    noFallback {
      val got = new HudiTable("t", dir)(spark, ReadArgs.empty)
        .select("id", "v").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "B"), (3L, "c")))
    }
  }
}
