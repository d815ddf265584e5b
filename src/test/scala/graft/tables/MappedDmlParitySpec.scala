package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PARITY property: the same randomized DML sequence applied to an
  * UNMAPPED table and to a NAME-MAPPED twin (same rows, physical
  * names `col-*`) must converge to identical contents after every
  * step — the strongest guard that the mapped write paths
  * (positional scans, physical staging, stats keys, partitionValues
  * keys, CDF files) route names correctly rather than merely not
  * crashing. Deterministic seed; ops span the whole DML surface the
  * r13 lift opened: CoW UPDATE/DELETE, DV DELETE/UPDATE, MERGE
  * (upsert + delete-matched), replaceWhere and OPTIMIZE.
  */
class MappedDmlParitySpec extends SparkSpec {
  import spark.implicits._

  private def mapped(name: String, dt: DataType, id: Int): StructField =
    StructField(name, dt, nullable = true,
      metadata = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong)
        .putString(DeltaLog.PhysicalNameKey, f"col-$id%02d")
        .build())

  private def freshPair(tag: String): (String, String) = {
    val base = tempDir(s"dml-parity-$tag").toString
    val plain = base + "/plain"
    val m = base + "/mapped"
    val rows = (0L until 40L).map(i => (i, s"v$i", (i % 4).toInt)).toDF("id", "v", "p")
    DeltaWrite.append(spark, rows, plain, partitionBy = Seq("p"))
    DeltaDdl.createTable(spark, m,
      StructType(Seq(mapped("id", LongType, 1), mapped("v", StringType, 2),
        mapped("p", IntegerType, 3))),
      partitionBy = Seq("p"),
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3"))
    DeltaWrite.append(spark, rows, m)
    (plain, m)
  }

  private def contents(dir: String): Set[(Long, String, Int)] =
    new DeltaTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "v", "p").as[(Long, String, Int)].collect().toSet

  test("randomized DML sequences converge identically on mapped and unmapped twins") {
    val rnd = new scala.util.Random(13)
    val (plain, m) = freshPair("rand")
    val targets = Seq(plain, m)

    def bothDirs(f: String => Unit): Unit = targets.foreach(f)

    (1 to 12).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // CoW UPDATE
          val k = rnd.nextInt(40).toLong
          bothDirs(d => DeltaWrite.updateWhere(spark, d,
            Filters.normalize(Seq(Filter("id", "=", k))),
            Seq("v" -> s"'u$step'")))
        case 1 => // CoW DELETE
          val k = rnd.nextInt(40).toLong
          bothDirs(d => DeltaWrite.deleteWhere(spark, d,
            Filters.normalize(Seq(Filter("id", "=", k)))))
        case 2 => // DV DELETE
          val lo = rnd.nextInt(35).toLong
          bothDirs(d => DeltaWrite.deleteWhereDv(spark, d,
            Filters.normalize(Seq(Filter("id", ">=", lo), Filter("id", "<", lo + 3)))))
        case 3 => // DV UPDATE
          val k = rnd.nextInt(40).toLong
          bothDirs(d => DeltaWrite.updateWhereDv(spark, d,
            Filters.normalize(Seq(Filter("id", "=", k))),
            Seq("v" -> s"'dv$step'")))
        case 4 => // MERGE upsert (existing + fresh key)
          val k = rnd.nextInt(40).toLong
          val fresh = 1000L + step
          val src = Seq((k, s"m$step", (k % 4).toInt),
            (fresh, s"new$step", (fresh % 4).toInt)).toDF("id", "v", "p")
          bothDirs(d => DeltaWrite.merge(spark, d, src, Seq("id")))
        case 5 => // replaceWhere one partition slice
          val part = rnd.nextInt(4)
          val src = Seq((2000L + step, s"rw$step", part)).toDF("id", "v", "p")
          bothDirs(d => DeltaWrite.replaceWhere(spark, src, d,
            Filters.normalize(Seq(Filter("p", "=", part)))))
        case _ => // OPTIMIZE (bin-pack; DV files materialize)
          bothDirs(d => { DeltaWrite.optimize(spark, d); () })
      }
      assert(contents(plain) == contents(m),
        s"divergence after step $step (op history is seed-determined)")
    }

    // and the physical invariant held throughout: every mapped add
    // keeps physical partitionValues keys
    DeltaLog.snapshot(spark, m).files.foreach(f =>
      assert(f.partitionValues.keySet == Set("col-03"), f.partitionValues))
  }

  test("conditional catalog MERGE converges identically on mapped and unmapped twins") {
    val (plain, m) = freshPair("condmerge")
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    // force catalog init so the DML strategy registers
    spark.sql(s"SELECT count(*) FROM graft.`$plain`").collect()
    Seq((1L, "up", 1), (2L, "skip", 2), (77L, "ins", 1)).toDF("id", "v", "p")
      .createOrReplaceTempView("mapped_cond_src")
    for (d <- Seq(plain, m))
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mapped_cond_src s ON t.id = s.id
           |WHEN MATCHED AND s.v = 'up'
           |  THEN UPDATE SET v = concat(t.v, '+', s.v)
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(contents(plain) == contents(m))
    val c = contents(m)
    assert(c.contains((1L, "v1+up", 1)))   // matched, condition true
    assert(c.contains((2L, "v2", 2)))      // matched, condition false: untouched
    assert(c.contains((77L, "ins", 1)))    // unmatched: inserted
  }
}
