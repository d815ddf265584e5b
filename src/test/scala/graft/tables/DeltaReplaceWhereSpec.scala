package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._

/** replaceWhere: predicate-scoped overwrite — one atomic commit that
  * deletes the matching slice and inserts the new rows, rewriting only
  * the files that can hold matching rows.
  */
class DeltaReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)
  private def where(f: Filter*) = Filters.normalize(f)

  test("replaces exactly the matching slice; non-matching rows survive") {
    val dir = tempDir("delta-rw").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "us", "a"), (2L, "us", "b"), (3L, "eu", "c")).toDF("id", "region", "v"),
      dir)
    val res = DeltaWrite.replaceWhere(spark,
      Seq((10L, "us", "A"), (11L, "us", "B")).toDF("id", "region", "v"),
      dir, where(Filter("region", "=", "us")))
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "A", 11L -> "B", 3L -> "c"))
    // one commit: version advanced exactly once
    assert(DeltaLog.snapshot(spark, dir).version == res.version)
  }

  test("rows outside the predicate refuse; nothing commits") {
    val dir = tempDir("delta-rw-bad").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "us")).toDF("id", "region"), dir)
    val before = DeltaLog.snapshot(spark, dir).version
    intercept[IllegalArgumentException] {
      DeltaWrite.replaceWhere(spark,
        Seq((2L, "eu")).toDF("id", "region"),
        dir, where(Filter("region", "=", "us")))
    }
    assert(DeltaLog.snapshot(spark, dir).version == before)
    assert(t(dir)(spark, ReadArgs()).count() == 1L)
  }

  test("pruning: files that cannot hold matching rows are not rewritten") {
    val dir = tempDir("delta-rw-prune").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "lo")).toDF("id", "v"), dir)
    DeltaWrite.append(spark, Seq((100L, "hi")).toDF("id", "v"), dir)
    val res = DeltaWrite.replaceWhere(spark,
      Seq((200L, "HI")).toDF("id", "v"), dir, where(Filter("id", ">", 50L)))
    assert(res.filesRemoved == 1) // only the hi file replaced
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "lo", 200L -> "HI"))
  }

  test("a file straddling the predicate keeps its non-matching rows") {
    val dir = tempDir("delta-rw-straddle").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "keep"), (80L, "gone")).toDF("id", "v").coalesce(1), dir)
    DeltaWrite.replaceWhere(spark,
      Seq((90L, "new")).toDF("id", "v"), dir, where(Filter("id", ">", 50L)))
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "keep", 90L -> "new"))
  }

  test("partitioned table: replacing one partition leaves the rest byte-identical") {
    val dir = tempDir("delta-rw-part").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "us", "a"), (2L, "eu", "b"), (3L, "eu", "c")).toDF("id", "region", "v"),
      dir, partitionBy = Seq("region"))
    val euFilesBefore = DeltaLog.snapshot(spark, dir).files
      .filter(_.partitionValues.get("region").flatten.contains("eu")).map(_.path).toSet
    DeltaWrite.replaceWhere(spark,
      Seq((10L, "us", "A")).toDF("id", "region", "v"),
      dir, where(Filter("region", "=", "us")))
    val snap = DeltaLog.snapshot(spark, dir)
    val euFilesAfter = snap.files
      .filter(_.partitionValues.get("region").flatten.contains("eu")).map(_.path).toSet
    assert(euFilesAfter == euFilesBefore) // untouched partition not rewritten
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "A", 2L -> "b", 3L -> "c"))
  }

  test("NULL-predicate rows survive, as in DELETE") {
    val dir = tempDir("delta-rw-null").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, Some(5L)), (2L, None), (3L, Some(99L))).toDF("id", "qty"), dir)
    DeltaWrite.replaceWhere(spark,
      Seq((10L, Some(77L))).toDF("id", "qty"), dir, where(Filter("qty", ">", 50L)))
    val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 10L))
  }

  test("CDF tables record the replaced slice as deletes and the new rows as inserts") {
    val dir = tempDir("delta-rw-cdf").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val res = DeltaWrite.replaceWhere(spark,
      Seq((1L, "new")).toDF("id", "v"), dir, where(Filter("id", "=", 1L)))
    val changes = DeltaChanges.between(spark, dir, res.version, res.version)
      .select("id", "v", DeltaChanges.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(changes == Set((1L, "old", "delete"), (1L, "new", "insert")))
  }

  test("append-only tables refuse replaceWhere") {
    val dir = tempDir("delta-rw-ao").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.appendOnly" -> "true"))
    intercept[IllegalArgumentException] {
      DeltaWrite.replaceWhere(spark,
        Seq((2L, "b")).toDF("id", "v"), dir, where(Filter("id", "=", 1L)))
    }
  }

  test("constraints apply to the incoming rows") {
    val dir = tempDir("delta-rw-ck").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 5L)).toDF("id", "qty"), dir)
    DeltaDdl.addCheckConstraint(spark, dir, "qty_pos", "qty > 0")
    val before = DeltaLog.snapshot(spark, dir).version
    intercept[Exception] {
      DeltaWrite.replaceWhere(spark,
        Seq((1L, -3L)).toDF("id", "qty"), dir, where(Filter("id", "=", 1L)))
    }
    assert(DeltaLog.snapshot(spark, dir).version == before)
  }

  test("row-tracked table: survivors keep their row ids, new rows mint fresh ones") {
    val dir = tempDir("delta-rw-rt").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableRowTracking" -> "true"))
    DeltaWrite.append(spark,
      Seq((1L, "keep"), (2L, "gone")).toDF("id", "v").coalesce(1), dir)
    def ids() = t(dir)(spark, ReadArgs(extra = Map(t(dir).RowIdsKey -> true)))
      .select("id", "_row_id")
      .as[(Long, Option[Long])].collect().toMap
    val before = ids()
    DeltaWrite.replaceWhere(spark,
      Seq((3L, "new")).toDF("id", "v"), dir, where(Filter("id", ">=", 2L)))
    val after = ids()
    assert(after(1L) == before(1L)) // survivor kept its id
    assert(after(3L).isDefined &&
      !before.values.flatten.toSet.contains(after(3L).get)) // fresh id
  }
}
