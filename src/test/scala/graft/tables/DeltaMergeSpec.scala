package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._

class DeltaMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String, Double)], partitioned: Boolean = false): String = {
    val dir = tempDir("delta-merge").toString + "/t"
    DeltaWrite.append(spark, rows.toDF("id", "grp", "v").coalesce(1), dir,
      partitionBy = if (partitioned) Seq("grp") else Seq.empty)
    dir
  }

  private def state(dir: String): Set[(Long, String, Double)] =
    new DeltaTable("t", dir)(spark, ReadArgs())
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet

  test("merge updates matched keys and inserts new ones") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    val res = DeltaWrite.merge(spark,  dir,
      Seq((2L, "a", 20.0), (4L, "b", 40.0)).toDF("id", "grp", "v"), Seq("id"))
    assert(res.version == 1L)
    assert(state(dir) == Set(
      (1L, "a", 1.0), (2L, "a", 20.0), (3L, "b", 3.0), (4L, "b", 40.0)))
  }

  test("single-key merge prunes files outside the source key range") {
    val dir = tempDir("delta-mp").toString + "/t"
    // two files with disjoint id ranges
    DeltaWrite.append(spark,
      (1L to 100L).map(i => (i, "a", i.toDouble)).toDF("id", "grp", "v").coalesce(1), dir)
    DeltaWrite.append(spark,
      (1000L to 1100L).map(i => (i, "a", i.toDouble)).toDF("id", "grp", "v").coalesce(1), dir)
    val before = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet

    val res = DeltaWrite.merge(spark, dir,
      Seq((1050L, "a", -1.0)).toDF("id", "grp", "v"), Seq("id"))
    // only the second file's range overlaps the source key → 1 remove
    assert(res.filesRemoved == 1, s"expected 1 file rewritten, got ${res.filesRemoved}")
    val after = DeltaLog.snapshot(spark, dir)
    // the low-range file survived untouched
    assert(before.intersect(after.files.map(_.path).toSet).size == 1)
    assert(state(dir).contains((1050L, "a", -1.0)))
    assert(state(dir).size == 201)
  }

  test("merge on a DV-bearing file does not resurrect deleted rows") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0)))
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("id", "=", 1L))))
    DeltaWrite.merge(spark, dir,
      Seq((2L, "a", 20.0)).toDF("id", "grp", "v"), Seq("id"))
    assert(state(dir) == Set((2L, "a", 20.0), (3L, "a", 3.0)))
    // the rewrite purged the DV
    assert(DeltaLog.snapshot(spark, dir).files.forall(_.dv.isEmpty))
  }

  test("merge on a CDF table classifies changes as pre/postimage and insert") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)), partitioned = true)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.merge(spark, dir,
      Seq((2L, "b", 20.0), (5L, "a", 50.0)).toDF("id", "grp", "v"), Seq("id"))

    val ch = DeltaChanges.between(spark, dir, 2)
      .select(col("id"), col("v"), col(DeltaChanges.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSet
    assert(ch == Set(
      (2L, 2.0, "update_preimage"),
      (2L, 20.0, "update_postimage"),
      (5L, 50.0, "insert")), s"got $ch")
  }

  test("merge refuses schema drift and handles an empty source") {
    val dir = freshTable(Seq((1L, "a", 1.0)))
    assertThrows[IllegalArgumentException] {
      DeltaWrite.merge(spark, dir, Seq((1L, "a")).toDF("id", "grp"), Seq("id"))
    }
    val res = DeltaWrite.merge(spark, dir,
      Seq.empty[(Long, String, Double)].toDF("id", "grp", "v"), Seq("id"))
    assert(res.version == 0L && res.filesAdded == 0)
  }

  test("WHEN MATCHED AND cond THEN DELETE: matched-delete, fall-through update, unmatched insert") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    // v<0 flags deletion: id=1 matched → deleted; id=2 cond false →
    // updated; id=4 cond true but unmatched → NOT MATCHED insert
    val res = DeltaWrite.merge(spark, dir,
      Seq((1L, "a", -1.0), (2L, "a", 20.0), (4L, "b", -4.0)).toDF("id", "grp", "v"),
      Seq("id"), deleteWhenMatched = Some("v < 0"))
    assert(res.version == 1L)
    assert(state(dir) == Set((2L, "a", 20.0), (3L, "b", 3.0), (4L, "b", -4.0)))
  }

  test("a NULL delete condition falls through to the update clause") {
    val dir = tempDir("delta-merge").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", Option(1.0)), (2L, "a", Option(2.0))).toDF("id", "grp", "v"), dir)
    DeltaWrite.merge(spark, dir,
      Seq((1L, "a", Option.empty[Double]), (2L, "a", Option(-2.0)))
        .toDF("id", "grp", "v"),
      Seq("id"), deleteWhenMatched = Some("v < 0"))
    val df = new DeltaTable("t", dir)(spark, ReadArgs())
    // id=1: cond NULL → updated to null v, not deleted; id=2: deleted
    assert(df.where("id = 1 AND v IS NULL").count() == 1)
    assert(df.count() == 1)
  }

  test("matched-delete emits cdc delete rows; txn marker lands in the same commit") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)), partitioned = true)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.merge(spark, dir,
      Seq((1L, "a", -1.0), (2L, "b", 20.0), (5L, "a", 50.0)).toDF("id", "grp", "v"),
      Seq("id"), deleteWhenMatched = Some("v < 0"),
      txn = Some(("app-x", 42L)))
    val ch = DeltaChanges.between(spark, dir, 2)
      .select(col("id"), col("v"), col(DeltaChanges.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSet
    assert(ch == Set(
      (1L, 1.0, "delete"),
      (2L, 2.0, "update_preimage"),
      (2L, 20.0, "update_postimage"),
      (5L, 50.0, "insert")), s"got $ch")
    assert(DeltaLog.snapshot(spark, dir, withFiles = false).txns.get("app-x").contains(42L))
  }

  test("merge requireBase refuses when the table moved past the pinned version") {
    val dir = freshTable(Seq((1L, "a", 1.0)))
    val pinned = DeltaLog.snapshot(spark, dir, withFiles = false).version
    DeltaWrite.append(spark, Seq((9L, "z", 9.0)).toDF("id", "grp", "v"), dir)
    intercept[DeltaWrite.ConcurrentWriteException] {
      DeltaWrite.merge(spark, dir,
        Seq((1L, "a", 10.0)).toDF("id", "grp", "v"), Seq("id"),
        requireBase = Some(pinned))
    }
    assert(state(dir) == Set((1L, "a", 1.0), (9L, "z", 9.0)))
  }

  test("all-null source keys insert (null never equals), consistently with mixed") {
    // the table must declare id NULLABLE: a primitive-Long frame would
    // create a NOT NULL column, and the policy layer (correctly)
    // refuses null keys on such a table
    val dir = tempDir("delta-merge").toString + "/t"
    DeltaWrite.append(spark,
      Seq((Option(1L), "a", 1.0)).toDF("id", "grp", "v"), dir)
    val allNull = Seq((Option.empty[Long], "n", 7.0)).toDF("id", "grp", "v")
    val r1 = DeltaWrite.merge(spark, dir, allNull, Seq("id"))
    assert(r1.filesAdded >= 1, "all-null-key source must still insert")
    val df = new DeltaTable("t", dir)(spark, ReadArgs())
    assert(df.where("id IS NULL AND grp = 'n'").count() == 1)
    assert(df.count() == 2)
  }
}
