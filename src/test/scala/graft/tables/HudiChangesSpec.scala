package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed changelog read (HudiTable.changes): per-commit key diffs of
  * touched file groups into insert/delete rows — COW rewrites, MOR
  * log upserts and tombstones, and maintenance commits contributing
  * nothing.
  */
class HudiChangesSpec extends SparkSpec {
  import spark.implicits._

  private def changed(dir: String, from: String, to: Option[String] = None) =
    new HudiTable("t", dir).changes(spark, from, to)
      .select(col("id").as[Long], col("v").as[String],
        col(HudiTable.ChangeTypeCol).as[String],
        col(HudiTable.ChangeOrdinalCol).as[Int])
      .collect().toSet

  test("COW: upsert emits pre-image deletes + post-image inserts; delete emits deletes") {
    val dir = tempDir("hudi-chg-cow").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    HudiWrite.upsert(spark, Seq((2L, "B", 0), (4L, "d", 1)).toDF("id", "v", "part"), dir)
    HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    assert(changed(dir, i1) == Set(
      (2L, "b", "delete", 1), (2L, "B", "insert", 1), (4L, "d", "insert", 1),
      (1L, "a", "delete", 2)))
  }

  test("MOR: log upserts and tombstones; compaction contributes nothing") {
    val dir = tempDir("hudi-chg-mor").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((2L, "B", 0), (3L, "c", 0)).toDF("id", "v", "part"), dir)
    HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    val preCompact = changed(dir, i1)
    assert(preCompact == Set(
      (2L, "b", "delete", 1), (2L, "B", "insert", 1), (3L, "c", "insert", 1),
      (1L, "a", "delete", 2)))
    // compaction rewrites files but preserves keys and commit times —
    // the changelog across it must not change
    assert(HudiWrite.compact(spark, dir).nonEmpty)
    assert(changed(dir, i1) == preCompact)
  }

  test("full history from the epoch includes the bulk insert; empty range is empty") {
    val dir = tempDir("hudi-chg-full").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    assert(changed(dir, "") == Set((1L, "a", "insert", 1)))
    val empty = new HudiTable("t", dir).changes(spark, i1)
    assert(empty.count() == 0)
    assert(empty.columns.contains(HudiTable.ChangeTypeCol))
  }

  test("changelog columns: instant and timestamp ride every row") {
    val dir = tempDir("hudi-chg-cols").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val i2 = HudiWrite.upsert(spark, Seq((1L, "A", 0)).toDF("id", "v", "part"), dir)
    val rows = new HudiTable("t", dir).changes(spark, "", Some(i2))
    assert(rows.where(col(HudiTable.CommitInstantCol) === i2).count() == 2)
    assert(rows.where(col(HudiTable.CommitTimestampCol).isNull).count() == 0)
  }
}
