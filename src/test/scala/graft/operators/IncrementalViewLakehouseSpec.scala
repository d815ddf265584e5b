package graft.operators

import graft.SparkSpec
import graft.tables.{HudiWrite, IcebergWrite}

/** IncrementalView over Iceberg and Hudi bases (the ChangeFeed
  * dispatch): refreshes track equality upserts/deletes (Iceberg) and
  * MOR log upserts/tombstones (Hudi) exactly, the view staying equal
  * to the from-scratch aggregate after every mutation.
  */
class IncrementalViewLakehouseSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("cat")
  private val sums = Seq(("v", "sum_v"))

  private def viewRows(path: String): Set[(String, Long, Long)] = {
    val t = new graft.tables.DeltaTable("v", path)
    t(spark).select("cat", "n_rows", "sum_v").as[(String, Long, Long)].collect().toSet
  }

  private def expected(basePath: String): Set[(String, Long, Long)] =
    IncrementalView.fullCompute(spark, basePath, keys, sums)
      .as[(String, Long, Long)].collect().toSet

  test("refresh tracks an Iceberg base through upsert and delete commits") {
    val base = tempDir("ivm-ice").toString + "/base"
    val view = tempDir("ivm-ice-v").toString + "/view"
    IcebergWrite.append(spark,
      Seq.tabulate(30)(i => (i.toLong, s"c${i % 3}", i.toLong * 10))
        .toDF("id", "cat", "v"), base)
    IncrementalView.initialize(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base))

    // append-only commit
    IcebergWrite.append(spark, Seq((100L, "c0", 7L), (101L, "c3", 9L))
      .toDF("id", "cat", "v"), base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after append")

    // atomic equality upsert: moves value mass within c1 + new key
    IcebergWrite.upsertEquality(spark,
      Seq((1L, "c1", 1000L), (102L, "c4", 5L)).toDF("id", "cat", "v"),
      base, Seq("id"))
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after upsert")

    // equality delete emptying a key
    IcebergWrite.deleteEquality(spark, base,
      Seq(101L).toDF("id"))
    IncrementalView.refresh(spark, base, view, keys, sums)
    val afterDelete = viewRows(view)
    assert(afterDelete == expected(base), "after delete")
    assert(!afterDelete.exists(_._1 == "c3"), "emptied key must leave the view")

    // idempotent: a second refresh is a no-op
    val w1 = IncrementalView.refresh(spark, base, view, keys, sums)
    val w2 = IncrementalView.refresh(spark, base, view, keys, sums)
    assert(w1 == w2 && viewRows(view) == expected(base))
  }

  test("refreshMerge works over an Iceberg base") {
    val base = tempDir("ivm-ice-m").toString + "/base"
    val view = tempDir("ivm-ice-mv").toString + "/view"
    IcebergWrite.append(spark,
      Seq.tabulate(30)(i => (i.toLong, s"c${i % 3}", i.toLong)).toDF("id", "cat", "v"),
      base)
    IncrementalView.initialize(spark, base, view, keys, sums)
    IcebergWrite.upsertEquality(spark,
      Seq((0L, "c0", 99L)).toDF("id", "cat", "v"), base, Seq("id"))
    IncrementalView.refreshMerge(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base))
  }

  test("refresh tracks a Hudi MOR base through log upserts and tombstones") {
    val base = tempDir("ivm-hudi").toString + "/base"
    val view = tempDir("ivm-hudi-v").toString + "/view"
    HudiWrite.bulkInsert(spark,
      Seq.tabulate(30)(i => (i.toLong, s"c${i % 3}", i.toLong * 10, i % 2))
        .toDF("id", "cat", "v", "part"),
      base, "id", Seq("part"), tableType = "MERGE_ON_READ")
    IncrementalView.initialize(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base))

    // MOR upsert: update + insert in one deltacommit
    HudiWrite.upsert(spark,
      Seq((1L, "c1", 999L, 1), (100L, "c9", 5L, 0)).toDF("id", "cat", "v", "part"),
      base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after MOR upsert")

    // tombstone delete emptying key c9
    HudiWrite.delete(spark, Seq(100L).toDF("id"), base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    val afterDelete = viewRows(view)
    assert(afterDelete == expected(base), "after tombstones")
    assert(!afterDelete.exists(_._1 == "c9"), "emptied key must leave the view")

    // compaction must be a watermark-advancing NO-OP for the view
    HudiWrite.compact(spark, base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after compaction")
  }
}
