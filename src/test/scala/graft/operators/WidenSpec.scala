package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r15 optimization round's parallelism-repair internals:
  * [[Widen.byKeys]] (narrow keyed aggregates), NearDup's pinned
  * candidate-pair shuffles, and the footer-schema cache — the plan
  * changes must never change results, and the widen must be
  * scale-adaptive (no-op on wide inputs), never a local[4] constant.
  */
class WidenSpec extends SparkSpec {
  import spark.implicits._

  test("byKeys widens a narrow input to defaultParallelism") {
    val narrow = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
    val wide = Widen.byKeys(narrow, Seq(col("k")))
    assert(wide.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(wide.collect().toSet == narrow.collect().toSet)
  }

  test("byKeys is identity on already-wide inputs (the cluster shape)") {
    val p = spark.sparkContext.defaultParallelism
    val wide = spark.range(100).toDF("k").repartition(p + 2)
    assert(Widen.byKeys(wide, Seq(col("k"))) eq wide)
  }

  test("keepFirst results are unchanged by the widen (narrow vs wide input)") {
    val rows = Seq(
      (1L, 2, "x"), (1L, 1, "y"), (2L, 5, "z"), (2L, 4, "w"), (3L, 9, "q"))
    val narrow = rows.toDF("k", "ord", "v").coalesce(1)
    val wide = rows.toDF("k", "ord", "v")
      .repartition(spark.sparkContext.defaultParallelism + 2, col("k"))
    val a = Dedup.keepFirst(narrow, Seq("k"), Some("ord")).collect().toSet
    val b = Dedup.keepFirst(wide, Seq("k"), Some("ord")).collect().toSet
    assert(a == b)
    assert(a.map(r => (r.getLong(0), r.getInt(1))) ==
      Set((1L, 1), (2L, 4), (3L, 9)))
  }

  test("Upsert.merge results are unchanged by the widen") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p").coalesce(1)
    val upd = Seq((2L, 99.0), (3L, 30.0)).toDF("k", "p").coalesce(1)
    val merged = Upsert.merge(base, upd, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(merged == Set((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("minhashPairs candidate shuffle is pinned (REPARTITION_BY_NUM, not coalescible)") {
    val docs = (1 to 40).map(i => (i.toLong, s"shared prefix text $i padding"))
      .toDF("doc_id", "text")
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text",
      k = 5, numHashes = 8, bands = 2, threshold = 0.5)
    pairs.count() // AQE-finalize
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"candidate-pair exchange must be exempt from AQE coalescing; plan:\n$plan")
  }

  test("SchemaCache: cached read returns identical schema and rows") {
    val dir = tempDir("schemacache").toString
    spark.range(10).selectExpr("id", "id * 2 as d").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val first = graft.tables.SchemaCache.readParquet(spark, s"$dir/t.parquet")
    val second = graft.tables.SchemaCache.readParquet(spark, s"$dir/t.parquet")
    assert(first.schema == second.schema)
    assert(second.count() == 10)
    assert(second.agg(sum("d")).as[Long].head() == 90L)
  }
}
