package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale evidence: bucketing co-locates joins (no
  * Exchange in the plan) and partitioned writes enable partition-
  * pruned downstream reads — the two levers that keep repeated
  * 100 TB joins/scans off the network.
  */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "fpay")
    val dims  = (1 to 1000).map(i => (i.toLong % 50, i)).toDF("k", "dpay")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_facts")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_dims")

    val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
    // disable AQE broadcast promotion for the assertion: we want the
    // co-located sort-merge path
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 0, s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 20000) // 1000 x 20 matches per key group
    spark.sql("DROP TABLE b_facts"); spark.sql("DROP TABLE b_dims")
  }

  test("partitioned writes give partition-pruned reads") {
    val out = tempDir("pw").toString + "/events"
    graft.queries.Tables.table(spark, sf("sf0.001"), "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)

    val pruned = spark.read.parquet(out).where(col("day") === lit("2024-01-03"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("day#"),
      s"expected a partition filter on day:\n$plan")
    val expected = graft.queries.Tables.table(spark, sf("sf0.001"), "events")
      .where(to_date(col("ts")) === lit("2024-01-03")).count()
    assert(pruned.count() == expected && expected > 0)
  }
}
