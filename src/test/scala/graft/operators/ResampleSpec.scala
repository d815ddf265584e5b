package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val Step = 10L // 10-micro grid for readable tests

  private def fill(rows: Seq[(Int, Long, Double)]): Seq[(Int, Long, Double)] =
    Resample.gapFill(
      rows.toDF("k", "t", "v").withColumn("t", timestamp_micros(col("t"))),
      "k", "t", "v", Step)
      .orderBy("k", "grid_us")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

  test("gaps fill forward with epoch-aligned instants") {
    // key 1: obs at 12 (v=1.0) and 41 (v=2.0): grid 20,30,40 carry 1.0; none ≥ 41 except... 41 covers nothing (next multiple 50 > 41)
    val got = fill(Seq((1, 12L, 1.0), (1, 41L, 2.0)))
    assert(got == Seq((1, 20L, 1.0), (1, 30L, 1.0), (1, 40L, 1.0)))
  }

  test("observation exactly on the grid takes effect at its own instant") {
    val got = fill(Seq((1, 10L, 1.0), (1, 30L, 2.0), (1, 50L, 3.0)))
    assert(got == Seq((1, 10L, 1.0), (1, 20L, 1.0), (1, 30L, 2.0), (1, 40L, 2.0), (1, 50L, 3.0)))
  }

  test("simultaneous observations collapse to the max value") {
    val got = fill(Seq((1, 10L, 5.0), (1, 10L, 7.0), (1, 25L, 1.0)))
    assert(got == Seq((1, 10L, 7.0), (1, 20L, 7.0)))
  }

  test("keys fill independently; a single off-grid observation emits nothing") {
    val got = fill(Seq((1, 10L, 1.0), (1, 20L, 2.0), (2, 13L, 9.0)))
    assert(got == Seq((1, 10L, 1.0), (1, 20L, 2.0)))
  }

  test("gap fill plans ONE shuffle (lead and span-max share the key window)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Resample.gapFill(
        Seq((1, 10L, 1.0), (1, 41L, 2.0)).toDF("k", "t", "v")
          .withColumn("t", timestamp_micros(col("t"))),
        "k", "t", "v", Step)
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.length == 1,
        s"expected one exchange, got ${shuffles.length}:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partitioning-invariant") {
    val rows = (0 until 200).map(i => (i % 3, (i * 7L) % 500L, (i % 11).toDouble))
    val df1 = rows.toDF("k", "t", "v").withColumn("t", timestamp_micros(col("t")))
    val a = Resample.gapFill(df1.repartition(1), "k", "t", "v", 50L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Resample.gapFill(df1.repartition(13), "k", "t", "v", 50L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
