package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RowNumberTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RowNumberTopKRewrite)
  }

  private def topkDf = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    spark.read.parquet(sf("sf0.001") + "/part.parquet")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
  }

  test("rewrites row_number<=k into the TopK aggregate with identical results") {
    val baseline = topkDf.select("p_brand", "rn", "p_partkey").collect().toSet
    withRule {
      val df = topkDf
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_top_k"), s"rule did not fire:\n$optimized")
      // the Window node itself must be gone; Spark's own WindowGroupLimit
      // may remain below the aggregate as a per-partition pre-filter,
      // which only helps (bounded input to the heap)
      assert(!optimized.contains("Window ["), s"window survived:\n$optimized")
      val got = df.select("p_brand", "rn", "p_partkey").collect().toSet
      assert(got == baseline)
    }
  }

  // null / NaN / MinValue torture set: every encodable ordering shape
  // must fire the rewrite AND agree exactly with the window baseline.
  private def tortureDf = {
    val rows = Seq[(String, java.lang.Long, java.lang.Double, Int)](
      ("a", Long.MinValue, 1.0, 1),
      ("a", Long.MaxValue, Double.NaN, 2),
      ("a", null, 2.5, 3),
      ("a", 0L, null, 4),
      ("a", -5L, Double.NegativeInfinity, 5),
      ("a", null, Double.NaN, 6),
      ("b", 7L, 0.0, 7),
      ("b", Long.MinValue, -0.0, 8),
      ("b", null, Double.PositiveInfinity, 9),
      ("b", -1L, null, 10),
      ("b", Long.MinValue + 1, 3.14, 11)
    )
    rows.toDF("p", "lkey", "dkey", "id")
  }

  private def checkOrdering(orderCols: org.apache.spark.sql.Column*): Unit = {
    def run = {
      val w = Window.partitionBy("p").orderBy(orderCols: _*)
      tortureDf.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    }
    val baseline = run.collect().map(r => (r.getString(0), r.getInt(3), r.getInt(4))).toSet
    withRule {
      val df = run
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_top_k"), s"rule did not fire for $orderCols:\n$optimized")
      val got = df.collect().map(r => (r.getString(0), r.getInt(3), r.getInt(4))).toSet
      assert(got == baseline, s"mismatch for $orderCols:\ngot      $got\nexpected $baseline")
    }
  }

  test("desc long key with nulls and MinValue (NULLS LAST default)") {
    checkOrdering(col("lkey").desc, col("id"))
  }

  test("desc long key, explicit NULLS FIRST") {
    checkOrdering(col("lkey").desc_nulls_first, col("id"))
  }

  test("asc long key with nulls, default NULLS FIRST and explicit NULLS LAST") {
    checkOrdering(col("lkey").asc, col("id"))
    checkOrdering(col("lkey").asc_nulls_last, col("id"))
  }

  test("desc double key with NaN, nulls, signed zeros, infinities") {
    checkOrdering(col("dkey").desc, col("id"))
    checkOrdering(col("dkey").desc_nulls_first, col("id"))
    checkOrdering(col("dkey").asc_nulls_last, col("id"))
  }

  test("mixed multi-key ordering (desc nullable double, asc nullable long)") {
    checkOrdering(col("dkey").desc, col("lkey").asc_nulls_last, col("id"))
  }

  test("leaves non-matching window queries untouched") {
    withRule {
      // rank() instead of row_number -> no rewrite
      val w = Window.partitionBy("p_brand").orderBy(col("p_partkey"))
      val df = spark.read.parquet(sf("sf0.001") + "/part.parquet")
        .withColumn("r", rank().over(w)).where(col("r") <= 2)
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_top_k"))
      assert(df.count() > 0)
      // descending string order -> conservative bail-out
      val w2 = Window.partitionBy("p_brand").orderBy(col("p_type").desc)
      val df2 = spark.read.parquet(sf("sf0.001") + "/part.parquet")
        .withColumn("rn", row_number().over(w2)).where(col("rn") <= 2)
      assert(!df2.queryExecution.optimizedPlan.toString.contains("graft_top_k"))
      assert(df2.count() > 0)
    }
  }
}
