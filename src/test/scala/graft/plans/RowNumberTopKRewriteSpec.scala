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
