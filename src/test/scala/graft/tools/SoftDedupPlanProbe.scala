package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the Wave7PlanSpec soft-dedup invariant. */
object SoftDedupPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = (1 to 60).map { i =>
      val t = if (i % 3 == 0) s"shared boilerplate text block $i" else s"unique document body $i"
      (i.toLong, t, s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val pairs = graft.operators.NearDup.minhashPairs(docs, "doc_id", "text",
      k = 5, numHashes = 8, bands = 2, threshold = 0.5)
    val clusters = graft.operators.NearDup.dupClusters(pairs, "a_id", "b_id")
    println("== clusters plan ==")
    println(clusters.queryExecution.optimizedPlan.toString.take(3000))
    println("clusters stats: " + clusters.queryExecution.optimizedPlan.stats.sizeInBytes)
    val cmap = clusters.select(col("id").as("doc_id"), col("cluster_id"))
    val sizes = cmap.groupBy("cluster_id").agg(count(lit(1)).as("_csz"))
    println("cmap stats: " + cmap.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("sizes stats: " + sizes.queryExecution.optimizedPlan.stats.sizeInBytes)
    val rhs = cmap.join(sizes, "cluster_id")
    println("rhs stats: " + rhs.queryExecution.optimizedPlan.stats.sizeInBytes)
    val sd = graft.operators.NearDup.softDedup(
      docs.select("doc_id", "text", "source"), "doc_id", clusters)
    println("== softDedup executed plan ==")
    println(sd.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
