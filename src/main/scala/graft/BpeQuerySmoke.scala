package graft

import org.apache.spark.sql.SparkSession

object BpeQuerySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.queries.Wave3Queries.qBpeTokens(spark, "/root/testdata/sf0.01").show(25, false)
    println(s"took ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
