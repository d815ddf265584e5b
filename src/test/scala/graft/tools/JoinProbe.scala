package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time q03/q05 variants and dump executed plans — is the
  * gap vs DuckDB shuffle count, scan cost or per-job floor?
  * Usage: runMain graft.tools.JoinProbe <sfDir> [iters]
  */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(n: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to iters).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"==== $n: min=${ts.min}%.3f med=${ts.sorted.apply(iters/2)}%.3f")
    }
    val q3 = graft.queries.QueryCatalog.queries("q03_shipping_priority")
    val q5 = graft.queries.QueryCatalog.queries("q05_local_supplier")
    time("q03") { q3(spark, sfDir).count(); () }
    time("q05") { q5(spark, sfDir).count(); () }
    // raw scan costs for reference
    import org.apache.spark.sql.functions._
    time("scan_lineitem") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_shipdate") > to_timestamp(lit("1996-03-15 00:00:00")))
        .agg(count(lit(1))).collect(); ()
    }
    time("scan_orders") {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .agg(count(lit(1))).collect(); ()
    }
    println(q3(spark, sfDir).queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
