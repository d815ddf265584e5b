package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named catalog queries.
  * Usage: runMain graft.tools.ExplainQ <sfDir> <query>[,<query>...]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q05_local_supplier").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.queries.QueryCatalog.queries(n)(spark, sfDir)
      df.collect() // let AQE finalize the real plan
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
