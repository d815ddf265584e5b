package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r16): executed-plan diff of a query under
  * spark.sql.cbo.enabled on vs off (same JVM, two sessions).
  * Usage: Test/runMain graft.tools.CboDiffProbe <sfDir> <query>
  */
object CboDiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_containment_dups")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    base.sparkContext.setLogLevel("WARN")
    Seq(("cbo_off", "false"), ("cbo_on", "true")).foreach { case (tag, v) =>
      val s = base.newSession()
      s.conf.set("spark.sql.cbo.enabled", v)
      org.apache.spark.sql.SparkSession.setActiveSession(s)
      val df = graft.queries.QueryCatalog.queries(name)(s, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"######## $name [$tag] AQE-final ########")
      println(df.queryExecution.executedPlan.toString)
    }
    base.stop()
  }
}
