package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` for named queries to files
  * (the r15 optimization round's plan evidence — plans/r15/<q>_<tag>.txt).
  *
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> <tag> [q,...]
  * (default queries: the headline set). Each file carries the
  * formatted plan AND the AQE-final executed plan after one run, so
  * Exchange counts / join strategies / PushedFilters are checkable
  * without running Spark. Session confs mirror Bench exactly.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r15")
    val tag = args.lift(2).getOrElse("before")
    val names = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(QueryCatalog.headlineNames :+ "q_topk_window")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // real catalog statistics for the bench tables (queries.Tables
      // registers + ANALYZEs them once per session) — fixes the
      // estimate-driven backwards broadcast side in q03/q05
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = QueryCatalog.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save() // AQE finalizes
      val finalPlan = df.queryExecution.executedPlan.toString
      val text = s"==== $n ($tag) — explain(formatted) ====\n$formatted\n" +
        s"==== $n ($tag) — AQE-final executed plan ====\n$finalPlan\n"
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        text.getBytes(StandardCharsets.UTF_8))
      println(s"[plans] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
