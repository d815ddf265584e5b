package graft.tools

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query best-of-N timing with optional conf overrides —
  * the measurement harness for the r15 optimization round (the bench's
  * best-of-2 is too noisy to adjudicate single-query changes on a
  * shared host).
  *
  * Usage: Test/runMain graft.tools.BenchProbe <sfDir> <q,...> [reps] [k=v;k=v] [warmupDir]
  * Times the same `.count()` action as Bench after the same
  * smallest-SF warmup; prints min/median per query. (Test scope — dev
  * tooling stays out of the production artifact.)
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q03_shipping_priority").split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val confs = args.lift(3).toSeq.flatMap(_.split(";")).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val warmupDir = args.lift(4).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
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
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { n =>
      // warmup failures are logged, never fatal — but only NonFatal:
      // an OOM/linkage error must not be masked into a bogus timing
      try QueryCatalog.queries(n)(spark, warmupDir).count()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[probe] warmup of $n failed: $e")
      }
    }
    names.foreach { n =>
      val fn = QueryCatalog.queries(n)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $n min=${times.head}%.3f med=${times(times.size / 2)}%.3f " +
        s"all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
