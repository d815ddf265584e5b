package graft.tools

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Dev tool: split each query's wall time into DataFrame construction
  * (per-transform analysis), optimization+physical planning, and
  * execution — the driver-overhead attribution for the r15 round
  * (guide §7.3: planning is single-threaded driver work).
  *
  * Usage: runMain graft.tools.PlanCost <sfDir> <q,...> [reps]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q03_shipping_priority").split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { n =>
      try QueryCatalog.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val fn = QueryCatalog.queries(n)
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis+optimization+physical
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val best = rows.minBy(r => r._1 + r._2 + r._3)
      println(f"[plancost] $n construct=${best._1}%.3f plan=${best._2}%.3f exec=${best._3}%.3f " +
        f"(total=${best._1 + best._2 + best._3}%.3f)")
    }
    spark.stop()
  }
}
