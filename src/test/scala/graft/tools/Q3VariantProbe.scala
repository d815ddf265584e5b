package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r16, VERDICT #7): measure the PRIZE of flipping q03/q05's
  * backwards broadcast side — the planner broadcasts the 325k-row
  * filtered lineitem (estimate-driven) and streams the much smaller
  * c⨝o side. Variant B forces broadcast(c⨝o) with a hint (hints are
  * FORBIDDEN in committed queries — PlanSpec's no-SF-proportional-hint
  * invariant — this probe only sizes what accurate stats could buy).
  * Usage: Test/runMain graft.tools.Q3VariantProbe <sfDir> [iters]
  */
object Q3VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // real catalog statistics for the bench tables (queries.Tables
      // registers + ANALYZEs them once per session) — fixes the
      // estimate-driven backwards broadcast side in q03/q05
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(n: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to iters).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"==== $n: min=${ts.min}%.3f med=${ts.sorted.apply(iters / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def t(n: String) = graft.queries.Tables.table(spark, sfDir, n)

    // q03 as committed
    val q3 = graft.queries.QueryCatalog.queries("q03_shipping_priority")
    time("q03_asis") { q3(spark, sfDir).count(); () }

    // q03 variant: broadcast the c⨝o side, stream lineitem
    def q3flip() = {
      val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders").filter(col("o_orderdate") < to_timestamp(lit("1996-03-15 00:00:00")))
      val li = t("lineitem").filter(col("l_shipdate") > to_timestamp(lit("1996-03-15 00:00:00")))
      val co = cust.join(ord, col("c_custkey") === col("o_custkey"))
      li.join(broadcast(co), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
          (lit(1) - col("l_discount").cast("decimal(12,4)"))).cast("double"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    time("q03_flip_bcast_co") { q3flip().count(); () }

    // q05 as committed
    val q5 = graft.queries.QueryCatalog.queries("q05_local_supplier")
    time("q05_asis") { q5(spark, sfDir).count(); () }
    spark.stop()
  }
}
