package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (E37 investigation): run q_topk_window with the
  * RowNumberTopKRewrite rule off and on — N timed iterations each —
  * and print both executed plans, to attribute the bench pair's gap
  * to the plan rather than host noise.
  * Usage: runMain graft.tools.TopKProbe <sfDir> [iters]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val topk = graft.queries.QueryCatalog.queries("q_topk_window")
    val rule = graft.plans.RowNumberTopKRewrite
    val saved = spark.experimental.extraOptimizations

    def leg(name: String, on: Boolean): Unit = {
      spark.experimental.extraOptimizations =
        if (on) saved.filterNot(_ == rule) :+ rule else saved.filterNot(_ == rule)
      val df = topk(spark, sfDir)
      df.count() // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        topk(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"==== $name: min=${times.min}%.3f med=${times.sorted.apply(iters / 2)}%.3f " +
        s"all=${times.map(t => f"$t%.3f").mkString(",")}")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    // crossover probe: FEW LARGE groups (k << group size), where the
    // window path must sort thousands of rows per group while the heap
    // does one O(n) pass — the regime the rewrite exists for
    def skew(name: String, on: Boolean, groups: Int): Unit = {
      spark.experimental.extraOptimizations =
        if (on) saved.filterNot(_ == rule) :+ rule else saved.filterNot(_ == rule)
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      def q() = {
        val w = Window.partitionBy("g")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("g", pmod(col("l_partkey"), lit(groups)))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 2)
      }
      q().count() // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        q().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"==== $name(groups=$groups): min=${times.min}%.3f " +
        f"med=${times.sorted.apply(iters / 2)}%.3f " +
        s"all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    try {
      leg("ruleoff", on = false)
      leg("ruleon", on = true)
      leg("ruleoff2", on = false)
      Seq(8, 64, 1024).foreach { g =>
        skew("skew_ruleoff", on = false, groups = g)
        skew("skew_ruleon", on = true, groups = g)
      }
    } finally spark.experimental.extraOptimizations = saved
    spark.stop()
  }
}
