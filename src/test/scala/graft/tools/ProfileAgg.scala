package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiling main for the two worst execution-dominated bench
  * ratios (VERDICT r4 #8): q_upsert_merge and q_dedup_unique. Runs
  * each formulation warm (best of 3) so the comparison measures the
  * repeatable execution cost, not first-run codegen compilation.
  *
  * Usage: runMain graft.tools.ProfileAgg [sfDir]
  */
object ProfileAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(label: String)(f: => Unit): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best ${times.min}%.3f s (runs ${times.map(t => f"$t%.2f").mkString(", ")})")
      times.min
    }

    // ---------------- q_upsert_merge ----------------
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    orders.count() // warm scan cache/listing
    val cols = orders.columns.toSeq
    val updates = orders.where(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000)

    def tagged = orders.withColumn("_v", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("_v", lit(1)))

    best("upsert scan+union only") { tagged.count(); () }

    def finish(picked: DataFrame): Unit = {
      import graft.queries.Num.{d4, dsum}
      picked.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(d4(col("o_totalprice"))).as("sum_price"))
        .orderBy("o_orderstatus").collect()
      ()
    }

    best("upsert ExtremumBy (current)") {
      finish(graft.operators.Upsert.merge(orders, updates, Seq("o_orderkey")))
    }
    best("upsert native max_by(struct, struct)") {
      val picked = tagged
        .groupBy(col("o_orderkey"))
        .agg(max_by(struct(cols.map(col): _*),
          struct(col("_v") +: cols.map(col): _*)).as("_row"))
        .select(cols.map(c => col(s"_row.$c").as(c)): _*)
      finish(picked)
    }
    best("upsert ExtremumBy pruned to consumed columns") {
      val b = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
      val u = b.where(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      finish(graft.operators.Upsert.merge(b, u, Seq("o_orderkey")))
    }
    best("upsert window rn=1") {
      val w = Window.partitionBy("o_orderkey")
        .orderBy(col("_v").desc, col("o_orderkey"))
      val picked = tagged.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn", "_v")
      finish(picked)
    }

    // ---------------- q_dedup_unique ----------------
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    val lcols = li.columns.toSeq

    def lfinish(deduped: DataFrame): Unit = {
      import graft.queries.Num.{d4, dsum}
      deduped.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), dsum(d4(col("l_quantity"))).as("sum_qty"))
        .orderBy("l_returnflag").collect()
      ()
    }

    best("dedup scan only") { li.count(); () }
    best("dedup ExtremumBy (current)") {
      lfinish(graft.operators.Dedup.keepFirst(li, Seq("l_orderkey"), Some("l_linenumber")))
    }
    best("dedup native min_by(struct, struct)") {
      val picked = li
        .groupBy(col("l_orderkey"))
        .agg(min_by(struct(lcols.map(col): _*),
          struct(col("l_linenumber") +: lcols.map(col): _*)).as("_row"))
        .select(lcols.map(c => col(s"_row.$c").as(c)): _*)
      lfinish(picked)
    }
    best("dedup window rn=1") {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), struct(lcols.map(col): _*))
      val picked = li.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
      lfinish(picked)
    }
    // how much of the current cost is the aggregation at all?
    best("dedup groupBy count only (shuffle floor)") {
      li.groupBy(col("l_orderkey")).agg(count(lit(1))).count(); ()
    }
    // the ExtremumBy struct carries ALL columns — Catalyst cannot
    // prune into it; how much does a hand-pruned input save when the
    // consumer needs 2 columns?
    best("dedup ExtremumBy hand-pruned input") {
      lfinish(graft.operators.Dedup.keepFirst(
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        Seq("l_orderkey"), Some("l_linenumber")))
    }

    // ---------------- q_range_join decomposition ----------------
    val ev = graft.queries.Tables.table(spark, sfDir, "events")
    ev.count()
    best("rj sessionize only") {
      graft.operators.Sessionize
        .rollup(ev, "user_id", "ts", "value", gapSeconds = 1800).count(); ()
    }
    best("rj full query (current)") {
      graft.queries.QueryCatalog.queries("q_range_join")(spark, sfDir).collect(); ()
    }
    best("rj equi-join variant (no buckets)") {
      val sessions = graft.operators.Sessionize
        .rollup(ev, "user_id", "ts", "value", gapSeconds = 1800)
        .select(col("user_id"), col("session_seq"), col("session_start"), col("session_end"))
      ev.select(col("user_id"), col("ts"), col("event_id"))
        .join(sessions, Seq("user_id"))
        .where(col("ts") >= col("session_start") && col("ts") <= col("session_end"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_matched"))
        .orderBy("user_id", "session_seq").collect(); ()
    }

    spark.stop()
  }
}
