package graft.queries

import graft.functions.TimeFns.tsUs
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Num.{d4, dsum, davg}

/** Second-wave query inventory: temporal join, OLAP extensions
  * (rollup, quantiles, pivot), JSON, window-function suite, set ops,
  * the SQL interface, and vector stats.
  */
object Wave2Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** As-of join: each purchase event matched to the latest hourly
    * per-user rollup at or before its timestamp (AsOfJoin operator).
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hts"))
      .agg(count(lit(1)).as("hourly_events"))
    AsOfJoin.asOfBackward(purchases, hourly,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "hts",
      rightPayload = Seq("hourly_events"))
      .select(
        col("event_id"), col("user_id"),
        tsUs(col("ts")).as("ts_us"),
        tsUs(col("asof_hts")).as("hour_us"),
        col("asof_hourly_events").as("hourly_events"))
      .orderBy("event_id")
  }

  /** Shared with the oracle: matches farther back than 30 min null. */
  val AsofToleranceUs: Long = 1800L * 1000000L

  /** E15's merge_asof TOLERANCE through the gate: the [[qAsofJoin]]
    * join with matches older than 30 minutes nulled out — purchases
    * in the back half of their hour keep the row, lose the match
    * (DuckDB mirrors with ASOF LEFT JOIN + the same gate).
    */
  def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hts"))
      .agg(count(lit(1)).as("hourly_events"))
    AsOfJoin.asOfBackward(purchases, hourly,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "hts",
      rightPayload = Seq("hourly_events"),
      toleranceUs = Some(AsofToleranceUs))
      .select(
        col("event_id"), col("user_id"),
        tsUs(col("ts")).as("ts_us"),
        tsUs(col("asof_hts")).as("hour_us"),
        col("asof_hourly_events").as("hourly_events"))
      .orderBy("event_id")
  }

  /** Forward as-of: each purchase matched to the earliest hourly
    * rollup at or after it (inner semantics to mirror ASOF JOIN).
    */
  def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hts"))
      .agg(count(lit(1)).as("hourly_events"))
    AsOfJoin.asOfForward(purchases, hourly,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "hts",
      rightPayload = Seq("hourly_events"))
      .where(col("asof_hts").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        tsUs(col("ts")).as("ts_us"),
        tsUs(col("asof_hts")).as("hour_us"),
        col("asof_hourly_events").as("hourly_events"))
      .orderBy("event_id")
  }

  /** OLAP rollup (hierarchical grouping sets). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(d4(col("o_totalprice"))).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Exact interpolated quantiles per group. */
  def qQuantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
      .orderBy("o_orderpriority")

  /** JSON extraction from the events.props payload column. */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** String function suite over a bounded slice. */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .where(col("c_custkey") <= 100)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).cast(LongType).as("name_len"),
        reverse(col("c_name")).as("rname"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"),
        lpad(col("c_custkey").cast(StringType), 8, "0").as("padded"))
      .orderBy("c_custkey")

  /** Date/time function suite: calendar breakdown of order volume. */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        year(col("o_orderdate")).cast(LongType).as("yr"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast(LongType).as("days_since"))
      .groupBy(col("yr"), col("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("days_since")).as("min_days"),
        max(col("days_since")).as("max_days"))
      .orderBy("yr", "qtr")

  /** Conditional aggregation (CASE-based selective measures). */
  def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_quantity") > 40, 1)).as("n_large"),
        count(when(col("l_discount") >= 0.05, 1)).as("n_discounted"),
        dsum(when(col("l_returnflag") === "R", d4(col("l_extendedprice")))
          .otherwise(lit(0).cast(DecimalType(12, 4)))).as("returned_value"))
      .orderBy("l_returnflag")

  /** Set operations: customers ordering in 1995 vs 1996. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def buyers(yr: Int) = ord
      .where(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"))
    val both    = buyers(1995).intersect(buyers(1996))
    val only95  = buyers(1995).except(buyers(1996))
    val all     = buyers(1995).union(buyers(1996)).distinct()
    import s.implicits._
    Seq(
      ("both_years", both.count()),
      ("only_1995", only95.count()),
      ("either_year", all.count())
    ).toDF("cohort", "n_customers").orderBy("cohort")
  }

  /** Window-function suite with a total order (unique orderkey). */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .where(col("o_custkey") <= 20)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast(LongType).as("rn"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"))
      .orderBy("o_custkey", "rn")
  }

  /** Pivot: order counts per priority × status. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(
        col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy("o_orderpriority")

  /** SQL interface: temp views + spark.sql (correlated EXISTS). */
  def qSqlInterface(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM v_orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM v_lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Sorted-distinct aggregation rendered as a string (deterministic
    * cross-engine form of collect_set).
    */
  def qCollectSorted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")

  /** Vector stats: exact norms per label (embedding column math). */
  def qVectorStats(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "embeddings")
      .select(col("label"),
        round(graft.functions.Vectors.norm(col("embedding")), 4).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("nrm").cast(DecimalType(12, 4))).cast(DoubleType) / count(lit(1)), 4)
          .as("avg_norm"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"))
      .orderBy("label")
  }
}
