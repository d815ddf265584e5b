package graft.operators

import graft.functions.TimeFns.tsUs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization of an event log.
  *
  * Classic lag + cumulative-sum-of-breaks: one shuffle on the user
  * key (window partitioning); session aggregation reuses the same
  * partitioning so no second shuffle of the full log. The batch
  * semantics here are mirrored by the streaming variant
  * (graft.streaming) using event-time state.
  */
object Sessionize {

  /** Assign `session_seq` (1-based per user) given a max inactivity
    * gap in seconds.
    */
  def assign(events: DataFrame, userCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isBreak = when(
      prevTs.isNull.or(tsUs(col(tsCol)) - tsUs(prevTs) > gapSeconds * 1000000L),
      1L).otherwise(0L)
    // narrow inputs widen by the user key: the keyed repartition
    // replaces the window's own exchange (same shuffle count), is
    // exempt from AQE's byte-based coalescing (which collapsed this
    // CPU-dense sort+window stage to ONE task on MB-sized logs), and
    // no-ops on wide cluster inputs (operators.Widen)
    Widen.byKeys(events, Seq(col(userCol)))
      .withColumn("_brk", isBreak)
      .withColumn("session_seq", sum(col("_brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_brk")
  }

  /** Per-session rollup: bounds, event count, exact value sum
    * (decimal → double, rounded — engine-stable).
    */
  def rollup(events: DataFrame, userCol: String, tsCol: String, valueCol: String,
             gapSeconds: Long): DataFrame =
    assign(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast(DecimalType(18, 4))).cast("double"), 4).as("sum_value"))
}
