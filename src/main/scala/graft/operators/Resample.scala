package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a regular grid with gap filling —
  * the `time_bucket_gapfill` / Flink-interval-fill shape: every key
  * gets one row per `stepUs`-aligned grid instant between its first
  * and last observation, carrying the most recent observed value
  * at-or-before that instant (last-observation-carried-forward).
  *
  * Scale shape: ONE shuffle. Observations hash-partition by key for
  * a lead/max window; each observation then emits exactly the grid
  * instants IT covers (from its own timestamp to the next
  * observation) via a `sequence` explode — no grid relation, no
  * second shuffle, no as-of join. Output size is the grid itself;
  * per-task memory is O(covered instants per observation row), which
  * the step bounds. Grid instants are epoch-aligned multiples of the
  * step (pmod arithmetic, exact for any sign), so buckets agree
  * across engines and across reruns regardless of per-key minima.
  *
  * Determinism: simultaneous observations (same key, same timestamp)
  * collapse to their MAX value before filling — the tie rule is part
  * of the declared semantics, mirrored by the oracle.
  */
object Resample {

  /** One row per (key, epoch-aligned grid instant) in
    * `[ceil(min ts), max ts]`, value = LOCF. Output columns:
    * key, `grid_us` (epoch micros, long), `value`.
    */
  def gapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      stepUs: Long
  ): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    // ONE shuffle: partition by key up front — hashpartitioning(key)
    // satisfies the (key, ts) tie-collapse aggregate, the lead window,
    // and the span-max window alike (subset clustering), so none of
    // them re-exchanges (plan spec asserts it)
    val obs = events
      .select(col(keyCol), TimeFns.tsUs(col(tsCol)).as("_t"), col(valCol).as("_v"))
      .repartition(col(keyCol))
      .groupBy(col(keyCol), col("_t"))
      .agg(max(col("_v")).as("_v"))

    val w = Window.partitionBy(keyCol).orderBy(col("_t"))
    val wAll = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val step = lit(stepUs)

    // this observation covers grid instants in [_t, nxt) — the last
    // observation covers through the key's max timestamp inclusive
    val spans = obs
      .withColumn("_end", coalesce(lead(col("_t"), 1).over(w), max(col("_t")).over(wAll) + 1))
    // first epoch-aligned multiple ≥ _t, last multiple ≤ _end - 1
    val g0 = col("_t") + pmod(lit(0) - col("_t"), step)
    val e = col("_end") - 1
    val gN = e - pmod(e, step)
    spans
      .withColumn("grid_us",
        explode(when(g0 <= gN, sequence(g0, gN, step))
          .otherwise(array().cast("array<long>"))))
      .select(col(keyCol), col("grid_us"), col("_v").as("value"))
  }
}
