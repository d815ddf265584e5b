package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the constant-memory path for
  * 100 TB cardinality/quantile questions where exact answers would
  * shuffle the world. All built on Spark's native codegen'd sketches
  * (HLL++ for distinct counts, Greenwald-Khanna for quantiles), which
  * merge associatively: partial sketches combine map-side, so the
  * shuffle carries one sketch per group, not the data.
  *
  * Approximate results are engine-specific (no DuckDB hash-match);
  * correctness is bounded-error, asserted in SketchesSpec against
  * exact answers.
  */
object Sketches {

  /** HLL++ distinct count with a relative standard deviation knob. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Approximate quantiles via percentile_approx. */
  def approxQuantile(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  /** Misra-Gries heavy hitters: the top items of a string column in
    * ONE bounded-memory pass — every item with frequency > n/(k+1) is
    * guaranteed in the result, counts under-estimate by at most
    * n/(k+1) ([[graft.functions.FrequentItemsSketch]]). The exact
    * groupBy alternative shuffles every distinct item; this shuffles
    * k counters per partial buffer.
    */
  def approxHeavyHitters(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.FrequentItemsSketch(
        org.apache.spark.sql.graftbridge.Bridge.expression(c.cast("string")), k)
        .toAggregateExpression())

  /** Cardinality + quantile profile of a column per group — one pass,
    * one sketch-carrying shuffle.
    */
  def profile(df: DataFrame, groupCol: String, idCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        approxDistinct(col(idCol)).as("approx_distinct"),
        countDistinct(col(idCol)).as("exact_distinct"),
        round(approxQuantile(col(valueCol), 0.5), 4).as("approx_median"))
      .orderBy(groupCol)
}
