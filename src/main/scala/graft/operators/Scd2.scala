package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 build: collapse a per-key change
  * stream into versioned rows with `[eff_from_us, eff_to_us)`
  * validity intervals — the standard warehouse dimension shape (one
  * row per attribute VERSION, not per observation; the current
  * version has a NULL `eff_to_us`).
  *
  * Consecutive observations with identical tracked attributes merge
  * into one version; a version starts at its first observation and
  * ends when the next differing version starts. Observations are
  * totally ordered by (timestamp, `ordCol`) so simultaneous events
  * resolve deterministically — the tiebreak is part of the declared
  * semantics, mirrored by the oracle.
  *
  * Scale shape: ONE hash shuffle on the key; the change-detection
  * lag, the version-number running sum, and the interval lead all run
  * over the same key partitioning, so Catalyst reuses a single
  * exchange (window functions with identical partition keys plan into
  * one sort). The version groupBy re-shuffles only the collapsed
  * (key, version) rows — already a fraction of the input.
  */
object Scd2 {

  /** Output: key, tracked attribute columns (version values),
    * `eff_from_us`/`eff_to_us` epoch-micro bounds (to NULL = current),
    * `version` (1-based per key).
    */
  def build(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      attrCols: Seq[String]
  ): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val ordered = Window.partitionBy(keyCol).orderBy(col("_t"), col(ordCol))
    val attrs = struct(attrCols.map(col): _*)

    val flagged = changes
      .select((Seq(col(keyCol), TimeFns.tsUs(col(tsCol)).as("_t"), col(ordCol)) ++
        attrCols.map(col)): _*)
      .withColumn("_chg",
        when(lag(attrs, 1).over(ordered).isNull ||
          lag(attrs, 1).over(ordered) =!= attrs, 1).otherwise(0))
      .withColumn("version",
        sum(col("_chg")).over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val versions = flagged
      .groupBy(col(keyCol), col("version"))
      .agg(
        min(col("_t")).as("eff_from_us"),
        attrCols.map(c => first(col(c)).as(c)): _*)

    val vw = Window.partitionBy(keyCol).orderBy(col("version"))
    versions
      .withColumn("eff_to_us", lead(col("eff_from_us"), 1).over(vw))
      .select((Seq(col(keyCol)) ++ attrCols.map(col) ++
        Seq(col("eff_from_us"), col("eff_to_us"), col("version"))): _*)
  }
}
