package graft.operators

import graft.tables.{DeltaChanges, DeltaLog, DeltaTable, DeltaWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate materialized view
  * over a CDF-enabled Delta base table — the way aggregates stay fresh
  * over a 100 TB base without recomputing: each refresh reads ONLY the
  * change feed since the last processed version and applies signed
  * deltas (insert/update_postimage count +, delete/update_preimage
  * count −), one bounded shuffle of (view ∪ changes) on the group key.
  *
  * Maintained aggregates are the self-invertible ones — per-key row
  * count plus SUMs (AVG = sum/count at read time). MIN/MAX are not
  * incrementally maintainable under deletes (a deleted extremum needs
  * a per-key rescan) and are refused by construction of the API.
  *
  * Exactly-once across crashes via the same SetTransaction mechanism
  * the streaming sink uses: every refresh commit carries
  * `(appId = graft-view, version = base head)`, the watermark is read
  * back from the view's own `txns`, and a refresh that lost the race
  * or re-runs after a crash is a detected no-op — the watermark and
  * the view contents can never diverge because they commit atomically.
  *
  * Crash-window note: the refresh OVERWRITES the view (correct at any
  * view size, one commit); a MERGE-shaped variant that touches only
  * changed keys is the optimization path for views too large to
  * rewrite, with identical semantics.
  */
object IncrementalView {

  val AppId = "graft-view"

  /** Full compute at the base's current version — the view's version-0
    * state and watermark. Returns the base version captured.
    */
  def initialize(
      spark: SparkSession,
      basePath: String,
      viewPath: String,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): Long = {
    require(DeltaLog.latestVersion(spark, viewPath).isEmpty,
      s"view $viewPath already exists — use refresh")
    val baseVersion = DeltaLog.snapshot(spark, basePath, withFiles = false).version
    val base = new DeltaTable("base", basePath)(spark,
      graft.tables.ReadArgs(extra = Map("versionAsOf" -> baseVersion)))
    DeltaWrite.append(spark, aggregate(base, keys, sums), viewPath,
      txn = Some((AppId, baseVersion)))
    baseVersion
  }

  /** Apply the base's changes in `(watermark, head]` to the view; a
    * no-op when already current. Returns the new watermark.
    */
  def refresh(
      spark: SparkSession,
      basePath: String,
      viewPath: String,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): Long = {
    // one view snapshot pins BOTH the watermark and the contents the
    // delta applies to; the commit below is conditional on this
    // version, so a racing refresh refuses instead of writing a
    // watermark ahead of stale contents
    val viewSnap = DeltaLog.snapshot(spark, viewPath, withFiles = false)
    val last = viewSnap.txns.getOrElse(AppId,
      throw new IllegalArgumentException(
        s"view $viewPath carries no $AppId transaction — initialize it first"))
    // metadata-only: the head version check reads no file lists
    val head = DeltaLog.snapshot(spark, basePath, withFiles = false).version
    if (head <= last) return last

    val changes = DeltaChanges.between(spark, basePath, last + 1, head)
    val sign = when(
      col(DeltaChanges.ChangeTypeCol).isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sums.map { case (v, alias) =>
          sum(col(v) * sign).as(alias) }: _*)

    val current = new DeltaTable("view", viewPath)(spark,
      graft.tables.ReadArgs(extra = Map("versionAsOf" -> viewSnap.version)))
    val merged = current.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sums.map { case (_, alias) => sum(col(alias)).as(alias) }: _*)
      // a key whose rows were all deleted leaves the view entirely
      .where(col("n_rows") =!= 0L)

    // atomic: new contents + the new watermark in ONE commit,
    // compare-and-swapped on the view version read above
    DeltaWrite.overwrite(spark, merged, viewPath,
      txn = Some((AppId, head)), requireBase = Some(viewSnap.version))
    head
  }

  /** The base version the view reflects (its `graft-view` txn). */
  def watermark(spark: SparkSession, viewPath: String): Option[Long] =
    DeltaLog.snapshot(spark, viewPath, withFiles = false).txns.get(AppId)

  /** The view recomputed from scratch (spec parity target). */
  def fullCompute(
      spark: SparkSession,
      basePath: String,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): DataFrame =
    aggregate(new DeltaTable("base", basePath)(spark), keys, sums)

  private def aggregate(
      base: DataFrame,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.map { case (v, alias) => sum(col(v)).as(alias) }: _*)
}
