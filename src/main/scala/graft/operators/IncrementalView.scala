package graft.operators

import graft.core.{Filter, Filters}
import graft.tables.{ChangeFeed, DeltaChanges, DeltaLog, DeltaTable, DeltaWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate materialized view
  * over a change-feed-capable base table — Delta (CDF), Iceberg or
  * Hudi, dispatched through [[graft.tables.ChangeFeed]]; the view
  * itself is always a Delta table (its atomic txn-watermark commit
  * is what the exactly-once story rides on) — the way aggregates stay fresh
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
  * Two refresh shapes with identical semantics: [[refresh]]
  * overwrites the view (correct at any view size, handles nullable
  * keys); [[refreshMerge]] updates it in place, rewriting only files
  * that may hold a changed key — the path for views too large to
  * rewrite per refresh.
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
    val feed = ChangeFeed.forPath(spark, basePath)
    val baseVersion = feed.head(spark)
    val base = feed.snapshotAt(spark, baseVersion)
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
    val feed = ChangeFeed.forPath(spark, basePath)
    val head = feed.head(spark)
    if (head <= last) return last

    val delta = changesDelta(spark, feed, last, head, keys, sums)

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

  /** MERGE-shaped refresh: identical semantics to [[refresh]], but the
    * view is updated IN PLACE — only view files that may hold a
    * changed key are rewritten (merge's stats-pruned candidate set),
    * so refresh cost scales with the CHANGE volume, not the view
    * size: the scale path for views too large to rewrite per refresh.
    * The view read feeding the combine is bounded the same way, by a
    * per-key min/max box filter pushed through Delta file skipping
    * (one tiny driver-side agg of the delta).
    *
    * Exactly-once and race-guarding are unchanged: the merge commit
    * carries the watermark txn and is compare-and-swapped on the view
    * version the watermark was read from.
    *
    * MERGE keys never match SQL nulls (standard `ON t.k = s.k`
    * semantics), so this path refuses null group-key values in the
    * change span — use [[refresh]] for views with nullable keys.
    */
  def refreshMerge(
      spark: SparkSession,
      basePath: String,
      viewPath: String,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): Long = {
    val viewSnap = DeltaLog.snapshot(spark, viewPath, withFiles = false)
    val last = viewSnap.txns.getOrElse(AppId,
      throw new IllegalArgumentException(
        s"view $viewPath carries no $AppId transaction — initialize it first"))
    val feed = ChangeFeed.forPath(spark, basePath)
    val head = feed.head(spark)
    if (head <= last) return last

    val delta = changesDelta(spark, feed, last, head, keys, sums)
    // one driver row: change count, per-key bounds, per-key null keys
    val k = keys.size
    val aggs =
      keys.map(c => min(col(c))) ++ keys.map(c => max(col(c))) ++
        keys.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)))
    val b = delta.agg(count(lit(1)), aggs: _*).head()
    // metadata-only commits in the span: contents already current at
    // `head`; the watermark stays at `last` (a later refresh re-reads
    // the empty span — O(metadata), never wrong)
    if (b.getLong(0) == 0L) return last
    keys.zipWithIndex.foreach { case (c, i) =>
      require(b.getLong(1 + 2 * k + i) == 0L,
        s"group key $c takes null values in the change span; MERGE keys " +
          "cannot match nulls — use refresh (overwrite) for this view")
    }
    val bounds = Filters.normalize(keys.zipWithIndex.flatMap { case (c, i) =>
      Seq(Filter(c, ">=", b.get(1 + i)), Filter(c, "<=", b.get(1 + k + i)))
    })

    val current = new DeltaTable("view", viewPath)(spark,
      graft.tables.ReadArgs(filters = bounds,
        extra = Map("versionAsOf" -> viewSnap.version)))
    val vTypes = current.schema.fields.map(f => f.name -> f.dataType).toMap
    val combined = delta.alias("d")
      .join(current.alias("v"), keys, "left")
      // a key created AND fully deleted inside the span would
      // otherwise reach the NOT MATCHED clause and insert a zero row
      .where(col("v.n_rows").isNotNull || col("d.n_rows") =!= 0L)
      .select(keys.map(col) ++
        Seq((coalesce(col("v.n_rows"), lit(0L)) + col("d.n_rows"))
          .cast(vTypes("n_rows")).as("n_rows")) ++
        sums.map { case (_, alias) =>
          (coalesce(col(s"v.$alias"), lit(0)) + col(s"d.$alias"))
            .cast(vTypes(alias)).as(alias)
        }: _*)

    DeltaWrite.merge(spark, viewPath, combined, keys,
      deleteWhenMatched = Some("n_rows = 0"),
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
  ): DataFrame = {
    val feed = ChangeFeed.forPath(spark, basePath)
    aggregate(feed.snapshotAt(spark, feed.head(spark)), keys, sums)
  }

  /** Signed per-key delta of the base's change feed in `(last,
    * head]`: insert/update_postimage count +1,
    * delete/update_preimage −1 — Iceberg/Hudi feeds emit only
    * insert/delete (updates arrive pre-split), so one sign rule
    * covers all three formats.
    */
  private def changesDelta(
      spark: SparkSession,
      feed: ChangeFeed,
      last: Long,
      head: Long,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): DataFrame = {
    val changes = feed.changes(spark, last, head)
    val sign = when(
      col(DeltaChanges.ChangeTypeCol).isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sums.map { case (v, alias) =>
          sum(col(v) * sign).as(alias) }: _*)
  }

  private def aggregate(
      base: DataFrame,
      keys: Seq[String],
      sums: Seq[(String, String)]
  ): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.map { case (v, alias) => sum(col(v)).as(alias) }: _*)
}
