package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large corpora.
  *
  * Everything here is a single hash-shuffle on the dedup key with
  * map-side partial aggregation — the shape that survives a 100 TB
  * corpus on a 1000-executor cluster. No global sorts, no windows over
  * the whole table, no driver-side collection.
  */
object Dedup {

  /** Keep-first dedup by key (reference `unique_columns` semantics,
    * deltalake_table.py:construct_df). With an order column the kept
    * row is the per-key minimizer via `min_by(struct(*), ord)`;
    * without, an arbitrary-but-deterministic row (min over the row
    * struct itself). One shuffle, partial-agg friendly; no window
    * sort.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Option[String] = None): DataFrame = {
    val allCols = df.columns.toSeq
    // ExtremumBy orders by (ord, row): the cheap order column decides,
    // and the full row breaks ties — a total order, so the kept row is
    // deterministic; without an order column the row itself is the
    // order. ObjectHashAggregate-eligible (min_by's struct buffer
    // forces a SortAggregate — a per-partition sort this operator
    // doesn't need), and the row struct is only materialized when a
    // row improves on the incumbent.
    val ord: Column = order.map(col).getOrElse(lit(0))
    // narrow inputs (single-row-group files) would run the whole fused
    // scan+partial-minBy stage on one core — widen by the dedup key
    // (replaces the aggregate's own exchange; no-op on wide inputs)
    Widen.byKeys(df, keys.map(col))
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.ExtremumBy.minBy(struct(allCols.map(col): _*), ord).as("_row"))
      .select(allCols.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** [[keepFirst]] with the caller's requested projection pushed BELOW
    * the dedup: keepFirst's row struct blocks Catalyst column pruning
    * (the aggregate buffer carries every field it is given), so
    * unrequested columns would otherwise be shuffled and compared for
    * nothing — measured 33% of the dedup's execution cost at sf0.1.
    * Tie-break note: rows tying on (key, order) resolve by the
    * REQUESTED projection; whenever (key, order) is unique — the
    * documented contract for a meaningful keep-first — results are
    * identical. Shared by the DeltaTable and LakehouseTable
    * `unique_columns` paths so their semantics cannot drift.
    */
  def keepFirstProjected(
      df: DataFrame,
      keys: Seq[String],
      order: Option[String],
      requested: Option[Seq[String]]
  ): DataFrame = requested match {
    case Some(cols) =>
      val need = (cols ++ keys ++ order).distinct
      keepFirst(df.select(need.map(col): _*), keys, order)
        .select(cols.map(col): _*)
    case None => keepFirst(df, keys, order)
  }

  /** Exact content dedup: group by md5 of a normalized content column,
    * keep the row with the smallest id. md5 is identical across
    * engines, so this is oracle-checkable.
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val fp = md5(trim(lower(col(contentCol))))
    val allCols = df.columns.toSeq
    // widen by the fingerprint: replaces the group-by's own exchange
    // (same shuffle count) and runs the keep-min aggregate at session
    // parallelism when the scan is narrow (no-op on wide inputs — the
    // 100 TB corpus shape; see operators.Widen)
    Widen.byKeys(df.withColumn("_fp", fp), Seq(col("_fp")))
      .groupBy(col("_fp"))
      .agg(graft.functions.ExtremumBy.minBy(struct(allCols.map(col): _*), col(idCol)).as("_row"))
      .select(allCols.map(c => col(s"_row.$c").as(c)): _*)
  }
}
