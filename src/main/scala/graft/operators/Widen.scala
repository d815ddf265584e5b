package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism repair for CPU-heavy stages fed by
  * narrow scans.
  *
  * The bench corpus (and any small import) arrives as single-row-group
  * parquet: Spark assigns a row group to the one split holding its
  * midpoint, so no `maxPartitionBytes` setting can spread the scan —
  * the whole fused scan+aggregate stage runs on ONE core while the
  * other 31 idle (measured: q_dedup_unique's 0.98 s 1-effective-task
  * partial aggregate; guide §2.5 "input skew … repartition immediately
  * after the read"). On a real cluster layout (many files, ≥128 MB row
  * groups) scans arrive wider than the core count and these helpers
  * no-op — the check is on the ACTUAL partition count, never a
  * constant, so the 100 TB shape gains no extra shuffle.
  *
  * [[byKeys]] repartitions by the downstream grouping keys: the
  * explicit numbered exchange REPLACES the ENSURE_REQUIREMENTS
  * exchange the grouping needs anyway (same exchange count) and, being
  * REPARTITION_BY_NUM, is exempt from AQE's byte-based coalescing —
  * right for aggregates whose per-row work (struct extremum buffers,
  * md5) dwarfs their shuffle bytes. The trade is partial aggregation:
  * rows shuffle un-reduced. Worth it exactly when the input is
  * narrower than the session — the reduction itself was the
  * single-core bottleneck — and skipped otherwise.
  */
object Widen {
  /** Input's actual partition count is below the session parallelism. */
  def isNarrow(df: DataFrame): Boolean =
    df.rdd.getNumPartitions < df.sparkSession.sparkContext.defaultParallelism

  /** Repartition a narrow input to the session parallelism by the
    * downstream grouping keys; identity on already-wide inputs.
    */
  def byKeys(df: DataFrame, keys: Seq[Column]): DataFrame =
    if (isNarrow(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
    else df
}
