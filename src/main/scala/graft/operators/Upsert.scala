package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics expressed Spark-first (no transaction log —
  * this is the engine-level computation a lakehouse MERGE compiles
  * to: resolve each key to its newest version).
  *
  * `merge` = union of base and updates with a version ordinal, then
  * one hash-shuffle keep-newest per key via `max_by` — the same
  * single-shuffle shape as [[Dedup.keepFirst]], so a 100 TB rewrite
  * shuffles one row per key, never sorts globally. Deletes are an
  * anti-join (also a single shuffle with a broadcastable right side
  * when the delete set is small).
  */
object Upsert {

  /** Last-writer-wins merge: rows in `updates` replace base rows with
    * the same key; unmatched update rows are inserts. Both sides must
    * share the schema.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.withColumn("_v", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("_v", lit(1)))
    // ExtremumBy orders by (version, full row): deterministic even if
    // `updates` carries duplicate keys. Narrow inputs widen by key
    // first (single-row-group scans would run the fused partial maxBy
    // on one core; no-op on wide inputs — see operators.Widen)
    val picked = Widen.byKeys(tagged, keys.map(col))
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.ExtremumBy.maxBy(struct(cols.map(col): _*), col("_v")).as("_row"))
      .select(cols.map(c => col(s"_row.$c").as(c)): _*)
    picked
  }

  /** Delete by key set (anti join). */
  def delete(base: DataFrame, deleteKeys: DataFrame, keys: Seq[String]): DataFrame =
    base.join(deleteKeys.select(keys.map(col): _*), keys, "left_anti")
}
