package graft.operators

import graft.functions.TopKRows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-k without a window sort: bounded-heap aggregation
  * (graft.functions.TopKRows) keeps k rows per group map-side, so the
  * shuffle carries k rows per group instead of everything, and no
  * partition is ever sorted. Use over window `row_number() <= k`
  * whenever the input is large relative to k·groups.
  *
  * `ord` encodes the full priority (ascending struct comparison —
  * negate numeric fields for descending, append tie-break columns for
  * a total order).
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String], ord: Column, k: Int): DataFrame = {
    val valueCols = df.columns.toSeq.filterNot(groupCols.contains)
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(TopKRows.topK(struct(valueCols.map(col): _*), ord, k).as("_top"))
    agged
      .select((groupCols.map(col) :+ posexplode(col("_top"))): _*)
      .withColumn("rank", (col("pos") + 1).cast("long"))
      .select((groupCols.map(col) :+ col("rank")) ++ valueCols.map(c => col(s"col.$c").as(c)): _*)
  }
}
