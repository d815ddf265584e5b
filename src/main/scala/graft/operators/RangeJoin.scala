package graft.operators

import graft.functions.TimeFns.tsUs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` join as a
  * broadcast-nested-loop (or a per-key cartesian with an equi-key) —
  * O(points × intervals) comparisons, which collapses at scale. The
  * standard fix is bucketization: slice time into fixed-width buckets,
  * explode each interval to the buckets it covers, map each point to
  * its single bucket, equi-join on (key, bucket), and re-apply the
  * exact range predicate. The join becomes a hash join whose fan-out
  * is interval-length/bucket-width instead of the full cross product.
  *
  * `bucketWidthUs` trades replication for selectivity: pick it near
  * the typical interval length so each interval explodes to O(1-10)
  * buckets.
  */
object RangeJoin {

  /** Join `points` (with `tsCol`, micros resolvable) to `intervals`
    * ([startCol, endCol] inclusive) sharing `key`. Returns point rows
    * + interval payload columns.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidthUs: Long
  ): DataFrame = {
    val pB = tsUs(col(tsCol)).divide(bucketWidthUs).cast("long")
    val iStart = tsUs(col(startCol)).divide(bucketWidthUs).cast("long")
    val iEnd = tsUs(col(endCol)).divide(bucketWidthUs).cast("long")

    val bucketedPoints = points.withColumn("_b", pB)
    val bucketedIntervals = intervals
      .withColumn("_b", explode(sequence(iStart, iEnd)))

    bucketedPoints
      .join(bucketedIntervals, Seq(key, "_b"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_b")
  }
}
