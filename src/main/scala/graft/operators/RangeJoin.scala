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

  /** INTERVAL-OVERLAP join: rows of `left` and `right` sharing `key`
    * whose CLOSED numeric intervals `[leftStart, leftEnd]` and
    * `[rightStart, rightEnd]` intersect (bounds are numeric — convert
    * timestamps to micros first). Same bucketization as
    * [[pointInInterval]], with both sides exploded; an overlapping
    * pair shares every bucket of its intersection, so it is emitted
    * ONLY from the bucket containing the LATER start — exactly-once
    * without a post-join dedup shuffle. Bucket indices use floor, so
    * negative bounds align correctly.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val shared = left.columns.toSet & right.columns.toSet
    require(shared == Set(key),
      s"left and right may share only the key column '$key'; shared: ${shared.mkString(", ")}")
    def bucketsOf(df: DataFrame, s: String, e: String) =
      df.withColumn("_b", explode(sequence(
        floor(col(s).cast("double") / bucketWidth).cast("long"),
        floor(col(e).cast("double") / bucketWidth).cast("long"))))
    val lb = bucketsOf(left, leftStart, leftEnd)
    val rb = bucketsOf(right, rightStart, rightEnd)
    lb.join(rb, Seq(key, "_b"))
      .where(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      // the intersection's first bucket is common to both sides and
      // unique per pair: emit there, nowhere else
      .where(col("_b") ===
        floor(greatest(col(leftStart), col(rightStart)).cast("double") / bucketWidth)
          .cast("long"))
      .drop("_b")
  }
}
