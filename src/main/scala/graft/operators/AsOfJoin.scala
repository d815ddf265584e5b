package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the most recent
  * right row with `right.ts <= left.ts` within the same key.
  *
  * Spark has no built-in as-of join. The naive formulations are a
  * range join (O(n·m) per key after the equi-join) or a per-left-row
  * subquery — both collapse at scale. This is the single-shuffle
  * union trick used by time-series engines: union both sides tagged
  * with a side marker, hash-shuffle once on the key, sort each
  * key-partition by (ts, side), and carry the latest right payload
  * forward with last_value(ignoreNulls). Cost = one shuffle + one
  * sort, independent of the time-overlap fan-out; skew on hot keys is
  * AQE's standard skew-join case.
  *
  * Right rows sort before left rows at equal timestamps, so a right
  * row exactly at `left.ts` matches (inclusive as-of). Ties among
  * right rows at the same (key, ts) resolve to the greatest payload
  * struct, making the result total-order deterministic.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(payloadType(right, rightTs, rightPayload)))
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_rpay", payloadStruct(rightTs, rightPayload))
      .select((keys ++ Seq("_ts", "_side", "_rpay")).map(col): _*)

    val lSlim = l.select((leftCols ++ Seq("_ts", "_side", "_rpay")).map(col): _*)
    val unioned = lSlim.unionByName(r.select(lSlim.columns.map(c =>
      if (r.columns.contains(c)) col(c) else lit(null).cast(lSlim.schema(c).dataType).as(c)): _*))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    // tolerance (the pandas merge_asof shape): a match older than
    // `toleranceUs` behaves like no match at all — scan-side gate,
    // the join shape is unchanged
    val gate = toleranceUs.map(t =>
      graft.functions.TimeFns.tsUs(col("_ts")) -
        graft.functions.TimeFns.tsUs(col(s"_match.$rightTs")) <= t)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val outCols = leftCols.map(col) ++
      Seq(when(gate, col(s"_match.$rightTs")).as(s"asof_$rightTs")) ++
      rightPayload.map(p => when(gate, col(s"_match.$p")).as(s"asof_$p"))
    matched.select(outCols: _*)
  }

  /** Forward as-of: the *earliest* right row with `right.ts >= left.ts`
    * — same single-shuffle shape, with the window looking forward and
    * right rows sorting after left rows at equal timestamps (so an
    * exactly-simultaneous right row still matches).
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .withColumn("_rpay", lit(null).cast(payloadType(right, rightTs, rightPayload)))
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", payloadStruct(rightTs, rightPayload))
      .select((keys ++ Seq("_ts", "_side", "_rpay")).map(col): _*)

    val lSlim = l.select((leftCols ++ Seq("_ts", "_side", "_rpay")).map(col): _*)
    val unioned = lSlim.unionByName(r.select(lSlim.columns.map(c =>
      if (r.columns.contains(c)) col(c) else lit(null).cast(lSlim.schema(c).dataType).as(c)): _*))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_rpay").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = unioned
      .withColumn("_match", first(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)

    val gate = toleranceUs.map(t =>
      graft.functions.TimeFns.tsUs(col(s"_match.$rightTs")) -
        graft.functions.TimeFns.tsUs(col("_ts")) <= t)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val outCols = leftCols.map(col) ++
      Seq(when(gate, col(s"_match.$rightTs")).as(s"asof_$rightTs")) ++
      rightPayload.map(p => when(gate, col(s"_match.$p")).as(s"asof_$p"))
    matched.select(outCols: _*)
  }

  private def payloadStruct(rightTs: String, payload: Seq[String]): Column =
    struct((rightTs +: payload).map(col): _*)

  private def payloadType(right: DataFrame, rightTs: String, payload: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      (rightTs +: payload).map(c => right.schema(c)))
}
