package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Z-order (Morton-curve) clustering: co-locate rows that are close in
  * a MULTI-dimensional key space into the same files, so per-file
  * min/max stats become selective in every z-ordered dimension at once
  * — the layout trick behind `OPTIMIZE ZORDER BY` in lakehouse engines
  * (public Delta OPTIMIZE docs / databricks engineering posts describe
  * the same construction: range-bucket each column, interleave bits).
  *
  * Scale shape: boundaries are one approx-quantile pass (driver gets
  * ≤ 2^bits doubles per column); binning + bit interleaving are pure
  * scan expressions; the only shuffle is the final range partition by
  * z-value — exactly the shuffle any clustered rewrite must do. No
  * row-by-row driver work, no global sort (range partition + within-
  * partition sort).
  */
object ZOrder {

  /** Equi-depth bucket boundaries for one column: the interior
    * `2^bits − 1` approximate quantiles. Rank-based (not min/max
    * width) so skewed columns still fill all buckets.
    */
  def boundaries(df: DataFrame, column: String, bits: Int, relErr: Double = 0.001): Array[Double] = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (1 << bits)).toArray
    df.stat.approxQuantile(column, probs, relErr)
  }

  /** Bucket id in [0, 2^bits) via binary search over sorted literal
    * boundaries (native expression — a lambda-filter over a 255-element
    * literal array would interpret per element).
    */
  def bucketOf(c: Column, bounds: Array[Double]): Column =
    Bridge.column(SearchSorted(Bridge.expression(c.cast("double")), bounds.toSeq))

  /** Morton interleave of per-column bucket ids: bit i of column c
    * lands at position `i * ncols + c`. Static shift/mask arithmetic —
    * codegen-friendly, no UDF.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val ncols = buckets.size
    val terms = for {
      (b, c) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), i * ncols + c)
    terms.reduce(_ + _)
  }

  /** The z-value column for `cols` of `df` — ALL columns' boundaries
    * come from one multi-column approx-quantile pass (per-column calls
    * would scan the table once per dimension).
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    // the equi-depth bucketing casts to double: a non-numeric column
    // would bucket every row identically (nulls) and the "clustered"
    // layout would silently be arbitrary order — refuse instead
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType,
        s"z-order column $c is ${dt.simpleString}; only numeric/timestamp " +
          "columns have a meaningful equi-depth bucketing")
    }
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (1 << bits)).toArray
    val allBounds = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
    interleave(
      cols.zip(allBounds).map { case (c, bounds) => bucketOf(col(c), bounds) },
      bits)
  }

  /** Cluster `df` into `numFiles` z-ordered output partitions: range-
    * partition by z-value (so each file owns a contiguous z-range) and
    * sort within partitions (so row groups inside a file are tight
    * too). Feed the result straight to any writer.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int, bits: Int = 8): DataFrame = {
    val z = zvalue(df, cols, bits)
    df.withColumn("_graft_zval", z)
      .repartitionByRange(math.max(1, numFiles), col("_graft_zval"))
      .sortWithinPartitions("_graft_zval")
      .drop("_graft_zval")
  }
}

/** Binary search over sorted literal boundaries: the number of
  * boundaries ≤ the value (== equi-depth bucket id). O(log n) per row
  * vs O(n) for an interpreted higher-order filter.
  */
case class SearchSorted(child: Expression, bounds: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_search_sorted"

  @transient private lazy val arr: Array[Double] = bounds.toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = arr.length // bucket = count of bounds <= x
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(c: Expression): SearchSorted =
    copy(child = c)
}
