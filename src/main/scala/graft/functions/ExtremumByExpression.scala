package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Keep-one-row-per-key aggregate: the row whose `ord` is the
  * minimum (or maximum) of the group.
  *
  * Functionally equal to Spark's `min_by`/`max_by`, but as a
  * TypedImperativeAggregate with a mutable byte buffer it is eligible
  * for ObjectHashAggregateExec — `min_by` is declarative with a
  * struct buffer, which forces SortAggregate (sort every partition by
  * the group key before aggregating). For the dedup/merge operators
  * that keep one row per key over the whole corpus, dropping that
  * per-partition sort is the difference between hash-agg scan speed
  * and sort-bound CPU at 100 TB. Partial/final merge semantics are
  * preserved, so only one row per key ever crosses the shuffle.
  */
case class ExtremumBy(
    value: Expression,
    ord: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ExtremumBy.Buffer] {

  override def children: Seq[Expression] = Seq(value, ord)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType
  override def prettyName: String = if (isMin) "graft_min_by" else "graft_max_by"

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  private def pairSchema = StructType(Seq(
    StructField("o", ord.dataType), StructField("v", value.dataType)))

  @transient private lazy val pairProjection =
    UnsafeProjection.create(pairSchema)

  override def createAggregationBuffer(): ExtremumBy.Buffer = new ExtremumBy.Buffer(null)

  override def update(buf: ExtremumBy.Buffer, input: InternalRow): ExtremumBy.Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      if (buf.pair == null || better(o, buf.pair.get(0, ord.dataType))) {
        val v = value.eval(input)
        buf.pair = pairProjection(new GenericInternalRow(Array[Any](o, v))).copy()
      }
    }
    buf
  }

  override def merge(buf: ExtremumBy.Buffer, other: ExtremumBy.Buffer): ExtremumBy.Buffer = {
    if (other.pair != null &&
        (buf.pair == null ||
          better(other.pair.get(0, ord.dataType), buf.pair.get(0, ord.dataType)))) {
      buf.pair = other.pair
    }
    buf
  }

  private def better(candidate: Any, incumbent: Any): Boolean = {
    val c = ordering.compare(candidate, incumbent)
    if (isMin) c < 0 else c > 0
  }

  override def eval(buf: ExtremumBy.Buffer): Any =
    if (buf.pair == null) null else buf.pair.get(1, value.dataType)

  override def serialize(buf: ExtremumBy.Buffer): Array[Byte] =
    if (buf.pair == null) Array.emptyByteArray else buf.pair.getBytes

  override def deserialize(bytes: Array[Byte]): ExtremumBy.Buffer =
    if (bytes.isEmpty) new ExtremumBy.Buffer(null)
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new ExtremumBy.Buffer(row)
    }

  override def withNewMutableAggBufferOffset(offset: Int): ExtremumBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExtremumBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): ExtremumBy =
    copy(value = children(0), ord = children(1))
}

object ExtremumBy {
  /** Mutable holder for the current best (ord, value) UnsafeRow pair. */
  final class Buffer(var pair: UnsafeRow)

  def minBy(value: Column, ord: Column): Column =
    Bridge.column(
      ExtremumBy(Bridge.expression(value), Bridge.expression(ord), isMin = true)
        .toAggregateExpression())

  def maxBy(value: Column, ord: Column): Column =
    Bridge.column(
      ExtremumBy(Bridge.expression(value), Bridge.expression(ord), isMin = false)
        .toAggregateExpression())
}
