package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Keep-one-row-per-key aggregate: the row minimizing (or maximizing)
  * `(ord, value)` lexicographically — i.e. ordered by `ord` with the
  * full row as tie-break, which makes the result total-order
  * deterministic without the caller having to build a combined
  * ordering struct.
  *
  * Two properties matter at corpus scale:
  *  - As a TypedImperativeAggregate with a byte buffer it is eligible
  *    for ObjectHashAggregateExec — `min_by` is declarative with a
  *    struct buffer, which forces SortAggregate (a per-partition sort
  *    this operator doesn't need). Partial/final merge is preserved,
  *    so one row per key crosses the shuffle.
  *  - Ordering evaluation is progressive: only the (cheap, usually
  *    single-column) `ord` is evaluated per input row; the full row
  *    struct is constructed only when a row actually improves on — or
  *    ties — the incumbent, which is O(k·groups), not O(rows).
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

  @transient private lazy val ordOrdering =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  @transient private lazy val valueOrdering =
    TypeUtils.getInterpretedOrdering(value.dataType)

  private def pairSchema = StructType(Seq(
    StructField("o", ord.dataType), StructField("v", value.dataType)))

  @transient private lazy val pairProjection =
    UnsafeProjection.create(pairSchema)

  override def createAggregationBuffer(): ExtremumBy.Buffer = new ExtremumBy.Buffer(null)

  override def update(buf: ExtremumBy.Buffer, input: InternalRow): ExtremumBy.Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      if (buf.pair == null) {
        buf.pair = pairProjection(new GenericInternalRow(Array[Any](o, value.eval(input)))).copy()
      } else {
        val c = ordOrdering.compare(o, buf.pair.get(0, ord.dataType))
        val primaryBetter = if (isMin) c < 0 else c > 0
        if (primaryBetter) {
          buf.pair = pairProjection(new GenericInternalRow(Array[Any](o, value.eval(input)))).copy()
        } else if (c == 0) {
          // tie on ord: the full row decides (rare path — only here is
          // the candidate row struct materialized)
          val v = value.eval(input)
          val cv = valueOrdering.compare(v, buf.pair.get(1, value.dataType))
          if (if (isMin) cv < 0 else cv > 0) {
            buf.pair = pairProjection(new GenericInternalRow(Array[Any](o, v))).copy()
          }
        }
      }
    }
    buf
  }

  override def merge(buf: ExtremumBy.Buffer, other: ExtremumBy.Buffer): ExtremumBy.Buffer = {
    if (other.pair != null) {
      if (buf.pair == null) buf.pair = other.pair
      else {
        val c = ordOrdering.compare(other.pair.get(0, ord.dataType), buf.pair.get(0, ord.dataType))
        val better =
          if (c != 0) { if (isMin) c < 0 else c > 0 }
          else {
            val cv = valueOrdering.compare(
              other.pair.get(1, value.dataType), buf.pair.get(1, value.dataType))
            if (isMin) cv < 0 else cv > 0
          }
        if (better) buf.pair = other.pair
      }
    }
    buf
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

  /** Row minimizing (ord, row) — `ord` should be the cheap primary
    * ordering (single column / small struct); the row itself breaks
    * ties deterministically.
    */
  def minBy(value: Column, ord: Column): Column =
    Bridge.column(
      ExtremumBy(Bridge.expression(value), Bridge.expression(ord), isMin = true)
        .toAggregateExpression())

  def maxBy(value: Column, ord: Column): Column =
    Bridge.column(
      ExtremumBy(Bridge.expression(value), Bridge.expression(ord), isMin = false)
        .toAggregateExpression())
}
