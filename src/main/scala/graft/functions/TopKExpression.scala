package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k rows minimizing `ord` per
  * group, returned as an array sorted best-first.
  *
  * The window formulation (`row_number() over (partition by g order
  * by ...) <= k`) sorts every partition — at corpus scale that is a
  * full shuffle + sort of all rows just to discard most of them. This
  * aggregate keeps a k-bounded heap per group with map-side partial
  * merge, so only k rows per group ever cross the shuffle and nothing
  * is globally sorted. Descending/tie-break priorities are encoded in
  * the `ord` struct (negate numeric fields for descending).
  */
case class TopKRows(
    value: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKRows.Buffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(value, ord)
  override def nullable: Boolean = false
  // a nullable value expression can store nulls in the buffer, which
  // then surface as null array elements — declare that honestly (the
  // TopK rewrite path passes a non-null CreateStruct, so it still gets
  // containsNull = false).
  override def dataType: DataType = ArrayType(value.dataType, containsNull = value.nullable)
  override def prettyName: String = "graft_top_k"

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(ord.dataType)
  @transient private lazy val pairOrdering: Ordering[UnsafeRow] =
    (x: UnsafeRow, y: UnsafeRow) =>
      ordering.compare(x.get(0, ord.dataType), y.get(0, ord.dataType))

  private def pairSchema = StructType(Seq(
    StructField("o", ord.dataType), StructField("v", value.dataType)))

  @transient private lazy val pairProjection = UnsafeProjection.create(pairSchema)

  override def createAggregationBuffer(): TopKRows.Buffer = new TopKRows.Buffer()

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      // only materialize the row if it can enter the kept set
      val admissible = buf.rows.size < k ||
        ordering.compare(o, buf.worst(pairOrdering).get(0, ord.dataType)) < 0
      if (admissible) {
        val pair = pairProjection(new GenericInternalRow(Array[Any](o, value.eval(input)))).copy()
        buf.add(pair, k)(pairOrdering)
      }
    }
    buf
  }

  override def merge(buf: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    other.rows.forEach(p => buf.add(p, k)(pairOrdering))
    buf
  }

  override def eval(buf: TopKRows.Buffer): Any = {
    val sorted = new java.util.ArrayList(buf.rows)
    sorted.sort(pairOrdering)
    val out = new Array[Any](sorted.size)
    var i = 0
    while (i < sorted.size) {
      out(i) = sorted.get(i).get(1, value.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(buf.rows.size)
    buf.rows.forEach { p =>
      val bytes = p.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKRows.Buffer()
    val n = dis.readInt()
    (0 until n).foreach { _ =>
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buf.add(row, k)(pairOrdering)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): TopKRows =
    copy(value = children(0), ord = children(1))
}

object TopKRows {
  /** k-bounded kept set. k is small, so linear worst-eviction per
    * admitted row is both simple and cache-friendly.
    */
  final class Buffer {
    val rows = new java.util.ArrayList[UnsafeRow]()

    def add(pair: UnsafeRow, k: Int)(ordering: Ordering[UnsafeRow]): Unit = {
      rows.add(pair)
      if (rows.size > k) {
        var worstIdx = 0
        var i = 1
        while (i < rows.size) {
          if (ordering.compare(rows.get(i), rows.get(worstIdx)) > 0) worstIdx = i
          i += 1
        }
        rows.remove(worstIdx)
      }
    }

    def worst(ordering: Ordering[UnsafeRow]): UnsafeRow = {
      var w: UnsafeRow = null
      rows.forEach(p => if (w == null || ordering.compare(p, w) > 0) w = p)
      w
    }
  }

  def topK(value: Column, ord: Column, k: Int): Column =
    Bridge.column(
      TopKRows(Bridge.expression(value), Bridge.expression(ord), k).toAggregateExpression())
}
