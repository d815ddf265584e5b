package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
  * at most `k` counters survive, every item with true frequency
  * > n/(k+1) is guaranteed present, and each reported count
  * under-estimates the true count by at most n/(k+1) (n = items
  * processed, returned alongside each counter).
  *
  * Scale shape: the one-pass, bounded-memory answer to "top domains /
  * tokens / keys over 100 TB" — k counters per partial buffer,
  * map-side combine, only k rows per group cross the shuffle. The
  * exact groupBy alternative shuffles every distinct item. Like the
  * HLL sketches, counter VALUES may vary with partitioning (merge
  * order); the membership and error guarantees above hold for every
  * partitioning, which is what the spec asserts.
  *
  * Output: array<struct<item string, est bigint, n bigint>> sorted by
  * est desc, item asc.
  */
case class FrequentItemsSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FrequentItemsSketch.Buffer] {

  require(k > 0, "k must be positive")

  // analysis-time type enforcement: a wrong-typed item column fails
  // at planning with a named error, not a mid-task ClassCastException
  // (callers wanting top numeric keys cast to string first; the SQL
  // builder does so automatically)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_frequent_items needs a STRING item column, " +
        s"got ${child.dataType.simpleString}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("n", LongType))), containsNull = false)
  override def prettyName: String = "graft_frequent_items"

  override def createAggregationBuffer(): FrequentItemsSketch.Buffer =
    new FrequentItemsSketch.Buffer()

  override def update(buf: FrequentItemsSketch.Buffer, input: InternalRow)
      : FrequentItemsSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L, k)
    buf
  }

  override def merge(buf: FrequentItemsSketch.Buffer, other: FrequentItemsSketch.Buffer)
      : FrequentItemsSketch.Buffer = {
    other.counters.forEach((item, c) => buf.offerMerge(item, c))
    buf.n += other.n
    buf.shrink(k)
    buf
  }

  override def eval(buf: FrequentItemsSketch.Buffer): Any = {
    val items = new java.util.ArrayList[(String, Long)]()
    buf.counters.forEach((item, c) => items.add((item, c)))
    items.sort((a, b) =>
      if (a._2 != b._2) java.lang.Long.compare(b._2, a._2) else a._1.compareTo(b._1))
    val out = new Array[Any](items.size)
    var i = 0
    while (i < items.size) {
      val (item, c) = items.get(i)
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c, buf.n))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: FrequentItemsSketch.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeLong(buf.n)
    dos.writeInt(buf.counters.size)
    buf.counters.forEach { (item, c) =>
      val b = item.getBytes("UTF-8")
      dos.writeInt(b.length); dos.write(b); dos.writeLong(c)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FrequentItemsSketch.Buffer = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new FrequentItemsSketch.Buffer()
    buf.n = dis.readLong()
    val size = dis.readInt()
    (0 until size).foreach { _ =>
      val len = dis.readInt()
      val b = new Array[Byte](len)
      dis.readFully(b)
      buf.counters.put(new String(b, "UTF-8"), dis.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FrequentItemsSketch {
  /** k counters + the processed-item count (the error bound's n). */
  final class Buffer {
    val counters = new java.util.HashMap[String, Long]()
    var n: Long = 0L

    /** Classic MG insert: bump a live counter, open a slot, or decay
      * everything by one (dropping zeros).
      */
    def offer(item: String, by: Long, k: Int): Unit = {
      n += by
      val cur = counters.get(item)
      if (cur != 0L || counters.containsKey(item)) counters.put(item, cur + by)
      else if (counters.size < k) counters.put(item, by)
      else {
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= by) it.remove()
          else e.setValue(e.getValue - by)
        }
      }
    }

    /** Merge-side accumulate (no decay yet — [[shrink]] restores the
      * k-counter bound after all of `other` is folded in).
      */
    def offerMerge(item: String, by: Long): Unit = {
      val cur = counters.get(item)
      counters.put(item, cur + by)
    }

    /** Keep the k largest counters, subtracting the (k+1)-th largest
      * from the survivors — the Agarwal et al. merge that preserves
      * the n/(k+1) error bound.
      */
    def shrink(k: Int): Unit = {
      if (counters.size <= k) return
      val values = new java.util.ArrayList[Long](counters.values())
      values.sort((a, b) => java.lang.Long.compare(b, a))
      val cut = values.get(k) // (k+1)-th largest
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove()
        else e.setValue(e.getValue - cut)
      }
    }
  }
}
