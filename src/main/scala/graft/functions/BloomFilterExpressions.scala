package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable Bloom filter over LONG keys — the broadcastable membership
  * sketch for probe sets too large to ship exactly (cross-corpus
  * decontamination, seen-URL suppression, incremental-dedup probes).
  *
  * m bits, k probes per key via Kirsch-Mitzenmacher double hashing
  * (h1 + i·h2 mod m, "Less Hashing, Same Performance", 2006) over the
  * MurmurHash3 fmix64 finalizer — pure 64-bit arithmetic, so the
  * serialized filter is bit-identical across JVMs AND across input
  * partitionings (bit-OR is commutative), unlike the counter sketches
  * whose values are merge-order-dependent. NO false negatives ever;
  * false positives at the classic (1 - e^{-kn/m})^k rate, ~1% for
  * m = 10n bits at k = 7. Partial buffers merge by word-OR, so only
  * m/8 bytes per partial cross the shuffle regardless of probe count.
  *
  * Serialized layout (also the aggregate's output value):
  * [numBits int][numHashes int][ceil(m/64) big-endian longs].
  */
object BloomFilters {

  /** MurmurHash3 fmix64 finalizer (public-domain constants). */
  def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  def set(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L // odd => full-period stride
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt
    val numHashes = bb.getInt
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((bb.getLong(8 + (bit >>> 6) * 8) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregate: BINARY Bloom filter of the non-null LONG inputs. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0, "numBits must be positive")
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_filter needs a BIGINT key column (hash non-long keys first, " +
        s"e.g. xxhash64), got ${child.dataType.simpleString}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_filter"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomFilters.numWords(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilters.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomFilters.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilters.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt
    val words = new Array[Long](BloomFilters.numWords(numBits))
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `might_contain(filter BINARY, key BIGINT)`: false ⇒ the key was
  * definitely NOT aggregated into the filter (the guarantee the
  * two-phase probe operators rely on); true ⇒ confirm exactly.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs (BINARY, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(filter: Any, key: Any): Any =
    BloomFilters.mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
