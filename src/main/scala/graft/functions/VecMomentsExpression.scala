package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigDecimal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact first+second moments of a vector column in ONE pass:
  * count, per-dimension sums, and the upper-triangular sum of outer
  * products — the sufficient statistics for a covariance matrix (and
  * therefore PCA), accumulated as exact `BigDecimal`s.
  *
  * Exactness is the point: float→double is exact, a product of two
  * doubles-from-floats is exact in double (24-bit mantissas), and
  * double→BigDecimal is exact — so addition order cannot change the
  * result, making the aggregate PARTITIONING- AND RUN-INVARIANT. A
  * plain double accumulator would give the optimizer's merge order a
  * vote in the low bits, and anything derived from the covariance
  * (eigenvectors) would wobble across runs — the same reason the
  * k-means learner (Similarity.kmeansCentroids) sums in decimal.
  *
  * Cost: d + d(d+1)/2 BigDecimal ops per row (d=64 → 2144). That is
  * the per-row price of determinism; for 100 TB-scale fits, sample
  * the input (Pca.fit takes any DataFrame — feed it a deterministic
  * Sampling.sampledBy slice) rather than weaken the arithmetic.
  */
case class VecMoments(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VecMoments.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_vec_moments"

  @transient private lazy val get = VectorExpressions.elementGetter(child)

  override def createAggregationBuffer(): VecMoments.Buffer =
    VecMoments.Buffer.empty(dims)

  override def update(buf: VecMoments.Buffer, input: InternalRow): VecMoments.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dims,
        s"graft_vec_moments(dims=$dims) got a ${arr.numElements()}-element vector")
      val xs = new Array[BigDecimal](dims)
      var i = 0
      while (i < dims) { xs(i) = new BigDecimal(get(arr, i)); i += 1 }
      buf.n += 1
      i = 0
      var t = 0
      while (i < dims) {
        buf.sum(i) = buf.sum(i).add(xs(i))
        var j = i
        while (j < dims) {
          buf.prod(t) = buf.prod(t).add(xs(i).multiply(xs(j)))
          j += 1; t += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecMoments.Buffer, other: VecMoments.Buffer): VecMoments.Buffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.sum.length) { buf.sum(i) = buf.sum(i).add(other.sum(i)); i += 1 }
    i = 0
    while (i < buf.prod.length) { buf.prod(i) = buf.prod(i).add(other.prod(i)); i += 1 }
    buf
  }

  override def eval(buf: VecMoments.Buffer): Any = serialize(buf)

  override def serialize(buf: VecMoments.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dims)
    out.writeLong(buf.n)
    def writeBd(b: BigDecimal): Unit = {
      val unscaled = b.unscaledValue().toByteArray
      out.writeInt(b.scale())
      out.writeInt(unscaled.length)
      out.write(unscaled)
    }
    buf.sum.foreach(writeBd)
    buf.prod.foreach(writeBd)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMoments.Buffer =
    VecMoments.decode(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): VecMoments =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecMoments =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): VecMoments =
    copy(child = children(0))
}

object VecMoments {
  /** n, sum_i, and row-major upper-triangular prod_(i,j>=i). */
  final class Buffer(var n: Long, val sum: Array[BigDecimal], val prod: Array[BigDecimal])

  object Buffer {
    def empty(dims: Int): Buffer = new Buffer(
      0L,
      Array.fill(dims)(BigDecimal.ZERO),
      Array.fill(dims * (dims + 1) / 2)(BigDecimal.ZERO))
  }

  def decode(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dims = in.readInt()
    val n = in.readLong()
    def readBd(): BigDecimal = {
      val scale = in.readInt()
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      new BigDecimal(new java.math.BigInteger(arr), scale)
    }
    val sum = Array.fill(dims)(readBd())
    val prod = Array.fill(dims * (dims + 1) / 2)(readBd())
    new Buffer(n, sum, prod)
  }

  def moments(vec: Column, dims: Int): Column =
    Bridge.column(VecMoments(Bridge.expression(vec), dims).toAggregateExpression())
}
