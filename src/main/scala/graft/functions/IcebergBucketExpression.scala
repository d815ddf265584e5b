package graft.functions

import graft.tables.IcebergTransforms
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the Iceberg `bucket[N]` partition
  * transform — `(murmur3_x86_32(canonical_bytes(v), seed=0) &
  * Int.MaxValue) % N` per the public Iceberg table spec (Appendix B
  * defines the hash; [[graft.tables.IcebergTransforms]] pins it to
  * the spec's published test vectors). Used by the native Iceberg
  * WRITER to route rows into bucket partitions; the READER prunes
  * with the same driver-side function, so write and read can never
  * disagree.
  *
  * Spark's own `hash()` is murmur3 with seed 42 and hashes ints as
  * 4-byte blocks, where Iceberg requires seed 0 and int/long
  * unification — hence a dedicated expression rather than built-ins.
  */
case class IcebergBucket(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"bucket count must be positive, got $n")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_iceberg_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | StringType | BinaryType |
           _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg bucket transform does not support ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val h = child.dataType match {
      case IntegerType | ShortType | ByteType =>
        IcebergTransforms.hashLong(input.asInstanceOf[Number].longValue())
      case LongType => IcebergTransforms.hashLong(input.asInstanceOf[Long])
      case DateType => IcebergTransforms.hashLong(input.asInstanceOf[Int].toLong)
      case TimestampType | TimestampNTZType =>
        IcebergTransforms.hashLong(input.asInstanceOf[Long])
      case StringType =>
        IcebergTransforms.hashBytes(input.asInstanceOf[UTF8String].getBytes)
      case BinaryType => IcebergTransforms.hashBytes(input.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        IcebergTransforms.hashDecimal(input.asInstanceOf[Decimal].toJavaBigDecimal)
      case other => throw new UnsupportedOperationException(
        s"iceberg bucket transform does not support ${other.simpleString}")
    }
    (h & Int.MaxValue) % n
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucket {
  def apply(c: Column, n: Int): Column = Bridge.column(IcebergBucket(Bridge.expression(c), n))
}
