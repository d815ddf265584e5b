package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native cosine similarity over two float-array columns.
  *
  * Arithmetic is identical to the declarative
  * `dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))` formulation in [[Vectors]]
  * (sequential left-to-right double accumulation of exact float→double
  * casts — the same thing the DuckDB oracle computes), but in one
  * fused loop instead of three interpreted higher-order traversals.
  * Catalyst HOF lambdas evaluate per element through the interpreter
  * (boxing every float); for a 10k-vector × 64-dim ANN scan that's
  * the entire runtime, so brute-force/IVF search goes through this.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  @transient private lazy val getL = VectorExpressions.elementGetter(left)
  @transient private lazy val getR = VectorExpressions.elementGetter(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getL(xs, i)
      val y = getR(ys, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** One-pass squared L2 distance (same sequential-accumulation
  * semantics as Vectors.l2sq before rounding).
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  @transient private lazy val getL = VectorExpressions.elementGetter(left)
  @transient private lazy val getR = VectorExpressions.elementGetter(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = getL(xs, i) - getR(ys, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** Plain dot product, sequential ascending-index double accumulation —
  * the exact arithmetic DuckDB's `list_sum(list_transform(...))`
  * performs, so rounded results hash-match across engines.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  @transient private lazy val getL = VectorExpressions.elementGetter(left)
  @transient private lazy val getR = VectorExpressions.elementGetter(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += getL(xs, i) * getR(ys, i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Element accessor by declared array element type (float or double). */
  private[functions] def elementGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  def cosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(Bridge.expression(a), Bridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(VecL2Sq(Bridge.expression(a), Bridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}
