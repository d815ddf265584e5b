package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Signed-random-projection (hyperplane) LSH for cosine similarity
  * (Charikar 2002, public): bit j of a vector's signature is the sign
  * of its dot product with deterministic hyperplane j. Vectors with
  * cosine θ agree on each bit with probability 1 − θ/π, so banding the
  * bits gives a near-dup candidate generator for embeddings — the
  * vector-space analogue of the MinHash pipeline in
  * [[graft.operators.NearDup]].
  *
  * Engine portability: the ±1 hyperplane matrix is generated ONCE on
  * the driver (md5-parity of "srp:seed:bit:dim" — no RNG) and spliced
  * as literals into both the Spark plan and the DuckDB oracle SQL, so
  * both engines multiply identical constants. Dot products accumulate
  * sequentially left-to-right in doubles (the contract all vector
  * oracles here rely on) and the sign test applies to the 4-decimal
  * rounded value, matching the SQL `round(...) >= 0` exactly.
  */
object Srp {

  /** Deterministic ±1 hyperplane matrix, `nbits` rows × `dim` cols. */
  def signMatrix(nbits: Int, dim: Int, seed: String = "srp"): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nbits).map { j =>
      (0 until dim).map { d =>
        md.reset()
        val h = md.digest(s"$seed:$j:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** Signature as a packed long (bit j set iff round(dot_j,4) >= 0),
    * evaluated by the native one-pass [[SrpSignature]] expression.
    */
  def signature(vec: Column, matrix: Seq[Seq[Int]]): Column =
    Bridge.column(SrpSignature(Bridge.expression(vec), matrix))

  /** Declarative HOF twin — the readable specification the native
    * expression must reproduce (asserted in SimilaritySpec).
    */
  def signatureDeclarative(vec: Column, matrix: Seq[Seq[Int]]): Column =
    matrix.zipWithIndex.map { case (row, j) =>
      val dot = aggregate(
        zip_with(vec, array(row.map(s => lit(s.toDouble)): _*),
          (x, s) => x.cast("double") * s),
        lit(0.0),
        (acc, v) => acc + v)
      when(round(dot, 4) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Band value: bits [band*rowsPerBand, (band+1)*rowsPerBand) of the
    * signature. DuckDB: (sig >> (band*r)) & ((1<<r)-1)
    */
  def bandValue(sig: Column, band: Int, rowsPerBand: Int): Column =
    shiftright(sig, band * rowsPerBand).bitwiseAND(lit((1L << rowsPerBand) - 1))

  /** DuckDB SQL fragments mirroring the above, generated from the same
    * matrix so the oracle cannot drift.
    */
  object Sql {
    /** Packed signature of a float-list expression `v`. */
    def signature(v: String, matrix: Seq[Seq[Int]]): String =
      matrix.zipWithIndex.map { case (row, j) =>
        val lits = row.map(s => s"$s.0").mkString("[", ", ", "]")
        val dot = s"list_sum(list_transform(range(1, ${row.size + 1}), i -> $v[i]::DOUBLE * ($lits)[i]))"
        s"(CASE WHEN round($dot, 4) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")

    def bandValue(sig: String, band: Int, rowsPerBand: Int): String =
      s"(($sig >> ${band * rowsPerBand}) & ${(1L << rowsPerBand) - 1})"
  }
}

/** Native one-pass SRP signature: all `nbits` sign-dots in a single
  * traversal of the vector (the HOF twin interprets nbits × dim lambda
  * calls per row — this is the same ladder step MinHashSigs and
  * VecCosine take).
  */
case class SrpSignature(child: Expression, matrix: Seq[Seq[Int]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_signature"

  @transient private lazy val get = VectorExpressions.elementGetter(child)
  @transient private lazy val rows: Array[Array[Double]] =
    matrix.map(_.map(_.toDouble).toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var sig = 0L
    var j = 0
    while (j < rows.length) {
      val row = rows(j)
      val m = math.min(n, row.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += get(xs, i) * row(i); i += 1 }
      // same rounding Spark's round(col, 4) applies to doubles
      val rounded = java.math.BigDecimal.valueOf(dot)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (rounded >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SrpSignature =
    copy(child = c)
}
