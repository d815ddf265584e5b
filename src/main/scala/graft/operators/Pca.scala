package graft.operators

import graft.functions.{VecMoments, VectorExpressions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the classic two-stage
  * shape: ONE map-side-combined aggregation reduces the data to its
  * sufficient statistics (count, sums, upper-triangular outer-product
  * sums — `VecMoments`, exact decimal so the fit is partitioning- and
  * run-invariant), then the d×d eigenproblem solves on the driver
  * (d=64 → 4 KB of math, independent of row count). Projection is a
  * pure scan: per component one `VecDot` against a literal vector
  * minus a precomputed scalar — `(v−μ)·c = v·c − μ·c` — so the plan
  * stays codegen-adjacent and shuffles nothing.
  *
  * The eigensolver is cyclic Jacobi with a fixed sweep order and
  * threshold: deterministic for a given covariance, which the exact
  * moments guarantee is itself deterministic. Components are
  * sign-normalized (largest-|coefficient| entry positive, lowest
  * index on ties) and ordered by descending eigenvalue (index
  * tie-break), so the model is bytewise reproducible — which is what
  * lets the DuckDB oracle splice the matrix as literals and
  * hash-match.
  *
  * 100 TB story: the aggregation is a single partial-aggregated pass
  * (no shuffle of vectors — only d(d+3)/2 decimals per partition
  * cross the wire); for corpus-scale fits, pass a deterministic
  * sample (Sampling.sampledBy) — PCA needs statistics, not the corpus.
  */
object Pca {

  final case class Model(
      mean: Array[Double],
      /** components(j) = unit eigenvector j, descending eigenvalue. */
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  def fit(df: DataFrame, vecCol: String, dims: Int, k: Int): Model = {
    require(k >= 1 && k <= dims, s"k=$k out of range for dims=$dims")
    val bytes = df
      .select(VecMoments.moments(col(vecCol), dims).as("m"))
      .head().getAs[Array[Byte]](0)
    val buf = VecMoments.decode(bytes)
    require(buf.n >= 2, s"PCA needs at least 2 vectors, got ${buf.n}")

    // population covariance, exact until the final toDouble:
    // C_ij = (n·P_ij − S_i·S_j) / n²
    val n = java.math.BigDecimal.valueOf(buf.n)
    val n2 = n.multiply(n)
    val mean = buf.sum.map(s =>
      s.divide(n, java.math.MathContext.DECIMAL128).doubleValue())
    val cov = Array.ofDim[Double](dims, dims)
    var t = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val num = n.multiply(buf.prod(t)).subtract(buf.sum(i).multiply(buf.sum(j)))
        val c = num.divide(n2, java.math.MathContext.DECIMAL128).doubleValue()
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }

    val (vals, vecs) = jacobi(cov)
    // order: eigenvalue desc, original index asc on ties
    val order = vals.indices.sortBy(j => (-vals(j), j))
    val top = order.take(k)
    val components = top.map { j =>
      val v = Array.tabulate(dims)(i => vecs(i)(j))
      // sign convention: the largest-|coefficient| entry (lowest index
      // on magnitude ties) is positive
      var best = 0
      var bi = 1
      while (bi < dims) {
        if (math.abs(v(bi)) > math.abs(v(best))) best = bi
        bi += 1
      }
      if (v(best) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, components, top.map(vals).toArray)
  }

  /** Projection columns p0..p(k-1): `round(v·c_j − μ·c_j, scale)`.
    * The dot runs ascending-index in doubles (VecDot) and μ·c_j is a
    * driver-precomputed literal — the exact arithmetic a DuckDB
    * `list_sum(list_transform(...)) - <literal>` performs, so rounded
    * projections hash-match across engines.
    */
  def projections(vecCol: Column, model: Model, scale: Int = 4): Seq[Column] =
    model.components.zipWithIndex.map { case (c, j) =>
      round(
        VectorExpressions.dot(vecCol, array(c.toSeq.map(lit): _*)) - lit(meanDot(model, j)),
        scale).as(s"p$j")
    }.toSeq

  /** Rounded PCA reconstruction error — the embedding-QC outlier
    * score (CLIP-style noise filtering: vectors the learned subspace
    * can't explain are mislabeled/garbage candidates):
    * `‖v−μ‖² − Σ_j ((v−μ)·c_j)²`, every term the same
    * ascending-index double accumulation as [[projections]], so the
    * rounded score replays bit-for-bit in SQL.
    */
  def residual(vecCol: Column, model: Model, scale: Int = 4): Column = {
    val mu = array(model.mean.toSeq.map(lit): _*)
    val centeredL2 = aggregate(
      zip_with(vecCol, mu,
        (x, m) => (x.cast("double") - m) * (x.cast("double") - m)),
      lit(0.0), (a, x) => a + x)
    val projSq = model.components.indices.map { j =>
      val p = VectorExpressions.dot(vecCol,
        array(model.components(j).toSeq.map(lit): _*)) - lit(meanDot(model, j))
      p * p
    }.reduce(_ + _)
    round(centeredL2 - projSq, scale)
  }

  /** μ·c_j with the same ascending-index double accumulation. */
  def meanDot(model: Model, j: Int): Double = {
    val c = model.components(j)
    var acc = 0.0
    var i = 0
    while (i < model.mean.length) { acc += model.mean(i) * c(i); i += 1 }
    acc
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic rotation order (row-major upper triangle), fixed
    * convergence threshold. Returns (eigenvalues, eigenvector matrix
    * with eigenvector j in COLUMN j).
    */
  private[operators] def jacobi(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (sweep < 100 && offDiag() > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tTan = {
              val s = if (theta >= 0) 1.0 else -1.0
              s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            val tau = s / (1.0 + c)
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - tTan * apq
            a(q)(q) = aqq + tTan * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - s * (aiq + tau * aip)
                a(p)(i) = a(i)(p)
                a(i)(q) = aiq + s * (aip - tau * aiq)
                a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - s * (viq + tau * vip)
              v(i)(q) = viq + s * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
