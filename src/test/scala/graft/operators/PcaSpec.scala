package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed PCA: fit correctness on data with a known principal
  * direction, exactness-backed run-invariance (the property the
  * spliced-literal oracle depends on), and basic spectral sanity.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** 2-D data stretched along (1,1)/√2 with small orthogonal noise,
    * embedded in 4 dims: top component must align with the stretch.
    */
  private def stretched = {
    val rows = (0 until 200).map { i =>
      val tVal = (i % 41) - 20.0         // spread along the diagonal
      val noise = ((i * 7) % 11 - 5) * 0.01
      (i.toLong, Array(
        (tVal + noise).toFloat, (tVal - noise).toFloat,
        (0.3 * noise).toFloat, (-0.2 * noise).toFloat))
    }
    rows.toDF("id", "vec")
  }

  test("top component aligns with the dominant direction") {
    val m = Pca.fit(stretched, "vec", dims = 4, k = 2)
    val c0 = m.components(0)
    // expect ≈ (1/√2, 1/√2, 0, 0)
    assert(math.abs(c0(0) - c0(1)) < 1e-3, c0.toSeq.toString)
    assert(math.abs(c0(0) - 1.0 / math.sqrt(2)) < 1e-3)
    assert(math.abs(c0(2)) < 0.05 && math.abs(c0(3)) < 0.05)
    assert(m.eigenvalues(0) > 50 * m.eigenvalues(1))
  }

  test("fit is partitioning-invariant (exact moments)") {
    val base = stretched
    val a = Pca.fit(base.repartition(1), "vec", 4, 3)
    val b = Pca.fit(base.repartition(7), "vec", 4, 3)
    val c = Pca.fit(base.repartition(13, col("id")), "vec", 4, 3)
    assert(a.mean.toSeq == b.mean.toSeq && b.mean.toSeq == c.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(b.components.map(_.toSeq).toSeq == c.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("components are orthonormal; eigenvalues descend") {
    val m = Pca.fit(stretched, "vec", 4, 4)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = m.components(i).zip(m.components(j)).map { case (x, y) => x * y }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-9, s"components $i,$j not orthogonal: $dot")
    }
    assert(m.eigenvalues.toSeq == m.eigenvalues.toSeq.sortBy(-_))
    // trace preservation: eigenvalue sum equals total variance
    val n = 200.0
    val data = stretched.select("vec").as[Array[Float]].collect()
    val means = (0 until 4).map(d => data.map(_(d).toDouble).sum / n)
    val totalVar = (0 until 4).map(d =>
      data.map(v => math.pow(v(d) - means(d), 2)).sum / n).sum
    assert(math.abs(m.eigenvalues.sum - totalVar) < 1e-6)
  }

  test("reconstruction residual is ~0 in-subspace and large for an outlier") {
    // data lives in the (1,1)-diagonal plane; an injected vector far
    // OFF that plane must dominate the residual ranking
    val outlier = (999L, Array(0.0f, 0.0f, 50.0f, 50.0f))
    val withOutlier = (stretched.as[(Long, Array[Float])].collect().toSeq :+ outlier)
      .toDF("id", "vec")
    // fit on the CLEAN distribution (the QC flow: a reference model
    // scores incoming vectors; fitting on contaminated data would let
    // a lone huge outlier claim its own component)
    val m = Pca.fit(stretched, "vec", 4, 2)
    val resid = withOutlier
      .select(col("id"), Pca.residual(col("vec"), m).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(resid(999L) > 100.0, s"outlier residual ${resid(999L)}")
    // in-plane points reconstruct almost exactly from 2 components
    val inPlane = resid.view.filterKeys(_ != 999L).values
    assert(inPlane.forall(_ < resid(999L) / 100))
    // partitioning-invariant scores
    val resid2 = withOutlier.repartition(7)
      .select(col("id"), Pca.residual(col("vec"), m).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(resid2 == resid)
  }

  test("projection columns center the data (mean projection ≈ 0)") {
    val m = Pca.fit(stretched, "vec", 4, 2)
    val projected = stretched.select(Pca.projections(col("vec"), m, scale = 6): _*)
    val means = projected.agg(avg(col("p0")), avg(col("p1"))).head()
    assert(math.abs(means.getDouble(0)) < 1e-3)
    assert(math.abs(means.getDouble(1)) < 1e-3)
    // variance along p0 dominates (it IS the top eigen-direction)
    val vars = projected.agg(var_pop(col("p0")), var_pop(col("p1"))).head()
    assert(vars.getDouble(0) > 50 * vars.getDouble(1))
  }
}
