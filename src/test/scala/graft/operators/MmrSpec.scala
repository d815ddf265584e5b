package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR greedy selection: relevance-first pick, diversity pressure,
  * and partitioning-determinism of the full pick sequence.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters; query sits on cluster A
  private def corpus = {
    def v(base: Array[Double], eps: Double) = base.map(x => (x + eps).toFloat)
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    val c = Array(0.6, 0.6, 0.0, 0.0)
    Seq(
      (1L, v(a, 0.00)), (2L, v(a, 0.01)), (3L, v(a, 0.02)),
      (10L, v(b, 0.00)), (11L, v(b, 0.01)),
      (20L, v(c, 0.00))
    ).toDF("id", "vec")
  }

  private val query = Array(1.0, 0.0, 0.0, 0.0)

  test("first pick is pure relevance; later picks avoid near-duplicates") {
    // λ=0.3: diversity-weighted. (At λ>0.5 a sim≈1 duplicate with
    // rel≈1 scores 2λ−1 > 0 and legitimately beats an orthogonal
    // candidate — MMR semantics, not a bug.)
    val picks = Mmr.select(corpus, "id", "vec", query, k = 3, lambdaRel = 0.3)
    assert(picks.head._2 == 1L) // exact query match wins rank 1
    val ids = picks.map(_._2)
    // a pure-relevance top-3 would be all of cluster A (1,2,3); MMR
    // must break out of the cluster for diversity
    assert(ids.toSet != Set(1L, 2L, 3L), s"no diversity pressure: $ids")
    // one pick per cluster: A (query hit), then the two other clusters
    assert(ids.head == 1L && ids.tail.forall(i => i >= 10L), ids.toString)
    // ranks are 1..k; the cluster-C pick carries its real overlap
    // with selected (cluster B is exactly orthogonal → maxSim 0)
    assert(picks.map(_._1) == Seq(1L, 2L, 3L))
    assert(picks.head._4 == 0.0)
    assert(picks.find(_._2 == 20L).exists(_._4 > 0.5))
  }

  test("pick sequence is partitioning-invariant") {
    val a = Mmr.select(corpus.repartition(1), "id", "vec", query, 4, 0.7)
    val b = Mmr.select(corpus.repartition(5), "id", "vec", query, 4, 0.7)
    assert(a == b)
  }

  test("k larger than the corpus refuses") {
    val e = intercept[IllegalArgumentException] {
      Mmr.select(corpus, "id", "vec", query, k = 10, lambdaRel = 0.7)
    }
    assert(e.getMessage.contains("candidates"))
  }
}
