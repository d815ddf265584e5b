package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossDecontamSpec extends SparkSpec {
  import spark.implicits._

  // probe doc 100 is a light edit of corpus doc 1; doc 2 is unrelated;
  // corpus docs 1 and 3 are near-identical to EACH OTHER (must NOT pair
  // — cross only); probe 101 matches nothing.
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different content with no overlap whatsoever here"),
    (3L, "the quick brown fox jumps over the lazy dog again and again!")
  ).toDF("doc_id", "text")

  private def probe = Seq(
    (100L, "the quick brown fox jumps over the lazy dog again and again today"),
    (101L, "benchmark prompt that shares nothing with the training corpus")
  ).toDF("doc_id", "text")

  test("cross pairs flag only corpus↔probe near-duplicates") {
    val got = NearDup.crossMinhashPairs(corpus, probe, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(p => (p._1, p._2)).forall { case (c, p) => c <= 3L && p >= 100L })
    assert(got.map(p => (p._1, p._2)).contains((1L, 100L)))
    assert(got.map(p => (p._1, p._2)).contains((3L, 100L)))
    assert(!got.map(_._2).contains(101L))
    got.foreach(p => assert(p._3 >= 0.5 && p._3 <= 1.0))
  }

  test("pairs match exact shingle-set Jaccard and are partition-invariant") {
    val a = NearDup.crossMinhashPairs(corpus, probe, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = NearDup.crossMinhashPairs(corpus.repartition(5), probe.repartition(3),
      "doc_id", "text").as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
    // jaccard agrees with a direct shingle-hash-set computation
    val sets = (corpus.unionByName(probe))
      .select(col("doc_id"),
        graft.functions.TextHashExpressions.shingleHashSet(col("text"), 5))
      .as[(Long, Seq[Long])].collect().toMap
    a.foreach { case (c, p, j) =>
      val (sc, sp) = (sets(c).toSet, sets(p).toSet)
      val exact = sc.intersect(sp).size.toDouble / (sc.size + sp.size - sc.intersect(sp).size)
      assert(math.abs(j - exact) < 5e-5, s"pair ($c,$p): $j vs $exact")
    }
  }

  test("qFuzzyDecontam rolls up per source on real testdata") {
    val rows = graft.queries.Wave6Queries.qFuzzyDecontam(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // contaminated <= docs
      assert(r.getLong(3) >= r.getLong(2)) // pairs >= contaminated docs
    }
  }
}
