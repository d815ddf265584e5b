package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Classifier: exact-decimal linear margins over hashed unigram+bigram
  * features, the margin>0 gate, and partitioning invariance.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("K=1 collapses to a feature count: margin = bias + w·(2n−1)") {
    // every feature hashes to bucket 0; n tokens → n unigrams + (n−1) bigrams
    val docs = Seq((1L, "a b c"), (2L, "hello"), (3L, "x y")).toDF("id", "text")
    val m = Classifier.margins(docs, "id", "text",
      weights = Seq(BigDecimal("0.5")), bias = BigDecimal("0.1"))
      .as[(Long, BigDecimal)].collect().toMap
    assert(m(1L) == BigDecimal("2.6")) // 0.1 + 0.5·5
    assert(m(2L) == BigDecimal("0.6")) // 0.1 + 0.5·1
    assert(m(3L) == BigDecimal("1.6")) // 0.1 + 0.5·3
  }

  test("featureless docs score the bare bias; the gate uses margin > 0") {
    val docs = Seq(
      (1L, "s1", "one"),        // 1 feature → 0.3 − 0.5 = −0.2 → dropped
      (2L, "s1", "  "),         // no features → bias 0.3 → kept
      (3L, "s2", "a b c d"))    // 7 features → 0.3 − 3.5 = −3.2 → dropped
      .toDF("id", "src", "text")
    val got = Classifier.keepRates(docs, "id", "src", "text",
      weights = Seq(BigDecimal("-0.5")), bias = BigDecimal("0.3"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 2L, 1L, 0.1), ("s2", 1L, 0L, -3.2)))
  }

  test("margins are partitioning-invariant with many buckets") {
    val docs = (1L to 40L).map(i => (i, s"tok$i common words here ${i % 5}"))
      .toDF("id", "text")
    val w = (0 until 16).map(b => BigDecimal(b % 7 - 3) / 4)
    val a = Classifier.margins(docs.repartition(1), "id", "text", w, BigDecimal("0.2"))
      .as[(Long, BigDecimal)].collect().toMap
    val b = Classifier.margins(docs.repartition(7), "id", "text", w, BigDecimal("0.2"))
      .as[(Long, BigDecimal)].collect().toMap
    assert(a == b && a.size == 40)
  }
}
