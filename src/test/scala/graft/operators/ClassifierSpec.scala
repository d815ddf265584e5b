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

  test("evaluate: per-class P/R/F1 from the confusion marginals (hand case)") {
    // gold:  a a a b b c      pred:  a a b b c a
    // a: tp 2, n_gold 3, n_pred 3 -> P 0.6667 R 0.6667 F1 0.6667
    // b: tp 1, n_gold 2, n_pred 2 -> P 0.5    R 0.5    F1 0.5
    // c: tp 0, n_gold 1, n_pred 1 -> all 0
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "c"), ("c", "a")).toDF("gold", "pred")
    val got = Classifier.evaluate(df, "gold", "pred")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 3L, 2L, 0.6667, 0.6667, 0.6667),
      ("b", 2L, 2L, 1L, 0.5, 0.5, 0.5),
      ("c", 1L, 1L, 0L, 0.0, 0.0, 0.0)))
    // a class only ever predicted (never gold) still gets a row
    val skew = Classifier.evaluate(
      Seq(("x", "y")).toDF("gold", "pred"), "gold", "pred")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(skew == Seq(
      ("x", 1L, 0L, 0L, 0.0, 0.0, 0.0),
      ("y", 0L, 1L, 0L, 0.0, 0.0, 0.0)))
    // null labels (abstentions) are ONE first-class row, not two
    // disjoint half-rows; null<=>null agreements count as tp
    val nulls = Classifier.evaluate(
      Seq((Some("a"), Some("a")), (None, Some("a")), (None, None))
        .toDF("gold", "pred"), "gold", "pred")
      .as[(Option[String], Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(nulls.toSet == Set(
      (Some("a"), 1L, 2L, 1L, 0.5, 1.0, 0.6667),
      (None, 2L, 1L, 1L, 1.0, 0.5, 0.6667)))
  }
}
