package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4-style global span dedup: cross-doc and within-doc repeats keep
  * only the global first occurrence, tails survive, untouched docs
  * keep their exact original bytes, membership is partitioning-
  * invariant.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4-word spans for readable fixtures
  private val span = "one two three four"
  private val other = "alpha beta gamma delta"

  test("a span repeated across docs survives only in the global first doc") {
    val docs = Seq(
      (1L, s"$span $other"),
      (2L, s"$span epsilon zeta eta theta"),
      (3L, "totally unrelated words entirely here yes")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(docs, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == s"$span $other") // first occurrence kept, untouched
    assert(out(2L) == "epsilon zeta eta theta") // repeat removed, rest intact
    assert(out(3L) == "totally unrelated words entirely here yes")
  }

  test("within-doc repeats drop the later position; the tail survives") {
    val docs = Seq((7L, s"$span $span tail words")).toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(docs, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(7L) == s"$span tail words")
  }

  test("untouched docs keep their original text verbatim (odd spacing included)") {
    val weird = "spaced   out    text   here and  more  trailing   words"
    val docs = Seq((1L, weird), (2L, s"$span x"), (3L, s"$span y"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(docs, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == weird) // no drops -> exact original, spacing preserved
    assert(out(3L) == "y")   // rebuilt doc: normalized remainder
  }

  test("empty and sub-span docs pass through; result is partitioning-invariant") {
    val docs = Seq(
      (1L, ""), (2L, "shorty"), (3L, s"$span $other"), (4L, s"$other tail")
    ).toDF("doc_id", "text")
    val a = SpanDedup.removeRepeatedSpans(docs, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    val b = SpanDedup.removeRepeatedSpans(docs.repartition(5), "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a(1L) == "" && a(2L) == "shorty")
    assert(a(3L) == s"$span $other")
    assert(a(4L) == "tail") // later occurrence of `other` dropped, tail kept
  }

  test("exciseProbeSpans cuts benchmark passages regardless of grid alignment") {
    val bench = "what is the capital of france answer paris obviously"
    val probes = Seq((100L, bench)).toDF("doc_id", "text")
    // doc 1 quotes the passage OFF-grid (one leading word shifts it);
    // with n=3 the passage (9 words >= 2*3-1) must still lose chunks
    val docs = Seq(
      (1L, s"intro $bench and some trailing words here"),
      (2L, "completely unrelated content nothing shared at all"),
      (3L, "tiny")).toDF("doc_id", "text")
    val out = SpanDedup.exciseProbeSpans(docs, "doc_id", "text",
      probes, "text", spanWords = 3)
      .as[(Long, String)].collect().toMap
    // unrelated/short docs come back byte-identical
    assert(out(2L) == "completely unrelated content nothing shared at all")
    assert(out(3L) == "tiny")
    // the quoting doc lost material and no 3-word window of what
    // survives is a probe 3-gram... the off-grid residue at the cut
    // boundaries may keep < 3 consecutive benchmark words only
    assert(out(1L).length < s"intro $bench and some trailing words here".length)
    val benchGrams = bench.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val survivorGrams = out(1L).split(" ").sliding(3).map(_.mkString(" ")).toSet
    // the guarantee is on full GRID chunks: at most boundary residue
    // (< 2 consecutive chunks' worth) of benchmark text survives
    assert((survivorGrams & benchGrams).size < benchGrams.size / 2,
      s"too much benchmark text survived: ${out(1L)}")
  }
}
