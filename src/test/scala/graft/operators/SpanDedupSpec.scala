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
}
