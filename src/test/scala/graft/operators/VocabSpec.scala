package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "Punctuation, should not; split-tokens badly!").toDF("text")

  test("token counts lower, strip punctuation boundaries and drop empties") {
    val counts = Vocab.tokenCounts(corpus, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the") == 4L)
    assert(counts("sat") == 2L)
    assert(counts("punctuation") == 1L)
    assert(counts("split") == 1L && counts("tokens") == 1L)
    assert(!counts.contains(""))
  }

  test("min-count floor and deterministic ranked ids") {
    val v = Vocab.build(corpus, "text", minCount = 2).orderBy("vocab_id").collect()
    // freq desc, token asc: the(4), a(2), cat(2), dog(2), on(2), sat(2)
    assert(v.map(_.getAs[String]("token")).toSeq == Seq("the", "a", "cat", "dog", "on", "sat"))
    assert(v.map(_.getAs[Long]("vocab_id")).toSeq == (1L to 6L))
    assert(v.head.getAs[Long]("freq") == 4L)
  }

  test("encode maps tokens to ids and drops out-of-vocab tokens") {
    val vocab = Vocab.build(corpus, "text", minCount = 2)
    val enc = Vocab.encode(Seq("the unknown cat sat").toDF("text"), "text", vocab)
      .select("token_ids").head().getSeq[Long](0)
    val ids = vocab.collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("vocab_id")).toMap
    assert(enc == Seq(ids("the"), ids("cat"), ids("sat")))
  }

  test("vocabulary ids are stable across repartitioning") {
    val a = Vocab.build(corpus, "text", minCount = 1).orderBy("vocab_id").collect().toSeq
    val b = Vocab.build(corpus.repartition(7), "text", minCount = 1)
      .orderBy("vocab_id").collect().toSeq
    assert(a == b)
  }
}
