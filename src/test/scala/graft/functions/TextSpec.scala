package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).head().get(0)

  test("native word-gram/chunk expressions equal the declarative formulation") {
    // the declarative twins the oracles were blessed against
    def toks = Text.wsTokens(col("t"))
    def chunksHof = when(size(toks) >= 8,
      transform(sequence(lit(0), floor(size(toks) / lit(8)).cast("int") - 1),
        i => array_join(slice(toks, i * lit(8) + lit(1), lit(8)), " ")))
      .otherwise(array().cast("array<string>"))
    def gramsHof = when(size(toks) >= 8,
      transform(sequence(lit(0), size(toks) - 8),
        i => PortableHash.md5Mod(array_join(slice(toks, i + lit(1), lit(8)), " "))))
      .otherwise(array().cast("array<bigint>"))

    val texts =
      spark.read.parquet(sf("sf0.001") + "/documents.parquet")
        .select(col("text").as("t")).as[String].collect().toSeq ++
      Seq("", " ", "a b c", "one two three four five six seven eight",
        "  padded   run  of nine words here in total ok  ",
        "tab\tand\nnewline separated words reach the eight count here")

    val df = texts.toDF("t")
    val native = df.select(
      TextHashExpressions.wordChunks(col("t"), 8).as("c"),
      TextHashExpressions.wordGramHashes(col("t"), 8).as("g")).collect()
    val hof = df.select(chunksHof.as("c"), gramsHof.as("g")).collect()
    native.zip(hof).zipWithIndex.foreach { case ((n, h), i) =>
      assert(n.getSeq[String](0) == h.getSeq[String](0), s"chunks differ for: ${texts(i)}")
      assert(n.getSeq[Long](1) == h.getSeq[Long](1), s"grams differ for: ${texts(i)}")
    }
  }

  test("whitespace and word tokenization") {
    assert(one(size(Text.wsTokens(col("t"))), "a  b\tc") == 3)
    assert(one(size(Text.wordTokens(col("t"))), "a-b c") == 3)
    assert(one(Text.tokenCount(col("t")), " x y ") == 2)
  }

  test("shingles: k-grams and short-string fallback") {
    assert(one(Text.shingles(col("t"), 3), "abcd") == Seq("abc", "bcd"))
    assert(one(Text.shingles(col("t"), 5), "ab") == Seq("ab"))
  }

  test("occurrences counts non-overlapping literals") {
    assert(one(Text.occurrences(col("t"), " the "), " the cat the the ") == 2)
  }

  test("ratios are rounded and division-safe") {
    assert(one(Text.punctRatio(col("t")), "a,b.c") == 0.4)
    assert(one(Text.digitRatio(col("t")), "a1b2") == 0.5)
    assert(one(Text.stopwordRatio(col("t")), "the cat sat") == 0.3333)
    assert(one(Text.meanTokenLen(col("t")), "ab abcd") == 3.0)
  }

  test("quality score stays in [0,1]") {
    val scores = Seq("", "the a of and in is", "x" * 600, "hello world this is fine")
      .toDF("t").select(Text.qualityScore(col("t")).as("q")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("langId picks the marker-richest language, first-listed wins ties") {
    assert(one(Text.langId(col("t")), "the cat and the dog of it") == "en")
    assert(one(Text.langId(col("t")), "der Hund und die Katze ist gut") == "de")
    assert(one(Text.langId(col("t")), "le chat et les chiens") == "fr")
    assert(one(Text.langId(col("t")), "el perro y los gatos") == "es")
    assert(one(Text.langId(col("t")), "nothing matches here") == "en") // all-zero tie
  }

  test("repetition metrics: diversity and modal-token share") {
    def m(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column, s: String) =
      one(f(Text.wsTokens(col("t"))), s)
    assert(m(Text.uniqueTokenRatio, "a b c d") == 1.0)
    assert(m(Text.uniqueTokenRatio, "a a a a") == 0.25)
    assert(m(Text.topTokenShare, "a a a b") == 0.75)
    assert(m(Text.topTokenShare, "a b c d") == 0.25)
  }

  test("fingerprint normalizes case and whitespace") {
    val fp1 = one(Text.fingerprint(col("t")), "  Hello   World ")
    val fp2 = one(Text.fingerprint(col("t")), "hello world")
    assert(fp1 == fp2)
  }

  test("slidingChunks: boundaries, tail coverage, overlap, degenerate inputs") {
    import org.apache.spark.sql.functions._
    def chunksOf(text: String, size: Int, stride: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(Text.slidingChunks(col("t"), size, stride).as("c"))
        .as[Seq[String]].head()
    // exact multiple: two full chunks, no phantom tail chunk
    assert(chunksOf("abcdefgh", 5, 3) == Seq("abcde", "defgh"))
    // tail covered by the last window (start 6 >= len - size)
    assert(chunksOf("abcdefghij", 4, 3) == Seq("abcd", "defg", "ghij"))
    // tail longer than the last full window adds a (shorter) chunk
    assert(chunksOf("abcdefghijk", 4, 3) == Seq("abcd", "defg", "ghij", "jk"))
    // shorter than one chunk -> the string itself
    assert(chunksOf("ab", 5, 3) == Seq("ab"))
    // empty -> one empty chunk
    assert(chunksOf("", 5, 3) == Seq(""))
    // stride == size -> disjoint chunks, every char exactly once
    val disjoint = chunksOf("abcdefghij", 3, 3)
    assert(disjoint.mkString == "abcdefghij")
    // overlap = size - stride chars shared between neighbors
    val ov = chunksOf("abcdefghij", 4, 2)
    ov.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(2) == b.take(2).take(a.takeRight(2).length))
      case _         =>
    }
  }
}
