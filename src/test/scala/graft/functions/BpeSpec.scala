package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE teaching corpus
  private val wordFreqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def corpusDf = {
    val docs = wordFreqs.toSeq.sortBy(_._1).map { case (w, f) =>
      Seq.fill(f.toInt)(w).mkString(" ")
    }
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("local reference learner: classic corpus merges") {
    val merges = Bpe.learnLocal(wordFreqs, 4)
    // es/est dominate (newest 6 + widest 3 = 9); lexical tie-breaks
    assert(merges.head == ("e", "s"))
    assert(merges(1) == ("es", "t"))
    assert(merges.size == 4)
  }

  test("distributed learner matches the local reference exactly") {
    val got = Bpe.learn(corpusDf, "text", 6)
    val want = Bpe.learnLocal(wordFreqs, 6)
    assert(got == want, s"distributed $got vs local $want")
    // partitioning-invariant
    val got2 = Bpe.learn(corpusDf.repartition(5), "text", 6)
    assert(got2 == want)
  }

  test("batched distributed rounds: provably-safe prefix accepts several merges per job") {
    // disjoint skewed pairs: the whole prefix is provable in one round
    val ranked = Seq(("a", "b", 100L), ("c", "d", 60L), ("e", "f", 30L), ("g", "h", 10L))
    assert(Bpe.safeBatchPrefix(ranked, Seq.empty, 10) == ranked.map(p => (p._1, p._2)))
    // a candidate sharing a symbol with an accepted merge STOPS the
    // batch (its count may have changed; sequential might still pick it)
    val shared = Seq(("a", "b", 100L), ("b", "c", 60L), ("e", "f", 30L))
    assert(Bpe.safeBatchPrefix(shared, Seq.empty, 10) == Seq(("a", "b")))
    // a candidate NOT beating the created-pair bound stops the batch:
    // (x,a) below it is an origin for created pairs (x, ab), so a
    // tie with it is not provable…
    val bound = Seq(("a", "b", 100L), ("e", "f", 60L), ("x", "a", 60L))
    assert(Bpe.safeBatchPrefix(bound, Seq.empty, 10) == Seq(("a", "b")))
    // …but strictly beating every origin is
    val bound2 = Seq(("a", "b", 100L), ("e", "f", 60L), ("x", "a", 50L))
    assert(Bpe.safeBatchPrefix(bound2, Seq.empty, 10) ==
      Seq(("a", "b"), ("e", "f")))
    // an aliasing concat (symbol "cd" already exists from a prior
    // merge) accepts its own provable pick, then stops
    val alias = Seq(("c", "d", 100L), ("e", "f", 60L))
    assert(Bpe.safeBatchPrefix(alias, Seq(("c", "d")), 10) == Seq(("c", "d")))
    // maxAccept caps the batch; count<2 rows never merge
    assert(Bpe.safeBatchPrefix(ranked, Seq.empty, 2) == Seq(("a", "b"), ("c", "d")))
    assert(Bpe.safeBatchPrefix(Seq(("a", "b", 1L)), Seq.empty, 10) == Seq.empty)
  }

  test("distributed == local at 200 merges; default path is O(1) jobs") {
    // deterministic synthetic corpus with a deep merge hierarchy
    val rng = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = Seq.fill(500)(
      (1 to (10 + rng.nextInt(5))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = words.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("id", "text")

    // force the distributed loop (threshold 0) vs the local handoff
    val distributed = Bpe.learn(df, "text", 200, localVocabThreshold = 0L)
    val group = "bpe-local-path"
    spark.sparkContext.setJobGroup(group, group, interruptOnCancel = false)
    val local =
      try Bpe.learn(df, "text", 200)
      finally spark.sparkContext.clearJobGroup()
    assert(distributed.size == 200, s"corpus exhausted at ${distributed.size} merges")
    assert(distributed == local)

    Thread.sleep(500)
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    // count + collect (+ AQE stage jobs) — the point is ≪ 2·merges=400
    assert(jobs <= 6, s"local-handoff path should be O(1) jobs for 200 merges, saw $jobs")
  }

  test("encode: concatenated word tokens reconstruct each word") {
    val merges = Bpe.learn(corpusDf, "text", 6)
    val words = Seq("lowest", "newer", "wide", "unseen", "low").toDF("w")
    val got = words.select(col("w"), array_join(Bpe.encode(col("w"), merges), "").as("r"))
      .as[(String, String)].collect()
    got.foreach { case (w, r) => assert(r == w, s"round-trip broke: $w -> $r") }
  }

  test("encode applies merges greedily by rank") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = Seq("newest", "low", "lowest").toDF("w")
      .select(Bpe.encode(col("w"), merges).as("t")).as[Seq[String]].collect()
    assert(got(0) == Seq("n", "e", "w", "est"))
    assert(got(1) == Seq("low"))
    assert(got(2) == Seq("low", "est"))
    // empty merge table → plain characters
    val chars = Seq("ab c").toDF("w")
      .select(Bpe.encode(col("w"), Seq.empty).as("t")).as[Seq[String]].head()
    assert(chars == Seq("a", "b", "c"))
  }

  test("tokenCount shrinks as merges are learned") {
    val none = corpusDf.select(sum(Bpe.tokenCount(col("text"), Seq.empty))).as[Long].head()
    val merges = Bpe.learn(corpusDf, "text", 6)
    val learned = corpusDf.select(sum(Bpe.tokenCount(col("text"), merges))).as[Long].head()
    assert(learned < none, s"$learned !< $none")
  }

  test("local learner splits per code POINT: non-BMP corpora match distributed") {
    // surrogate-pair characters (emoji, supplementary CJK): a UTF-16
    // split would break 🙂 into two half-symbols and diverge the paths
    val freqs = Map("🙂🙂ab" -> 5L, "🙂🙂ac" -> 4L, "𠜎𠜎b" -> 3L, "ab" -> 2L)
    val docs = freqs.toSeq.sortBy(_._1).map { case (w, f) =>
      Seq.fill(f.toInt)(w).mkString(" ")
    }
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = Bpe.learnLocal(freqs, 5)
    val distributed = Bpe.learn(df, "text", 5, localVocabThreshold = 0L)
    assert(local == distributed, s"local $local vs distributed $distributed")
    assert(local.head._1 == "🙂", "first merge must start from the full emoji symbol")
  }

  test("learner stops when no pair repeats") {
    val df = Seq((1L, "ab cd")).toDF("id", "text")
    val merges = Bpe.learn(df, "text", 10)
    assert(merges.isEmpty) // every pair occurs once
  }
}
