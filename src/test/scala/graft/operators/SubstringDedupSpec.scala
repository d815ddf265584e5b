package graft.operators

import graft.SparkSpec
import graft.functions.TextHashExpressions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val W = 4

  private def winnowOf(text: String): Seq[Row] =
    Seq(text).toDF("t")
      .select(TextHashExpressions.winnowHashes(col("t"), K, W).as("fp"))
      .select(explode(col("fp")).as("fp"))
      .select(col("fp.pos"), col("fp.hash"))
      .collect().toSeq

  private def gramsOf(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(TextHashExpressions.charGramHashes(col("t"), K).as("g"))
      .as[Seq[Long]].head()

  test("charGramHashes: one hash per position, empty below k") {
    val t = "abcdefgh"
    assert(gramsOf(t).length === t.length - K + 1)
    assert(gramsOf("abc").isEmpty)
    // positional identity: gram i hashes substring(i, i+k)
    val direct = (0 to t.length - K).map(i => t.substring(i, i + K))
    val hashed = direct.map(s => gramsOf(s + "x").head) // k-length prefix gram
    assert(gramsOf(t) === (0 to t.length - K).map(i => gramsOf(t.substring(i, i + K)).head))
    assert(hashed.length === direct.length)
  }

  test("winnow selects a subset of gram hashes, in position order") {
    val t = "the quick brown fox jumps over the lazy dog"
    val fps = winnowOf(t)
    val all = gramsOf(t)
    assert(fps.nonEmpty)
    fps.foreach { r =>
      val pos = r.getInt(0); val h = r.getLong(1)
      assert(all(pos) === h, s"fingerprint at $pos must be the gram hash there")
    }
    val positions = fps.map(_.getInt(0))
    assert(positions === positions.sorted)
    assert(positions.distinct === positions)
  }

  test("winnow coverage: every window of w grams contains a selection") {
    val t = "a quick brown fox jumps over a lazy dog again and again"
    val sel = winnowOf(t).map(_.getInt(0)).toSet
    val m = t.length - K + 1
    (0 to m - W).foreach { start =>
      assert((start until start + W).exists(sel.contains),
        s"window [$start, ${start + W}) has no fingerprint")
    }
  }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    // 50 deterministic doc pairs, each sharing a distinct w+k-1 span
    val rnd = new scala.util.Random(7)
    def rndStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 50).foreach { i =>
      val shared = rndStr(W + K - 1) // minimal guaranteed length
      val a = rndStr(20) + shared + rndStr(20)
      val b = rndStr(35) + shared + rndStr(5)
      val fa = winnowOf(a).map(_.getLong(1)).toSet
      val fb = winnowOf(b).map(_.getLong(1)).toSet
      assert(fa.intersect(fb).nonEmpty, s"pair $i: no shared fingerprint for '$shared'")
    }
  }

  test("winnow density is ~2/(w+1) on random text") {
    val rnd = new scala.util.Random(11)
    val t = (0 until 5000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val n = winnowOf(t).size.toDouble
    val m = (t.length - K + 1).toDouble
    val density = n / m
    assert(density > 0.25 && density < 0.55, s"density $density out of range")
  }

  test("short texts: below k empty, below w one global-min fingerprint") {
    assert(winnowOf("ab").isEmpty)
    val t = "abcdef" // 2 grams < W
    val fps = winnowOf(t)
    assert(fps.size === 1)
    assert(fps.head.getLong(1) === gramsOf(t).min)
  }

  test("gramDupStats finds the duplicated span and only it") {
    val boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED"
    val docs = Seq(
      (1L, s"unique alpha text one $boiler tail a", "s1"),
      (2L, s"different beta second body $boiler z", "s1"),
      (3L, "entirely unrelated third document body here", "s2")
    ).toDF("doc_id", "text", "src")
    val stats = SubstringDedup.gramDupStats(docs, "doc_id", "text", "src", k = 20)
      .orderBy("doc_id").collect()
    assert(stats.length === 3)
    val Array(d1, d2, d3) = stats
    assert(d1.getAs[Long]("n_dup_pos") > 0, "doc 1 must report duplicated positions")
    assert(d2.getAs[Long]("n_dup_pos") > 0)
    assert(d3.getAs[Long]("n_dup_pos") === 0, "unique doc must report none")
    // dup positions are exactly the k-grams inside the shared span —
    // which includes the single space on each side of the boilerplate
    // (both docs surround it with spaces)
    assert(d1.getAs[Long]("n_dup_pos") === (boiler.length + 2 - 20 + 1))
  }

  test("winnowedPairs: sharing docs pair up, unrelated docs do not") {
    val shared = "jumped over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, s"first document prefix $shared first suffix text"),
      (2L, s"second intro $shared closing remarks"),
      (3L, "nothing in common with anything else at all here")
    ).toDF("doc_id", "text")
    val pairs = SubstringDedup.winnowedPairs(docs, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing is partition-count invariant (pure per-row expression)") {
    val texts = (1 to 40).map(i => (i.toLong, s"document body number $i shared trailing boilerplate clause"))
    val df1 = spark.createDataFrame(texts).toDF("doc_id", "text").repartition(1)
    val df8 = spark.createDataFrame(texts).toDF("doc_id", "text").repartition(8)
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), explode(TextHashExpressions.winnowHashes(col("text"), K, W)).as("f"))
        .select(col("doc_id"), col("f.pos"), col("f.hash"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fps(df1) === fps(df8))
  }
}
