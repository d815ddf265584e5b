package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, patterns: Seq[String]): Seq[Int] =
    patterns.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))
    }

  test("automaton counts equal brute force, including overlaps") {
    val patterns = Seq("aba", "ab", "ba", "aa", "abab", "c")
    val ac = new AhoCorasick.Automaton(patterns)
    val texts = Seq("ababa", "aaaa", "abcabcab", "", "b", "cacbacab",
      "aabbaababab", "xyz", "aba" * 40)
    texts.foreach { t =>
      assert(ac.count(t).toSeq == brute(t, patterns), s"text=$t")
    }
  }

  test("expression evaluates over a DataFrame and matches brute force") {
    val patterns = Seq("fast table", "big join")
    val df = Seq(
      "a fast table and a big join and a fast table",
      "nothing here",
      "big joinbig join"
    ).toDF("text")
    val got = df.select(AhoCorasick.countMatches(col("text"), patterns))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(2, 1), Seq(0, 0), Seq(0, 2)))
  }

  test("query patterns are borderless, so the replace-count oracle is exact") {
    graft.queries.Wave6Queries.BlocklistParams.Patterns.foreach { p =>
      (1 until p.length).foreach { l =>
        assert(p.substring(0, l) != p.substring(p.length - l),
          s"pattern '$p' has border of length $l")
      }
    }
  }

  test("qBlocklist flags documents on real testdata") {
    val rows = graft.queries.Wave6Queries.qBlocklist(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    // word-soup corpus: some source must contain at least one phrase
    assert(rows.map(_.getLong(3)).sum > 0, "no blocklist hits at all")
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(3) || r.getLong(3) >= 0))
  }
}
