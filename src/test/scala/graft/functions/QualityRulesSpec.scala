package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  /** Run the full signal+flag pipeline over one document. */
  private def flagsFor(text: String): Map[String, Long] = {
    val df = Seq(text).toDF("text")
      .withColumn("toks", Text.wsTokens(col("text")))
      .withColumn("wtoks", Text.wordTokens(col("text")))
      .withColumn("ls", QualityRules.lines(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mwl", Text.meanTokenLenOf(col("toks")))
      .withColumn("symr", QualityRules.symbolRatio(col("text"), col("toks")))
      .withColumn("bulr", QualityRules.bulletRatio(col("ls")))
      .withColumn("ellr", QualityRules.ellipsisRatio(col("ls")))
      .withColumn("alpr", QualityRules.alphaRatio(col("toks")))
      .withColumn("stoph", QualityRules.stopHits(col("wtoks")))
    val row = QualityRules.failFlags(df)
      .select("f_words", "f_mwl", "f_symbol", "f_bullet", "f_ellipsis", "f_alpha", "f_stop", "pass")
      .head()
    Seq("f_words", "f_mwl", "f_symbol", "f_bullet", "f_ellipsis", "f_alpha", "f_stop", "pass")
      .zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  private val goodDoc =
    ("the quick brown fox jumps over that lazy dog with plenty of words " * 5).trim

  test("a clean long document passes every rule") {
    val f = flagsFor(goodDoc)
    assert(f("pass") == 1L, s"expected pass, got $f")
  }

  test("short documents fail the word-count rule only") {
    val f = flagsFor("the dog jumped over that fence with style of note")
    assert(f("f_words") == 1L && f("pass") == 0L)
    assert(f("f_stop") == 0L && f("f_alpha") == 0L)
  }

  test("bullet-dominated documents fail the bullet rule") {
    val bullets = (1 to 10).map(i => s"- item number $i of the list").mkString("\n")
    val f = flagsFor(bullets)
    assert(f("f_bullet") == 1L)
    // the '*' and '•' markers count too
    val starred = (1 to 10).map(i => s"* item $i").mkString("\n")
    val dotted = (1 to 10).map(i => s"• item $i").mkString("\n")
    assert(flagsFor(starred)("f_bullet") == 1L)
    assert(flagsFor(dotted)("f_bullet") == 1L)
  }

  test("ellipsis-heavy documents fail the ellipsis rule") {
    val doc = (1 to 10).map(i => s"teaser line number $i continues...").mkString("\n")
    assert(flagsFor(doc)("f_ellipsis") == 1L)
    // ellipses mid-line don't count; line-final (before trailing spaces) do
    val midline = (1 to 10).map(i => s"pause ... then line $i ends").mkString("\n")
    assert(flagsFor(midline)("f_ellipsis") == 0L)
    assert(flagsFor("ends here...   \nand again...  \nplus more...")("f_ellipsis") == 1L)
  }

  test("symbol-soup fails the symbol rule; hash-free text does not") {
    val f = flagsFor("### heading ## tags # more # hashes # everywhere # now")
    assert(f("f_symbol") == 1L)
    assert(flagsFor(goodDoc)("f_symbol") == 0L)
  }

  test("numeric/non-alphabetic documents fail the alpha rule") {
    val f = flagsFor((1 to 60).map(i => s"$i ${i * 7} 0x${i}f".replace("f", "")).mkString(" "))
    assert(f("f_alpha") == 1L)
  }

  test("documents missing the required stopwords fail the stopword rule") {
    val noStops = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).trim
    val f = flagsFor(noStops)
    assert(f("f_stop") == 1L)
    // exactly two distinct required stopwords is enough
    val twoStops = ("alpha beta the gamma with delta epsilon zeta eta theta " * 6).trim
    assert(flagsFor(twoStops)("f_stop") == 0L)
  }

  test("stop hits counts distinct stopwords, not occurrences") {
    val repeated = ("the the the the alpha beta gamma delta epsilon zeta " * 6).trim
    // 'the' appears many times but is one distinct hit → fails MinStopHits=2
    assert(flagsFor(repeated)("f_stop") == 1L)
  }

  test("per-source aggregate query runs and covers all sources") {
    val out = graft.queries.PipelineQueries.qQualityRules(spark, sf())
    val rows = out.collect()
    assert(rows.length == 20)
    // fail counts never exceed doc counts; pass + any-fail partitions the set
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_pass") <= n)
      assert(r.getAs[Long]("f_words") <= n)
    }
  }
}
