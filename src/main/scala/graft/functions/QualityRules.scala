package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", §A1.1 — public paper): the standard pre-training text
  * filter a 100-TB pipeline runs before tokenization.
  *
  * Every signal is a Catalyst built-in / higher-order function over a
  * single scan — no UDFs, no shuffles, codegen-friendly — and each has
  * an exact DuckDB mirror in queries/OracleSql.scala so the whole rule
  * suite is hash-verified end-to-end (q_quality_rules).
  *
  * Rule set (doc fails if any):
  *  - word count outside [MinWords, MaxWords]
  *  - mean word length outside [MinMeanWordLen, MaxMeanWordLen]
  *  - symbol-to-word ratio ('#' or '...') above MaxSymbolRatio
  *  - more than MaxBulletRatio of lines start with a bullet
  *  - more than MaxEllipsisRatio of lines end with an ellipsis
  *  - under MinAlphaRatio of words contain an alphabetic character
  *  - fewer than MinStopHits distinct required stopwords present
  */
object QualityRules {

  /** Gopher's "required word" list; a quality doc contains ≥ 2. */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  final val MinWords = 50L
  final val MaxWords = 100000L
  final val MinMeanWordLen = 3.0
  final val MaxMeanWordLen = 10.0
  final val MaxSymbolRatio = 0.1
  final val MaxBulletRatio = 0.9
  final val MaxEllipsisRatio = 0.3
  final val MinAlphaRatio = 0.8
  final val MinStopHits = 2

  /** Bullet markers checked at line start (after trim). */
  val BulletPrefixes: Seq[String] = Seq("- ", "* ", "•")

  /** Physical lines of the document.
    * DuckDB: string_split(x, chr(10))
    */
  def lines(text: Column): Column = split(text, "\n", -1)

  /** '#'/'...' symbol occurrences per whitespace token, rounded.
    * DuckDB: round((occ('#') + occ('...')) / greatest(len(toks),1), 4)
    */
  def symbolRatio(text: Column, toks: Column): Column =
    round(
      (Text.occurrences(text, "#") + Text.occurrences(text, "...")).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)

  /** Fraction of lines whose trimmed form starts with a bullet.
    * DuckDB: round(len(list_filter(ls, l -> starts_with(trim(l),'- ')
    *   OR ...)) / greatest(len(ls),1), 4)
    */
  def bulletRatio(ls: Column): Column = {
    val isBullet = (l: Column) =>
      BulletPrefixes.map(p => trim(l).startsWith(p)).reduce(_ || _)
    round(
      size(filter(ls, isBullet)).cast("double") /
        greatest(size(ls), lit(1)).cast("double"),
      4)
  }

  /** Fraction of lines whose right-trimmed form ends with "...".
    * DuckDB: round(len(list_filter(ls, l -> ends_with(rtrim(l),'...')))
    *   / greatest(len(ls),1), 4)
    */
  def ellipsisRatio(ls: Column): Column =
    round(
      size(filter(ls, l => rtrim(l).endsWith("..."))).cast("double") /
        greatest(size(ls), lit(1)).cast("double"),
      4)

  /** Fraction of whitespace tokens containing an alphabetic char.
    * DuckDB: round(len(list_filter(toks, t -> regexp_matches(t,
    *   '[a-zA-Z]'))) / greatest(len(toks),1), 4)
    */
  def alphaRatio(toks: Column): Column =
    round(
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)

  /** Number of distinct required stopwords present among the (lowered)
    * word tokens.
    * DuckDB: len(list_intersect(wtoks, ['the','be',...]))
    */
  def stopHits(wordToks: Column): Column =
    size(array_intersect(wordToks, array(RequiredStopwords.map(lit): _*)))
      .cast("long")

  /** Per-rule fail flags + overall pass, as named columns appended to
    * a frame that already carries the materialized signal columns
    * (`n_words, mwl, symr, bulr, ellr, alpr, stoph`).
    */
  def failFlags(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val f = (c: Column) => when(c, 1L).otherwise(0L)
    df
      .withColumn("f_words", f(col("n_words") < MinWords || col("n_words") > MaxWords))
      .withColumn("f_mwl", f(col("mwl") < MinMeanWordLen || col("mwl") > MaxMeanWordLen))
      .withColumn("f_symbol", f(col("symr") > MaxSymbolRatio))
      .withColumn("f_bullet", f(col("bulr") > MaxBulletRatio))
      .withColumn("f_ellipsis", f(col("ellr") > MaxEllipsisRatio))
      .withColumn("f_alpha", f(col("alpr") < MinAlphaRatio))
      .withColumn("f_stop", f(col("stoph") < MinStopHits))
      .withColumn("pass",
        when(col("f_words") + col("f_mwl") + col("f_symbol") + col("f_bullet") +
          col("f_ellipsis") + col("f_alpha") + col("f_stop") === 0L, 1L).otherwise(0L))
  }
}
