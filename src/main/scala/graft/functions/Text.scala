package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-corpus pipelines:
  * tokenization, shingling, quality signals, language-ID scoring,
  * fingerprinting. All Catalyst built-ins / higher-order functions —
  * codegen-friendly, no UDFs, no shuffles — so they run at full scan
  * speed over 100 TB and every one has an exact DuckDB-SQL mirror
  * (given in each method's doc) for the correctness oracle.
  */
object Text {

  /** Whitespace tokens. DuckDB: regexp_split_to_array(trim(x), '\s+') */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word-ish tokens (BPE-style pre-tokenization: letter/digit runs).
    * DuckDB: regexp_split_to_array(lower(trim(x)), '[^a-z0-9]+')
    */
  def wordTokens(c: Column): Column = split(lower(trim(c)), "[^a-z0-9]+")

  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** Character k-shingles as an array; a string shorter than k yields
    * the single shingle = the string itself.
    * DuckDB: CASE WHEN length(x) >= k
    *   THEN list_transform(range(0, length(x)-k+1), i -> substr(x, i+1, k))
    *   ELSE [x] END
    */
  def shingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(0), length(c) - k), i => substring_index_at(c, i, k)))
      .otherwise(array(c))

  private def substring_index_at(c: Column, i: Column, k: Int): Column =
    c.substr(i + 1, lit(k))

  /** Sliding-window character chunks with overlap (size − stride): the
    * segmentation an embedding index or RAG pipeline feeds documents
    * through. Chunk i starts at i·stride (0-based); the last chunk
    * starts at the smallest multiple of stride covering the tail (and
    * may be shorter); an empty string yields one empty chunk. Pure
    * scan arithmetic — chunk COUNT first, then one substring per
    * chunk.
    * DuckDB: list_transform(range(0, 1 + (greatest(length(x)-size,0)+stride-1)//stride),
    *   i -> substr(x, i*stride + 1, size))
    */
  def slidingChunks(c: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (overlap = size - stride)")
    val n = lit(1) +
      ((greatest(length(c) - size, lit(0)) + (stride - 1)).cast("long") / stride)
        .cast("long")
    transform(sequence(lit(0L), n - 1), i => c.substr((i * stride + 1).cast("int"), lit(size)))
  }

  /** Count of non-overlapping occurrences of literal `marker`.
    * DuckDB: (length(x) - length(replace(x, m, ''))) // length(m)
    */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("int")

  /** Ratio of characters in a literal char class, rounded.
    * DuckDB mirror uses the same regex class.
    */
  def charClassRatio(c: Column, regexClass: String): Column =
    round(
      (length(c) - length(regexp_replace(c, regexClass, ""))).cast("double") /
        greatest(length(c), lit(1)).cast("double"),
      4)

  def punctRatio(c: Column): Column = charClassRatio(c, "[.,;:!?]")
  def digitRatio(c: Column): Column = charClassRatio(c, "[0-9]")

  /** Default English-ish stopword list used by quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of whitespace tokens that are stopwords.
    * DuckDB: len(list_filter(regexp_split_to_array(trim(x),'\s+'),
    *   t -> t IN (...))) / greatest(len(...), 1)
    */
  def stopwordRatio(c: Column): Column = stopwordRatioOf(wsTokens(c))

  /** Variant over a precomputed token array — materialize the tokens
    * as a column once and feed every ratio from it (HOF splits don't
    * get common-subexpression-eliminated, so sharing matters).
    */
  def stopwordRatioOf(toks: Column): Column =
    round(
      size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)

  /** Mean whitespace-token length.
    * DuckDB: round(list_sum(list_transform(toks, t -> length(t)))
    *   / greatest(len(toks),1), 4)
    */
  def meanTokenLen(c: Column): Column = meanTokenLenOf(wsTokens(c))

  def meanTokenLenOf(toks: Column): Column =
    round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)

  /** Composite quality score in [0,1]: rewards mid-length docs and
    * low punct/digit noise, light stopword presence. Deterministic
    * arithmetic over the ratios above (rounded inputs → stable).
    */
  def qualityScore(c: Column): Column =
    qualityScoreOf(c, punctRatio(c), digitRatio(c), stopwordRatio(c))

  /** Quality score from precomputed (rounded) component ratios. */
  def qualityScoreOf(c: Column, punct: Column, digit: Column, stop: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    round(
      lit(0.4) * lenScore +
        lit(0.3) * (lit(1.0) - least((punct + digit) * 5.0, lit(1.0))) +
        lit(0.3) * least(stop * 5.0, lit(1.0)),
      4)
  }

  /** Marker n-grams per language for the frequency-vote language ID.
    * Chosen to be discriminative function words incl. spaces.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " ist "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los ")
  )

  /** Language-ID: per-language marker-occurrence score; argmax with
    * first-listed-language tie-break (ties resolved in declaration
    * order, so "en" wins all-zero docs). Pure string arithmetic —
    * identical in the DuckDB oracle.
    */
  def langScores(c: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).reduce(_ + _)
    }
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    // fold: keep current winner unless a later language strictly beats it
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Content fingerprint: md5 of case/whitespace-normalized text.
    * DuckDB: md5(regexp_replace(lower(trim(x)), '\s+', ' ', 'g'))
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Lexical diversity: distinct tokens / tokens (repetitive boiler-
    * plate scores low). DuckDB: round(len(list_distinct(toks)) /
    * greatest(len(toks),1), 4)
    */
  def uniqueTokenRatio(toks: Column): Column =
    round(
      size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)

  /** Most-frequent-token share: occurrences of the modal token over
    * all tokens — a high value flags degenerate repetition. Computed
    * as a per-row HOF fold; DuckDB mirror sorts and counts the same
    * way (see OracleSql.q_repetition).
    */
  def topTokenShare(toks: Column): Column = {
    val sorted = sort_array(toks)
    // longest run in the sorted token array == max frequency
    val runs = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    round(runs.cast("double") / greatest(size(toks), lit(1)).cast("double"), 4)
  }
}
