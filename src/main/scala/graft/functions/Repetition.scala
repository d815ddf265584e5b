package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gopher-style repetition filters (Rae et al. 2021, appendix A1.1 —
  * the duplicate-line / repeated-n-gram rules every curation pipeline
  * runs ahead of training; RefinedWeb/Dolma/FineWeb all replicate
  * them). Distinct from [[Text.uniqueTokenRatio]]/topTokenShare (P20,
  * single-token statistics): these measure LINE- and PHRASE-level
  * repetition, the degenerate-generation / boilerplate signal.
  *
  * Every metric is a per-row expression over the document alone —
  * sort + one linear fold (run-length over the sorted array), never
  * the quadratic distinct x filter shape — so the whole operator is a
  * map-only scan: zero shuffles, embarrassingly parallel at 100 TB.
  *
  * Exact declared semantics (the DuckDB oracle replays them):
  *  - lines = trimmed '\n'-segments, empties dropped.
  *  - dupLineFrac        = (#lines - #distinct lines) / #lines.
  *  - dupLineCharFrac    = sum over distinct lines with count>1 of
  *                         count*len(line), over total line chars.
  *  - word n-grams join n whitespace tokens with ' '; charLen(doc) =
  *    len(tokens joined by ' ') (normalized content length).
  *  - topNgramCharFrac   = maxCount * len(top gram) / charLen; on a
  *    count tie the LONGEST tied gram wins (deterministic).
  *  - dupNgramCharFrac   = sum over distinct grams with count>1 of
  *    count*len(gram), over charLen. Overlapping occurrences are
  *    counted as written (no overlap discount) — declared, mirrored.
  * All fractions round(4); empty denominators yield 0.0.
  */
object Repetition {

  /** Gopher table A1 thresholds (shared with the oracle so the
    * flagged-document counts are spliced from one source of truth).
    */
  val DupLineFracMax = 0.30
  val DupLineCharFracMax = 0.20
  val TopNgramCharFracMax = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramCharFracMax = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
    8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Trimmed non-empty lines of a document. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Word n-grams as space-joined strings (empty array when the
    * document has fewer than n tokens).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Run-length statistics of a SORTED string array in one fold:
    * struct(dup_chars: total chars of members whose value occurs >1
    * time, top_cnt: max occurrence count, top_len: longest member
    * achieving top_cnt). Sorting groups equal values, so a linear
    * scan tracking the current run recovers exact per-value counts.
    */
  private[functions] def runStats(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup"),
        lit(0L).as("cnt"), lit(0L).as("len")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(1L)
        val tl = length(t).cast(LongType)
        // a run reaching 2 retro-charges the first copy; >2 adds one
        val dup = acc.getField("dup") +
          when(run === 2L, tl * 2L).when(run > 2L, tl).otherwise(0L)
        val cnt = greatest(acc.getField("cnt"), run)
        val len = when(run > acc.getField("cnt"), tl)
          .when(run === acc.getField("cnt"), greatest(acc.getField("len"), tl))
          .otherwise(acc.getField("len"))
        struct(t.as("prev"), run.as("run"), dup.as("dup"),
          cnt.as("cnt"), len.as("len"))
      },
      acc => struct(acc.getField("dup").as("dup"),
        acc.getField("cnt").as("cnt"), acc.getField("len").as("len")))

  /** Remove repeated lines, keeping each distinct line's FIRST
    * occurrence in document order (the RefinedWeb/CCNet line-dedup
    * transform that strips nav bars and boilerplate rather than
    * dropping the whole document). Lines are trimmed and empties
    * dropped (same normalization as the metrics above — declared);
    * Spark's `array_distinct` preserves first-occurrence order, so
    * this is one per-row expression, map-only at any scale.
    */
  def dropRepeatedLines(text: Column): Column =
    array_join(array_distinct(lines(text)), "\n")

  /** Fraction of lines that duplicate an earlier line. */
  def dupLineFrac(text: Column): Column = {
    val ls = lines(text)
    round(
      (size(ls) - size(array_distinct(ls))).cast("double") /
        greatest(size(ls), lit(1)).cast("double"),
      4)
  }

  /** Fraction of line characters inside duplicated lines (all copies
    * counted).
    */
  def dupLineCharFrac(text: Column): Column = {
    val ls = lines(text)
    val dup = runStats(sort_array(ls)).getField("dup")
    val tot = aggregate(ls, lit(0L), (a, l) => a + length(l).cast(LongType))
    round(dup.cast("double") / greatest(tot, lit(1L)).cast("double"), 4)
  }

  /** Normalized content length: tokens re-joined by single spaces. */
  def charLen(toks: Column): Column = length(array_join(toks, " ")).cast(LongType)

  /** Fraction of content characters covered by the most frequent word
    * n-gram (count x gram length; longest gram wins count ties).
    */
  def topNgramCharFrac(toks: Column, n: Int): Column = {
    val st = runStats(sort_array(ngrams(toks, n)))
    round(
      (st.getField("cnt") * st.getField("len")).cast("double") /
        greatest(charLen(toks), lit(1L)).cast("double"),
      4)
  }

  /** Fraction of content characters inside duplicated word n-grams
    * (all copies counted, overlaps as written).
    */
  def dupNgramCharFrac(toks: Column, n: Int): Column = {
    val st = runStats(sort_array(ngrams(toks, n)))
    round(
      st.getField("dup").cast("double") /
        greatest(charLen(toks), lit(1L)).cast("double"),
      4)
  }
}
