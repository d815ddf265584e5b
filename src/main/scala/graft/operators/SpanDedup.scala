package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style GLOBAL span dedup with document reconstruction (Raffel et
  * al. 2020, §2.2 — "discard all but one of any three-sentence span
  * occurring more than once in the data set"): the corpus is cut into
  * non-overlapping `spanWords`-word spans, every repeated span keeps
  * only its GLOBAL first occurrence (minimum (doc, position), a total
  * order — not an arbitrary survivor), and each document is
  * reassembled from its surviving spans plus its sub-span tail. The
  * output is the corpus with boilerplate/duplicated passages excised
  * IN PLACE — the step between near-dup removal (whole docs) and
  * n-gram decontamination in a curation funnel.
  *
  * Scale shape — text NEVER shuffles: the only shuffled relations are
  * the skinny `(span_hash, doc, pos)` triples (one groupBy for global
  * winners, one groupBy collecting each doc's DROPPED positions — a
  * list bounded by the doc's span count, usually empty), and the
  * reconstruction is a scan-side HOF over a by-id join of the
  * drop-lists back to the corpus. Span identity is the FULL 128-bit
  * md5 hex — a 31-bit reduction would birthday-collide around
  * 50-100k distinct spans and silently excise unrelated text at
  * corpus scale — and md5 is engine-portable, so the whole flow,
  * winner choice included, replays bit-for-bit in the DuckDB oracle.
  *
  * Reconstruction is whitespace-normalizing (tokens rejoin with
  * single spaces) — the usual corpus-prep convention, and the only
  * lossless inverse of whitespace tokenization.
  */
object SpanDedup {

  /** `docs` with `textCol` rewritten to the span-deduplicated text.
    * Schema is otherwise preserved.
    */
  def removeRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanWords: Int
  ): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    val n = spanWords
    val spans = docs.select(
      col(idCol).as("_d"),
      posexplode(TextHashExpressions.wordChunks(col(textCol), n))
        .as(Seq("_pos", "_c")))
      .select(col("_d"), col("_pos"), md5(col("_c")).as("_h"))

    // global first occurrence per span: min (doc, pos) — deterministic
    val winners = spans.groupBy("_h")
      .agg(min(struct(col("_d"), col("_pos"))).as("_w"),
        count(lit(1)).as("_n"))

    // dropped occurrences, collected per doc as a sorted int list
    val drops = spans.join(winners, "_h")
      .where(col("_n") > 1 && struct(col("_d"), col("_pos")) =!= col("_w"))
      .groupBy(col("_d"))
      .agg(sort_array(collect_list(col("_pos"))).as("_drop"))

    rebuildWithoutPositions(docs, idCol, textCol, n, drops)
  }

  /** Contamination SPAN EXCISION (P74): cut each document into the
    * same non-overlapping `spanWords`-word grid and drop every chunk
    * whose text appears ANYWHERE in the probe (benchmark) corpus —
    * the probe side hashes its SLIDING n-grams, so alignment of the
    * copied passage against the grid doesn't matter. The surgical
    * alternative to whole-document decontamination (P24/P42): a long
    * web page quoting one benchmark item loses the quote, not the
    * page. Guarantee (declared): a verbatim benchmark passage of
    * >= 2·spanWords−1 words always covers at least one full grid
    * chunk, so it cannot survive intact. Span identity is the full
    * 128-bit md5 of the chunk text (the P63 discipline — a narrow
    * hash would excise innocent text at corpus scale).
    *
    * Scale shape: the probe span-hash set is BROADCAST (benchmarks
    * are bounded — MMLU-scale, not corpus-scale); corpus text never
    * shuffles — only (doc, pos) pairs of dropped chunks do, and the
    * rebuild is the same scan-side HOF as span dedup.
    */
  def exciseProbeSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      spanWords: Int
  ): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    val n = spanWords
    val probeSpans = probes.select(
      explode(graft.functions.Repetition.ngrams(
        graft.functions.Text.wsTokens(col(probeTextCol)), n)).as("_g"))
      .select(md5(col("_g")).as("_h")).distinct()
    val spans = docs.select(
      col(idCol).as("_d"),
      posexplode(TextHashExpressions.wordChunks(col(textCol), n))
        .as(Seq("_pos", "_c")))
      .select(col("_d"), col("_pos"), md5(col("_c")).as("_h"))
    val drops = spans.join(broadcast(probeSpans), "_h")
      .groupBy(col("_d"))
      .agg(sort_array(collect_list(col("_pos"))).as("_drop"))
    rebuildWithoutPositions(docs, idCol, textCol, n, drops)
  }

  /** Reassemble each document from its surviving grid chunks (+ the
    * sub-span tail); `drops` = (_d, _drop: sorted dropped positions).
    */
  private def rebuildWithoutPositions(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      drops: DataFrame
  ): DataFrame = {
    val chunks = TextHashExpressions.wordChunks(col(textCol), n)
    val tail = TextHashExpressions.wordTail(col(textCol), n)
    val kept = filter(chunks, (_, i) => !array_contains(col("_drop"), i))
    val rebuilt = array_join(
      when(tail === lit(""), kept).otherwise(concat(kept, array(tail))), " ")

    docs.join(drops, docs(idCol) === col("_d"), "left")
      .withColumn(textCol,
        when(col("_drop").isNull, col(textCol)).otherwise(rebuilt))
      .drop("_d", "_drop")
  }
}
