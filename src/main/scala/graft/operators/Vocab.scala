package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary construction — the word-level counterpart of the
  * BPE learner (functions/Bpe.scala): tokenize, count corpus-wide,
  * apply a min-frequency floor, assign dense ranked ids.
  *
  * Scale shape (100 TB): the only corpus-sized operation is the
  * token-count aggregation — a single hash shuffle with map-side
  * partial counts, exactly like a word-count. The ranking window runs
  * over the *post-min-count vocabulary*, which is bounded by the
  * language (≤ a few hundred thousand rows regardless of corpus
  * size), so the single-partition row_number sort is a deliberate,
  * documented small-data step — the same reasoning the BPE learner
  * uses for its driver-side handoff.
  */
object Vocab {

  /** Build a ranked vocabulary from a text column.
    *
    * @param minCount  frequency floor; tokens below it are dropped
    * @return (token, freq, vocab_id) — vocab_id is 1-based rank by
    *         (freq desc, token asc), a total order so ids are
    *         deterministic across runs and engines.
    */
  def build(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    rankIds(tokenCounts(df, col(textCol)).where(col("freq") >= minCount))

  /** Corpus-wide token frequencies (lowered word tokens, empties
    * dropped). One hash shuffle, partial aggregation on the map side.
    */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(Text.wordTokens(text)).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Dense 1-based ids by (freq desc, token asc). Runs on the bounded
    * vocabulary only — never on corpus-sized data.
    */
  def rankIds(vocab: DataFrame): DataFrame =
    vocab.withColumn("vocab_id",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long"))

  /** Encode a text column to vocab ids (out-of-vocab tokens dropped),
    * via a broadcast map join kept as an array lookup — scan-only on
    * the corpus side.
    */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val vmap = map_from_entries(collect_list(struct(col("token"), col("vocab_id"))))
    val lookup = vocab.agg(vmap.as("vmap"))
    df.crossJoin(broadcast(lookup))
      .withColumn("token_ids",
        filter(
          transform(Text.wordTokens(col(textCol)), t => element_at(col("vmap"), t)),
          id => id.isNotNull))
      .drop("vmap")
  }
}
