package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty: what fraction of a document's distinct word
  * n-grams appear for the FIRST time in the corpus (first = lowest
  * document id containing the gram)? The curation-side diversity
  * metric — a crawl snapshot whose new documents mostly repeat old
  * grams adds tokens but not information, and per-source novelty is
  * the signal that drives source re-weighting.
  *
  * Scale shape: one native gram-hash pass per document
  * ([[TextHashExpressions.wordGramHashes]] — same expression the
  * decontamination operator uses), one corpus-wide shuffle of skinny
  * `(gram, doc_id)` pairs for the min-doc resolution, one join back
  * on the gram key. The document text never shuffles; fan-in per gram
  * is bounded by document frequency, and the gram key shards evenly
  * (md5). Documents with fewer than `n` tokens carry no grams and are
  * excluded, mirroring the decontamination convention.
  */
object Novelty {

  /** Per-source novelty profile: documents, distinct-gram totals, and
    * the novel fraction (grams first seen in that document).
    */
  def gramNovelty(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    val grams = docs
      .select(col(idCol).as("_id"), col(sourceCol).as("_src"),
        explode(array_distinct(
          TextHashExpressions.wordGramHashes(col(textCol), n))).as("_h"))
    val first = grams.groupBy(col("_h")).agg(min(col("_id")).as("_first"))
    val perDoc = grams
      .join(first, Seq("_h"))
      .groupBy(col("_id"), col("_src"))
      .agg(
        count(lit(1)).as("_n_grams"),
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L)).as("_n_novel"))
    perDoc
      .groupBy(col("_src").as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_n_grams")).as("n_grams"),
        sum(col("_n_novel")).as("n_novel"))
      .withColumn("novel_ratio",
        round(col("n_novel").cast("double") / col("n_grams"), 4))
  }
}
