package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style data selection via hashed n-gram importance weights
  * (Data Selection for Language Models via Importance Resampling,
  * Xie et al. 2023 — public method): score every raw document by how
  * much its hashed-bigram profile looks like a TARGET slice of the
  * corpus, then keep the top-N. The standard pretraining-curation
  * move for "more data like this" without a trained classifier.
  *
  * Engine-exact scoring (the house float discipline, SURVEY §4): the
  * paper's log-likelihood-ratio weight is replaced by a log-free
  * ratio sum — each bucket's Laplace-smoothed target/raw probability
  * RATIO is rounded to the 1e-6 grid and fixed as DECIMAL(18,6), and
  * a document's score is the exact decimal sum of (bucket count ×
  * bucket ratio). Monotone in "target-likeness" per bucket, exact
  * under any partitioning or evaluation order, and reproducible in
  * SQL by any engine — where ln() could differ in the last ulp
  * between libms and flip a rank.
  *
  * Scale shape: the corpus text never shuffles. One skinny
  * (doc_id, bucket) explode feeds BOTH aggregations — the K-row
  * model (one groupBy(bucket) shuffle) and the per-doc profile (one
  * groupBy(doc_id, bucket) shuffle); the model joins back as a
  * broadcast (K rows), and selection is a distributed
  * sort-limit (TakeOrdered), never a global window. The only driver
  * data is the 2-long totals row.
  */
object Dsir {

  /** Per-document importance scores: (idCol, dsir_score DECIMAL).
    * Documents with fewer than 2 tokens have no bigrams and are
    * absent (no evidence, no score) — callers selecting top-N never
    * want them anyway.
    *
    * `buckets` trades collision bias for model size (the paper uses
    * hashed features for exactly this boundedness; K rows is the
    * whole model at any corpus size).
    */
  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val k = buckets
    // The skinny explode feeds THREE jobs (model, totals, per-doc
    // profile) — persist it so the dominant cost (corpus text scan +
    // md5 per bigram) is paid once, not per job. Registered with the
    // NearDup cache registry so long sessions stay bounded.
    val grams = NearDup.registerCache(docs.select(
      col(idCol),
      isTarget.as("_t"),
      explode(TextHashExpressions.wordGramHashes(col(textCol), 2)).as("_h"))
      .select(col(idCol), col("_t"), (col("_h") % k).as("_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val model = grams.groupBy("_b").agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("_ct"),
      sum(when(col("_t"), 0L).otherwise(1L)).as("_cr"))

    // totals: one row off a K-row frame — bounded driver data
    val tot = model.agg(
      sum(col("_ct")).as("nt"), sum(col("_cr")).as("nr")).head()
    val nt = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val nr = if (tot.isNullAt(1)) 0L else tot.getLong(1)

    // Laplace-smoothed ratio λt/λr = ((ct+1)·(Nr+K)) / ((cr+1)·(Nt+K)),
    // written as the identical double expression the SQL oracle uses,
    // rounded to the 1e-6 grid BEFORE any further arithmetic
    val lr6 = round(
      (col("_ct").cast("double") + 1.0d) * lit((nr + k).toDouble) /
        ((col("_cr").cast("double") + 1.0d) * lit((nt + k).toDouble)), 6)
      .cast(DecimalType(18, 6)).as("_lr6")

    grams.groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_nb"))
      .join(broadcast(model.select(col("_b"), lr6)), "_b")
      .groupBy(col(idCol))
      .agg(sum(col("_nb") * col("_lr6")).as("dsir_score"))
  }

  /** Top-N most target-like documents:
    * (rank, idCol, dsir_score DOUBLE rounded 6dp), rank 1 = best,
    * ties broken by id. Ranking happens on the EXACT decimal score;
    * the double appears only in the output.
    */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int,
      topN: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = scores(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(topN)
    top.withColumn("rank",
      row_number().over(
        Window.orderBy(col("dsir_score").desc, col(idCol))).cast("int"))
      .select(col("rank"), col(idCol),
        round(col("dsir_score").cast("double"), 6).as("dsir_score"))
  }
}
