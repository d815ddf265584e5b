package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Linear text-classifier INFERENCE over hashed n-gram features — the
  * fastText-shaped quality filter (Joulin et al. 2016, "Bag of Tricks
  * for Efficient Text Classification") that LLM curation pipelines
  * run over every crawled document (the GPT-3/CCNet-style "quality
  * classifier" gate). The model is an opaque parameter blob shipped
  * to the operator: a weight per hash bucket plus a bias; scoring is
  * margin = bias + Σ_b w(b)·count(b) over hashed UNIGRAM + BIGRAM
  * features, keep = margin > 0.
  *
  * Engine-exact scoring (house float discipline, SURVEY §4): weights
  * are DECIMAL(9,4) and the margin is an exact decimal sum — no
  * sigmoid, no exp; the sigmoid is monotone in the margin, so
  * thresholding the margin IS thresholding the probability, and the
  * decimal sum is reproducible bit-for-bit in SQL where exp() could
  * differ in the last ulp across libms.
  *
  * Scale shape (same as [[Dsir]]): corpus text never shuffles — one
  * skinny (doc, bucket) explode feeds a (doc,bucket) count shuffle,
  * the K-row weight table joins back as a broadcast, and the rollup
  * shuffles O(docs) skinny rows. The model is K rows at any corpus
  * size.
  */
object Classifier {

  /** Per-document margins: (idCol, margin DECIMAL). Every input doc
    * appears; docs with no features score the bare bias.
    */
  def margins(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[BigDecimal],
      bias: BigDecimal
  ): DataFrame = {
    require(weights.nonEmpty, "empty weight vector")
    val k = weights.size
    val spark = docs.sparkSession
    val wdf = weightFrame(spark, weights)

    val grams = docs
      .where(trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(concat(
          TextHashExpressions.wordGramHashes(col(textCol), 1),
          TextHashExpressions.wordGramHashes(col(textCol), 2))).as("_h"))
      .select(col(idCol), (col("_h") % k).as("_b"))

    val perDoc = grams
      .groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_nb"))
      .join(broadcast(wdf), "_b")
      .groupBy(col(idCol))
      .agg(sum(col("_nb") * col("_w")).as("_m"))

    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("_m"), lit(BigDecimal(0)).cast(DecimalType(19, 4))) +
          lit(bias).cast(DecimalType(9, 4))).as("margin"))
  }

  /** Per-group survival rollup — the operational readout of a quality
    * gate (how much of each source the model keeps):
    * (groupCol, n_docs, n_kept, sum_margin). `sum_margin` is the
    * exact decimal total emitted as a rounded double.
    */
  def keepRates(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      weights: Seq[BigDecimal],
      bias: BigDecimal
  ): DataFrame =
    docs.select(col(idCol), col(groupCol))
      .join(margins(docs, idCol, textCol, weights, bias), idCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("margin") > 0, 1L).otherwise(0L)).as("n_kept"),
        round(sum(col("margin")).cast("double"), 4).as("sum_margin"))
      .orderBy(groupCol)

  private def weightFrame(spark: SparkSession, weights: Seq[BigDecimal]): DataFrame = {
    import spark.implicits._
    weights.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toDF("_b", "_w")
      .select(col("_b"), col("_w").cast(DecimalType(9, 4)).as("_w"))
  }

  /** Per-class evaluation of a prediction column against gold labels
    * — the QA harness a quality classifier ships with (precision /
    * recall / F1 per class, computed from the confusion marginals).
    * F1 uses the `2·tp / (n_pred + n_gold)` identity, so every metric
    * is an exact integer ratio — engine-stable under round(4). A
    * class seen only in gold (never predicted) or only in predictions
    * still gets a row, via the full outer join of the marginals.
    *
    * Scale shape: ONE shuffle of (gold, pred) count pairs — the
    * confusion matrix, O(classes²) rows regardless of dataset size;
    * the marginal joins run on that tiny frame.
    */
  def evaluate(df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    // null labels (abstentions / missing gold) are a first-class
    // class: all joins and the agreement test are NULL-SAFE, so one
    // null row comes back instead of two disjoint half-rows
    val pairs = df
      .groupBy(col(goldCol).as("gold"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val gold = pairs.groupBy(col("gold").as("label")).agg(sum("n").as("n_gold"))
    val pred = pairs.groupBy(col("pred").as("label")).agg(sum("n").as("n_pred"))
    val tp = pairs.where(col("gold") <=> col("pred"))
      .select(col("gold").as("label"), col("n").as("tp"))
    gold.as("g")
      .join(pred.as("p"), col("g.label") <=> col("p.label"), "full")
      .select(coalesce(col("g.label"), col("p.label")).as("label"),
        col("n_gold"), col("n_pred"))
      .as("m")
      .join(tp.as("t"), col("m.label") <=> col("t.label"), "left")
      .select(
        col("m.label").as("label"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(
        col("label"), col("n_gold"), col("n_pred"), col("tp"),
        round(col("tp").cast("double") /
          greatest(col("n_pred"), lit(1L)).cast("double"), 4).as("prec"),
        round(col("tp").cast("double") /
          greatest(col("n_gold"), lit(1L)).cast("double"), 4).as("rec"),
        round((col("tp") * 2L).cast("double") /
          greatest(col("n_pred") + col("n_gold"), lit(1L)).cast("double"), 4).as("f1"))
      .orderBy("label")
  }
}
