package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedy
  * diverse top-k selection over an embedding column — the standard
  * primitive for building eval sets / few-shot pools that are
  * relevant to a query but not near-duplicates of each other.
  *
  * Greedy loop: each of the k steps picks
  * `argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`.
  * Spark shape: relevance is ONE cosine scan (cached); each step is
  * one distributed argmax (`orderBy.limit(1)`) where the selected
  * set rides along as ≤k literal vectors (`greatest` of rounded
  * cosines) — no shuffle of the corpus, k small jobs total. At
  * 100 TB the corpus feeds through an IVF/LSH prefilter first (the
  * candidate pool, not the corpus, is what MMR scans).
  *
  * Determinism: relevance and pairwise similarities are rounded to
  * the 1e-4 grid BEFORE the score arithmetic (identical doubles in
  * any engine), and score ties break on id — so the selection
  * sequence is engine- and partitioning-exact, which is what lets
  * the DuckDB oracle unroll the same k steps in SQL and hash-match.
  */
object Mmr {

  /** Selected rows in pick order: (rank 1..k, id, rel, maxSim). */
  def select(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      lambdaRel: Double
  ): Seq[(Long, Long, Double, Double)] = {
    val qLit = array(query.toSeq.map(lit): _*)
    val withRel = df
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        round(VectorExpressions.cosine(col(vecCol), qLit), 4).as("_rel"))
      .cache()
    try {
      val picked = scala.collection.mutable.Buffer.empty[(Long, Long, Double, Double)]
      val selectedVecs = scala.collection.mutable.Buffer.empty[Array[Double]]
      var rank = 1
      while (rank <= k) {
        val sims = selectedVecs.toSeq.map(s =>
          round(VectorExpressions.cosine(col("_v"), array(s.toSeq.map(lit): _*)), 4))
        val maxSim = sims match {
          case Seq()  => lit(0.0)
          case Seq(x) => x
          case many   => greatest(many: _*)
        }
        val score = lit(lambdaRel) * col("_rel") - lit(1.0 - lambdaRel) * col("_maxsim")
        val best = withRel
          .where(!col("_id").isInCollection(picked.map(_._2)))
          .withColumn("_maxsim", maxSim)
          .withColumn("_score", score)
          .orderBy(col("_score").desc, col("_id"))
          .limit(1)
          .select(col("_id"), col("_v"), col("_rel"), col("_maxsim"))
          .collect()
        require(best.nonEmpty, s"MMR ran out of candidates at rank $rank")
        val r = best(0)
        picked += ((rank.toLong, r.getLong(0), r.getDouble(2), r.getDouble(3)))
        selectedVecs += (r.get(1) match {
          case s: scala.collection.Seq[_] => s.map {
            case f: Float  => f.toDouble
            case d: Double => d
          }.toArray
          case other => throw new IllegalStateException(s"unexpected vector repr: $other")
        })
        rank += 1
      }
      picked.toSeq
    } finally { withRel.unpersist(); () }
  }
}
