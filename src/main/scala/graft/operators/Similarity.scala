package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding
  * column (`array<float>`).
  *
  * Scale shape: the *query* side is the small side and is broadcast;
  * the corpus is scanned exactly once per search. Brute force is the
  * correctness baseline (and the oracle); IVF buckets the corpus by
  * nearest deterministic seed centroid so a search shuffles only by
  * centroid id and scans a single bucket per query. Similarities are
  * rounded before ranking with an id tie-break, making rankings
  * engine-stable.
  */
object Similarity {

  /** Exact top-k cosine neighbors of each query vector.
    * One broadcast-nested-loop over the corpus + a per-query window
    * rank; no corpus self-join.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = q
      .crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Vectors.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic IVF "index": seed centroids are corpus vectors with
    * id % stride == 0; every vector is assigned to its nearest
    * centroid (rounded L2, id tie-break). Returns the corpus with an
    * extra `centroid_id` column. Assignment = one broadcast join +
    * one window argmin per row; at scale the assignment is written
    * out partitioned by centroid_id so searches are pruned scans.
    */
  def ivfAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Int
  ): DataFrame = {
    val cents = broadcast(
      corpus
        .where(col(idCol) % stride === 0)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("_cent")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_d2").asc, col("centroid_id"))
    corpus
      .crossJoin(cents)
      .withColumn("_d2", Vectors.l2sq(col(vecCol), col("_cent")))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_cent", "_d2", "_rn")
  }

  /** IVF search: queries are assigned to their centroid, then ranked
    * only against corpus vectors in the same bucket.
    */
  def ivfTopK(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: DataFrame,
      k: Int
  ): DataFrame = {
    val queries = broadcast(
      assigned
        .join(queryIds, Seq(idCol), "left_semi")
        .select(col(idCol).as("query_id"), col(vecCol).as("_qv"), col("centroid_id")))
    val scored = queries
      .join(
        assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), col("centroid_id")),
        Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Vectors.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }
}
