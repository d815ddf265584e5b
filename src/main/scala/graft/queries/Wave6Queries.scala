package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 additions: product-quantized ANN (memory-bound search over
  * code arrays instead of float vectors), multi-pattern blocklist
  * matching (one Aho-Corasick text pass instead of P substring
  * scans), cross-corpus fuzzy decontamination (MinHash-LSH band join
  * between corpus and benchmark probes), and the Iceberg incremental
  * snapshot-diff read — each oracle-checked against DuckDB.
  */
object Wave6Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  // ---------- P52: product-quantization ANN ----------

  /** Shared with the dynamic oracle (OracleSql.pqAnnSql), which
    * re-fits the SAME deterministic model and splices codebooks +
    * query LUTs as literals.
    */
  object PqParams {
    val Dims = 64; val M = 4; val Ksub = 8; val MaxIter = 2
    val QueryBound = 5; val TopK = 3
  }

  /** PQ-ADC top-k: train 4 subspace codebooks, encode the corpus to
    * 4 small codes per vector (scan-only), then rank every corpus row
    * against 5 query vectors by table-lookup distance — the float
    * vectors are never read at query time. See [[graft.operators.Pq]].
    */
  def qPqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    import PqParams._
    val emb = t(s, dir, "embeddings")
    val model = Pq.fit(emb, "vec_id", "embedding", Dims, M, Ksub, MaxIter)
    val encoded = Pq.encode(emb, "embedding", model)
    val queries = Pq.collectQueries(emb, "vec_id", "embedding", QueryBound)
    Pq.adcTopK(encoded, "vec_id", "pq_codes", model, queries, TopK)
      .orderBy("query_id", "rank")
  }
}
