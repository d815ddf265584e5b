package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance selection: the hashed-bigram ratio-sum score must
  * rank target-like text above dissimilar text, skip bigram-less
  * docs, and be exactly partitioning-invariant (decimal arithmetic —
  * no float drift under any split).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like raw documents outrank dissimilar ones; no-bigram docs absent") {
    val docs = Seq(
      (1L, "apple banana apple banana cherry", true),
      (2L, "apple banana cherry apple banana", true),
      (10L, "apple banana apple cherry banana", false), // target-like
      (11L, "dog cat mouse dog cat mouse", false),      // dissimilar
      (12L, "solo", false)                              // 1 token: no bigrams
    ).toDF("doc_id", "text", "tgt")
    val s = Dsir.scores(docs, "doc_id", "text", col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(s.contains(10L) && s.contains(11L))
    assert(!s.contains(12L), "a doc without bigrams has no evidence, no score")
    assert(s(10L).compareTo(s(11L)) > 0,
      s"target-like doc must outscore dissimilar: ${s(10L)} vs ${s(11L)}")
  }

  test("selection is partitioning-invariant, ranked 1..N, ties broken by id") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.select(d, "doc_id", "text",
        col("source").isin("src0", "src1"), buckets = 256, topN = 20)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b, "score and rank must not depend on partitioning")
    assert(a.map(_._1) == (1 to 20), "ranks are dense 1..N")
    assert(a.map(_._3).distinct.size > 1, "scores vary across the corpus")
  }
}
