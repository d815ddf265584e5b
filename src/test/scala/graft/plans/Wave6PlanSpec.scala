package graft.plans

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-discipline assertions for the round-7 operators: the scan
  * stages must stay scan-only (zero exchanges) and the rollups must
  * shuffle exactly as designed — regressions here are the silent
  * scale-killers the bench at sf0.1 can't see.
  */
class Wave6PlanSpec extends SparkSpec {

  /** Shuffle exchanges in the (pre-AQE) physical plan — broadcast
    * exchanges are deliberately NOT counted.
    */
  private def shuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).length
  }

  private def emb = Tables.table(spark, sf(), "embeddings")
  private def docs = Tables.table(spark, sf(), "documents")

  test("PQ encode is pure scan work — zero exchanges") {
    val model = graft.operators.Pq.fit(emb, "vec_id", "embedding", 64, 4, 4, maxIter = 1)
    assert(shuffles(graft.operators.Pq.encode(emb, "embedding", model)) == 0)
  }

  test("blocklist counting is scan-only; the per-source rollup adds one hash shuffle") {
    import graft.queries.Wave6Queries.BlocklistParams
    val counts = docs.select(
      graft.functions.AhoCorasick.countMatches(col("text"), BlocklistParams.Patterns))
    assert(shuffles(counts) == 0)
    val rollup = docs
      .select(col("source"),
        graft.functions.AhoCorasick.countMatches(col("text"), BlocklistParams.Patterns).as("_c"))
      .groupBy("source").agg(sum(aggregate(col("_c"), lit(0), (a, x) => a + x)).as("h"))
    assert(shuffles(rollup) == 1)
  }

  test("temperature sample plans one window shuffle over the corpus") {
    val sampled = graft.operators.Mixing.temperatureSample(
      docs, "doc_id", "source", 2.0, 0.2)
    assert(shuffles(sampled) == 1)
  }

  test("ADC ranking plans one window shuffle and no joins") {
    val model = graft.operators.Pq.fit(emb, "vec_id", "embedding", 64, 4, 4, maxIter = 1)
    val encoded = graft.operators.Pq.encode(emb, "embedding", model)
    val queries = graft.operators.Pq.collectQueries(emb, "vec_id", "embedding", 3L)
    val ranked = graft.operators.Pq.adcTopK(encoded, "vec_id", "pq_codes", model, queries, 3)
    assert(shuffles(ranked) == 1)
    assert(!ranked.queryExecution.executedPlan.toString.contains("Join"))
  }
}
