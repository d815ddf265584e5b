package graft.plans

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Shuffle-discipline assertions for the session's dedup additions:
  * the design claim everywhere is "text never shuffles" — corpus
  * bytes stay in scan stages, only skinny hash/position relations
  * ride exchanges. A regression here (e.g. a join reordered to carry
  * the text column through a shuffle) is invisible at sf0.01
  * correctness and fatal at 100 TB.
  */
class Wave7PlanSpec extends SparkSpec {

  private def docs = Tables.table(spark, sf(), "documents")

  /** Column names crossing any shuffle exchange. The frame is BUILT
    * with AQE off: AdaptiveSparkPlanExec hides its inner plan from
    * TreeNode.collect, which would make these assertions vacuously
    * pass on an empty exchange set.
    */
  private def shuffledColumns(mk: => DataFrame): Set[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cols = mk.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s.output.map(_.name)
      }.flatten.toSet
      assert(cols.nonEmpty, "expected the skinny relations to shuffle")
      cols
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("span dedup: the text column never crosses a shuffle") {
    val crossed = shuffledColumns(graft.operators.SpanDedup.removeRepeatedSpans(
      docs.select("doc_id", "text"), "doc_id", "text", 8))
    assert(!crossed.exists(_.contains("text")),
      s"text crossed a shuffle: $crossed")
  }

  test("soft dedup: only the skinny cluster map shuffles, never the corpus text") {
    import graft.operators.NearDup
    val crossed = shuffledColumns {
      val pairs = NearDup.minhashPairs(docs, "doc_id", "text",
        k = 5, numHashes = 8, bands = 2, threshold = 0.5)
      val clusters = NearDup.dupClusters(pairs, "a_id", "b_id")
      NearDup.softDedup(docs.select("doc_id", "text", "source"),
        "doc_id", clusters)
    }
    assert(!crossed.exists(_.contains("text")),
      s"text crossed a shuffle: $crossed")
    NearDup.releaseCaches()
  }

  test("incremental near-dup check: raw text stays out of every exchange") {
    import graft.operators.{IncrementalNearDup, NearDup}
    val dir = tempDir("w7-ndidx").toString + "/index"
    val corpus = docs.select("doc_id", "text").limit(50)
    IncrementalNearDup.appendToIndex(spark, corpus, "doc_id", "text", dir)
    val batch = docs.select("doc_id", "text").where(col("doc_id") < 20)
    // shingle-hash SETS ride the verify joins by design; the raw text
    // column must not
    val crossed = shuffledColumns(
      IncrementalNearDup.check(spark, batch, corpus, "doc_id", "text", dir))
    assert(!crossed.exists(_ == "text"), s"text crossed a shuffle: $crossed")
    NearDup.releaseCaches()
  }
}
