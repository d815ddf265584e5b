package graft.plans

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle-discipline proofs for the Gopher repetition surface: every
  * metric is a per-row expression, so document text must be consumed
  * entirely MAP-SIDE — only the skinny per-source / per-user rollup
  * rows ride an exchange. A regression (metrics computed after the
  * shuffle) would move the corpus bytes through the wire: invisible
  * at sf0.01, fatal at 100 TB.
  */
class RepetitionPlanSpec extends SparkSpec {

  /** (exchange count, columns crossing any exchange), built with AQE
    * off — AdaptiveSparkPlanExec hides its inner plan from collect.
    */
  private def shuffles(mk: => DataFrame): (Int, Set[String]) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ex = mk.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s.output.map(_.name).toSet
      }
      (ex.size, ex.flatten.toSet)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_gopher_rep: metrics map-side; only the skinny rollup rows shuffle") {
    // exchange 1: per-source hash rollup of (source, 5 doubles, flag);
    // exchange 2: the deterministic result sort. Text never crosses.
    val (n, crossed) = shuffles(PipelineQueries.qGopherRep(spark, sf()))
    assert(n == 2, s"expected rollup + result-sort exchanges, got $n")
    assert(!crossed.exists(c => c.contains("text") || c.contains("toks")),
      s"document bytes crossed a shuffle: $crossed")
  }

  test("q_line_dedup: one grouping exchange; dedup is a per-row expression after it") {
    // events group once by user (the rebuilt document and its dedup
    // are expressions on the grouped row), plus the result sort
    val (n, _) = shuffles(PipelineQueries.qLineDedup(spark, sf()))
    assert(n == 2, s"expected the per-user exchange + result sort, got $n")
  }
}
