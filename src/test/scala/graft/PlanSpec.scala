package graft

import graft.queries.{QueryCatalog, Tables}
import graft.tables.{Partition, ParquetTable, PartitioningScheme, ReadArgs}
import graft.core.Filter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Physical-plan assertions backing SURVEY.md §5's scale claims:
  * filters reach the parquet scan, projections prune the read schema,
  * partition filters prune files before reading, small dims broadcast.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and column pruning are pushed into the parquet scan") {
    val df = Tables.table(spark, sf("sf0.001"), "lineitem",
        ReadArgs.where(Filter("l_quantity", "<", 10.0))
          .copy(columns = Some(Seq("l_orderkey", "l_quantity"))))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan(l_quantity,10.0)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"projection not pruned:\n$plan")
  }

  test("hive partition filters prune files before the scan") {
    val base = tempDir("prune").toString
    for (p <- 1 to 4)
      Seq((p, s"v$p")).toDF("v", "payload").coalesce(1)
        .write.mode("overwrite").parquet(s"$base/part=$p")
    val t = new ParquetTable("t", base,
      partitioning = Seq(Partition("part", IntegerType)),
      partitioningScheme = PartitioningScheme.Hive)
    val pruned = t(spark, ReadArgs.where(Filter("part", "=", 3)))
    assert(pruned.inputFiles.length == 1, "expected exactly one partition file after pruning")
    assert(pruned.select("v").as[Int].collect().toSeq == Seq(3))
  }

  test("q05 broadcasts dimension tables") {
    val plan = planOf(QueryCatalog.queries("q05_local_supplier")(spark, sf("sf0.001")))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in q05:\n$plan")
  }

  /** Raw file relations under a broadcast HINT, descending past nodes
    * whose output cardinality does not scale with the input (aggregate
    * / limit / literal relation). An explicit hint is unconditional —
    * unlike the threshold/AQE decision it still fires when the table
    * is 100× bigger — so a hint over an SF-proportional relation is a
    * scale-killer even when today's bench likes it.
    */
  private def hintedRawScans(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leaves(p: LogicalPlan): Seq[String] = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation => Seq.empty
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.getName).toSeq
        case other => Seq(other.toString)
      }
      case other => other.children.flatMap(leaves)
    }
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => leaves(h.child)
    }.flatten
  }

  test("no SF-proportional relation is broadcast-hinted across the headline set") {
    // nation (25 rows) and region (5 rows) are constant-size at every
    // TPC-H scale factor — the only relations a hint may force.
    val fixedSize = Set("nation.parquet", "region.parquet")
    val dir = sf("sf0.001")
    QueryCatalog.entries.filter(_.headline).foreach { e =>
      val offenders = hintedRawScans(e.fn(spark, dir)).filterNot(fixedSize)
      if (e.name == "q_knn_brute")
        // the hinted kNN query set is embeddings under a LITERAL key
        // bound (vec_id < 20): 20 rows at any scale factor — bounded
        assert(offenders.forall(_ == "embeddings.parquet"),
          s"q_knn_brute hints an unexpected relation: $offenders")
      else
        assert(offenders.isEmpty,
          s"${e.name} broadcast-hints SF-proportional relations: $offenders")
    }
  }

  test("q06 stays inside whole-stage codegen") {
    val df = QueryCatalog.queries("q06_forecast_revenue")(spark, sf("sf0.001"))
    val codegen = df.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen subtree"), s"no codegen span in q06:\n$codegen")
    assert(planOf(df).contains("PushedFilters:"), "q06 filters not pushed")
  }

  test("exact dedup hash-aggregates with map-side combine (no sort, one shuffle)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plan = planOf(graft.operators.Dedup.exactByContent(docs, "text", "doc_id"))
    // graft's ExtremumBy is a TypedImperativeAggregate, so the planner
    // uses ObjectHashAggregate with a partial/final pair — no sort,
    // one row per key crossing the single shuffle
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_graft_min_by"), s"expected map-side combine:\n$plan")
    assert(!plan.contains("SortAggregate"), s"should not sort:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1, s"expected exactly one shuffle:\n$plan")
  }

  test("q_topk_window rewrites to the TopK aggregate when the E37 rule is on") {
    val rule = graft.plans.RowNumberTopKRewrite
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      val df = QueryCatalog.queries("q_topk_window")(spark, sf("sf0.001"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_top_k"), s"rewrite did not fire:\n$opt")
      assert(!opt.contains("Window ["), s"window survived the rewrite:\n$opt")
      // InferWindowGroupLimit runs before user rules; leaving its
      // WindowGroupLimit under the heap aggregate would execute BOTH
      // top-k strategies (the r5 bench regression)
      assert(!opt.contains("WindowGroupLimit"),
        s"redundant WindowGroupLimit under the TopK aggregate:\n$opt")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
  }
}
