package graft.queries

import graft.core.{Filter, Filters}
import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 query additions: Delta-format reads (log replay, file
  * skipping, time travel) proven against DuckDB oracles over the
  * source parquet.
  */
object Wave3Queries {

  private def t(s: SparkSession, dir: String, name: String) = Tables.table(s, dir, name)

  /** One delta table per (JVM, sf dir): nation appended partitioned by
    * n_regionkey, then region 0 deleted at the format level (file
    * rewrite + remove/add commit). Both delta queries read this build,
    * so Verify builds it once.
    */
  private val builtTables = scala.collection.concurrent.TrieMap.empty[String, String]

  private def nationDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_delta_nation").toString + "/nation"
      val nation = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      DeltaWrite.append(s, nation, path, partitionBy = Seq("n_regionkey"))
      DeltaWrite.deleteWhere(s, path, Filters.normalize(Seq(Filter("n_regionkey", "=", 0))))
      path
    })

  /** Delta read after a format-level DELETE: replay add/remove, prune
    * partitions (n_regionkey) and skip files on stats (n_nationkey).
    */
  def qDeltaRead(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("nation_delta", nationDelta(s, dir))
    table(s, ReadArgs(
      filters = Filters.normalize(Seq(Filter("n_nationkey", ">=", 5))),
      columns = Some(Seq("n_nationkey", "n_name", "n_regionkey"))))
      .orderBy("n_nationkey")
  }

  /** Merge-on-read DELETE via deletion vectors: customer appended
    * partitioned by c_mktsegment, then `DELETE WHERE c_acctbal < 0`
    * written as row-index bitmaps (no file rewritten). The read
    * composes partition pruning with the DV scan-time anti-filter.
    */
  def qDeltaDv(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("customer_dv", customerDvDelta(s, dir))
    table(s, ReadArgs(
      filters = Filters.normalize(Seq(Filter("c_mktsegment", "=", "BUILDING"))),
      columns = Some(Seq("c_custkey", "c_name", "c_acctbal"))))
      .orderBy("c_custkey")
  }

  private def customerDvDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir + "#dv", {
      val path = java.nio.file.Files.createTempDirectory("graft_delta_cust").toString + "/customer"
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      DeltaWrite.append(s, cust, path, partitionBy = Seq("c_mktsegment"))
      DeltaWrite.deleteWhereDv(s, path, Filters.normalize(Seq(Filter("c_acctbal", "<", 0.0))))
      path
    })

  /** Change data feed: the per-commit change stream of a table built
    * as append → enable CDF → append → DELETE (cdc files), aggregated
    * per (change_type, commit_version). Inserts derive from add
    * actions; the delete's rows come from its `_change_data` files.
    */
  def qDeltaCdf(s: SparkSession, dir: String): DataFrame =
    graft.tables.DeltaChanges.between(s, ordersCdfDelta(s, dir), 0)
      .groupBy(
        col(graft.tables.DeltaChanges.ChangeTypeCol).as("change_type"),
        col(graft.tables.DeltaChanges.CommitVersionCol).as("commit_version"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_key"))
      .orderBy("commit_version", "change_type")

  private def ordersCdfDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir + "#cdf", {
      val path = java.nio.file.Files.createTempDirectory("graft_delta_cdf").toString + "/orders"
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      DeltaWrite.append(s, orders.where(col("o_orderkey") % 4 =!= 3), path)        // v0
      DeltaWrite.setTableProperties(s, path, Map("delta.enableChangeDataFeed" -> "true")) // v1
      DeltaWrite.append(s, orders.where(col("o_orderkey") % 4 === 3), path)        // v2
      DeltaWrite.deleteWhere(s, path, Filters.normalize(Seq(Filter("o_orderstatus", "=", "F")))) // v3
      // v4 MERGE: keys %100==0 → status 'U' (keys whose rows were
      // deleted at v3 re-enter as inserts); fresh shifted keys insert
      val updates = orders.where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      val inserts = orders.where(col("o_orderkey") % 2000 === 0)
        .select((col("o_orderkey") + 200000000L).as("o_orderkey"),
          lit("I").as("o_orderstatus"))
      DeltaWrite.merge(s, path, updates.unionByName(inserts), Seq("o_orderkey"))
      path
    })

  /** Delta-level MERGE: orders upserted with updates (keys %10==0 get
    * +1000 price) and inserts (fresh keys for %1000==0), then the
    * final state aggregated per status. File pruning bounds the
    * rewrite to files overlapping the source key range.
    */
  def qDeltaMerge(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("orders_merge", ordersMergeDelta(s, dir))
    table(s, ReadArgs())
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        Num.dsum(Num.d4(col("o_totalprice"))).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  private def ordersMergeDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir + "#merge", {
      val path = java.nio.file.Files.createTempDirectory("graft_delta_merge").toString + "/orders"
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      DeltaWrite.append(s, orders, path)
      val updates = orders.where(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val inserts = orders.where(col("o_orderkey") % 1000 === 0)
        .select(
          (col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          col("o_totalprice"))
      DeltaWrite.merge(s, path, updates.unionByName(inserts), Seq("o_orderkey"))
      path
    })

  /** Incremental materialized-view maintenance over the change data
    * feed: a per-status (count, sum) view initialized from the base,
    * then kept current through a DELETE, an UPDATE and an append by
    * ONE refresh that reads only the CDF between the watermark and the
    * head — never the base table. The oracle recomputes the final
    * aggregate from scratch, so a hash match proves the signed-delta
    * algebra (including the fully-deleted 'F' key leaving the view).
    */
  def qIncrView(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("orders_view", ordersViewDelta(s, dir))
    table(s, ReadArgs())
      .select(col("o_orderstatus"), col("n_rows"),
        round(col("sum_price").cast("double"), 4).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  private val ivmKeys = Seq("o_orderstatus")
  private val ivmSums = Seq(("price", "sum_price"))

  private def ordersViewDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir + "#ivm", {
      val tmp = java.nio.file.Files.createTempDirectory("graft_delta_ivm").toString
      val base = tmp + "/base"
      val view = tmp + "/view"
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          Num.d4(col("o_totalprice")).as("price"))
      graft.tables.DeltaDdl.createTable(s, base, orders.schema,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))   // v0
      DeltaWrite.append(s, orders, base)                                // v1
      graft.operators.IncrementalView.initialize(s, base, view, ivmKeys, ivmSums)
      DeltaWrite.deleteWhere(s, base,
        Filters.normalize(Seq(Filter("o_orderstatus", "=", "F"))))      // v2
      DeltaWrite.updateWhere(s, base,
        Filters.normalize(Seq(Filter("o_orderstatus", "=", "O"))),
        Seq("price" -> "CAST(price + 10 AS DECIMAL(12,4))"))            // v3
      DeltaWrite.append(s,
        orders.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_orderstatus", lit("N")), base)                 // v4
      graft.operators.IncrementalView.refresh(s, base, view, ivmKeys, ivmSums)
      view
    })

  /** Time travel: version 0 predates the DELETE and sees full nation. */
  def qDeltaTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("nation_delta", nationDelta(s, dir))
    table(s, ReadArgs(
      columns = Some(Seq("n_nationkey", "n_name", "n_regionkey")),
      extra = Map(table.VersionKey -> 0L)))
      .orderBy("n_nationkey")
  }

  /** BPE tokenization with a merge table learned from the corpus
    * itself (distinct-word frequency table, deterministic tie-breaks).
    * Oracled via a dynamic recursive-CTE DuckDB query
    * (OracleSql.bpeTokensSql) that replays the learned merges in rank
    * order — equivalent to the engine's greedy lowest-rank-first loop
    * because learned merge tables satisfy components-before-compounds.
    * The learner is additionally verified against a driver-side
    * reference implementation in BpeSpec.
    */
  def qBpeTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val merges = graft.functions.Bpe.learn(docs, "text", numMerges = 20)
    docs
      .select(col("source"),
        graft.functions.Bpe.tokenCount(col("text"), merges).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("source")
      .agg(
        sum(col("n_tok")).as("total_tokens"),
        round(sum(col("n_chars")).cast("double") / sum(col("n_tok")), 4)
          .as("chars_per_token"))
      .orderBy("source")
  }

  /** Shared q_ann_kmeans constants — the dynamic oracle
    * (OracleSql.dynamic) learns centroids with the same parameters and
    * splices them into the DuckDB SQL as a literal matrix.
    */
  object Ann {
    val K = 8
    val MaxIter = 3
    val QueryBound = 10
    val TopK = 3
  }

  /** Learned-index ANN: Lloyd k-means IVF (deterministic farthest-
    * point init, exact-decimal centroid updates) + in-bucket search.
    * Oracle-checked via the DYNAMIC oracle: the learner is
    * deterministic, so its centroids are spliced into the DuckDB SQL
    * as literals and the assignment + top-k verify end to end
    * (invariants additionally asserted in SimilaritySpec).
    */
  def qAnnKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.table(s, dir, "embeddings")
    val assigned = graft.operators.Similarity.kmeansIvfAssign(
      emb, "vec_id", "embedding", k = Ann.K, maxIter = Ann.MaxIter)
    graft.operators.Similarity.ivfTopK(assigned, "vec_id", "embedding",
      queryIds = emb.where(col("vec_id") < Ann.QueryBound).select("vec_id"), k = Ann.TopK)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }
}
