package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph PageRank for corpus curation (domain-authority scoring
  * of the hosts a training corpus cites — the quality prior used by
  * public web-corpus pipelines, e.g. the Common-Crawl-derived
  * datasets' host-level filtering).
  *
  * Runs ENTIRELY in fixed-point integer arithmetic: ranks are longs
  * scaled by [[Base]] (1e-12 units), every division is integral, so
  * results are bit-identical across engines and partitionings — sums
  * of longs are order-independent, unlike float PageRank. This is the
  * "loss" variant (dangling-node mass is dropped, not redistributed),
  * which keeps each iteration one join + one aggregation; rank ORDER
  * is what curation consumes and it is unaffected by the uniform
  * dangling redistribution term.
  *
  * Scale shape: per iteration, one shuffle of `edges` joined with the
  * node-sized `ranks`/`outdeg` frames (both ≪ edges; AQE broadcasts
  * them when small) and one `sum` shuffle carrying ONE row per
  * distinct destination — never materializes anything bigger than the
  * node set. The iteration count is a small constant; a production
  * loop at hundreds of iterations would localCheckpoint the rank
  * frame every ~10 iterations to cap lineage depth.
  */
object GraphRank {

  /** Fixed-point scale: ranks are longs in units of 1/Base. */
  val Base: Long = 1000000000000L

  /** PageRank over `edges` (directed src→dst pairs; duplicates and
    * self-loops dropped). Returns `(node, rank)` with rank in
    * [[Base]]-scaled fixed point; total mass starts at ~Base and only
    * shrinks (dangling loss), so every value stays overflow-safe in
    * the `dampingPct * sum` step (≤ 100·Base ≪ 2^63).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Long = 85L
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 100, "iterations must be in [1, 100]")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct must be in [0, 100]")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      // scanned once per iteration — persist instead of recomputing
      // the upstream edge derivation K times
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // driver scalar: the node COUNT only, O(1) memory
    require(n > 0, "pageRank over an empty edge set")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val teleport = (Base * (100L - dampingPct) / 100L) / n

    var ranks = nodes.withColumn("rank", lit(Base / n))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        // integral division: deterministic, order-independent
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
      val sums = contrib.groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(s, bigint(0))) div 100")).as("rank"))
    }
    ranks
  }

  /** Run to convergence instead of a fixed count: iterate until the
    * largest per-node rank movement is ≤ `tolScaled` ([[Base]]-scaled
    * fixed-point units) or `maxIterations` is hit. Each step
    * `localCheckpoint`s the rank frame, so lineage depth stays O(1)
    * no matter how many iterations run — the shape a hundred-
    * iteration production loop needs (the fixed-K [[pageRank]] keeps
    * pure lazy lineage, which is fine for small K but would blow the
    * optimizer up at depth). The per-step max-delta is one scalar
    * aggregate — O(1) driver memory. Fixed-point arithmetic makes
    * convergence itself deterministic: the same graph always stops
    * after the same number of iterations with bit-identical ranks.
    */
  def pageRankConverged(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIterations: Int = 100,
      tolScaled: Long = 1000000L, // 1e-6 in rank units
      dampingPct: Long = 85L
  ): DataFrame = {
    require(maxIterations >= 1, "maxIterations must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge set")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val teleport = (Base * (100L - dampingPct) / 100L) / n

    var ranks = nodes.withColumn("rank", lit(Base / n)).localCheckpoint()
    var moved = Long.MaxValue
    var iter = 0
    while (iter < maxIterations && moved > tolScaled) {
      val contrib = e
        .join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
      val sums = contrib.groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(s, bigint(0))) div 100")).as("rank"))
        .localCheckpoint() // truncate lineage: O(1) plan depth at any iter count
      moved = next.join(ranks.withColumnRenamed("rank", "prev"), "node")
        .agg(max(abs(col("rank") - col("prev")))).head().getLong(0)
      ranks = next
      iter += 1
    }
    // the result is checkpointed (no lineage into the cached frames),
    // so the iteration caches can be released here — unlike the lazy
    // fixed-K path, whose result still references them
    e.unpersist()
    nodes.unpersist()
    ranks
  }
}
