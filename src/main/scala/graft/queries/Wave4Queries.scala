package graft.queries

import graft.functions.Text
import graft.operators.SubstringDedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Num.{d4, dsum}

/** Round-5 query additions: CUBE grouping sets, value-range window
  * frames, BM25 relevance ranking, a corpus-trained bigram language
  * model, and substring-level duplicate detection.
  *
  * Hash-stability rules are the house rules (SURVEY §4): decimal sums
  * only, per-term rounding before any cross-row sum, log() confined to
  * per-term constants rounded at 6 dp before use, deterministic
  * tie-breaks on every topN.
  */
object Wave4Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  // ---------- E45: CUBE + grouping_id ----------

  /** Full CUBE over (returnflag, linestatus) with the grouping_id
    * bitmask distinguishing aggregation levels — the grouping-sets
    * surface beyond q_rollup's hierarchy.
    */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n_items"),
        dsum(d4(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  // ---------- E46: RANGE-frame window ----------

  /** Trailing-90-day revenue per customer: a value-range frame (RANGE
    * BETWEEN 90 PRECEDING AND CURRENT ROW over epoch days), which
    * unlike ROWS frames is insensitive to intra-day row order — the
    * frame is defined by the order value, so ties cannot make the
    * result nondeterministic.
    */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d")).rangeBetween(-90, 0)
    t(s, dir, "orders")
      .where(col("o_custkey") <= 200)
      .withColumn("d", datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast(LongType))
      .select(
        col("o_orderkey"), col("o_custkey"), col("d"),
        round(sum(d4(col("o_totalprice"))).over(w).cast(DoubleType), 4).as("trailing_sum"),
        count(lit(1)).over(w).as("trailing_n"))
      .orderBy("o_orderkey")
  }

  // ---------- P31: BM25 relevance ranking ----------

  /** BM25 scoring constants, shared verbatim with the oracle SQL. */
  object Bm25 {
    val K1 = 1.2
    val B = 0.75
    val Terms: Seq[String] = Seq("spark", "hash", "window", "stream", "merge")
  }

  /** BM25 top-20 documents for a fixed query-term set. Corpus stats
    * (N, avgdl) ride a broadcast scalar; df comes from the per-term
    * posting counts; idf is rounded at 6 dp before use so the single
    * ln() call per TERM (not per row) cannot destabilize the hash; the
    * per-term contributions are rounded to decimals and decimal-summed
    * (order-independent). Scale shape: one token explode filtered to
    * the query terms (a scan predicate), one skinny groupBy — the
    * whole corpus is never shuffled.
    */
  def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scored(s, dir).orderBy(col("score").desc, col("doc_id")).limit(20)

  /** Every document containing ≥1 query term, BM25-scored (the full
    * ranked list [[qHybridSearch]] fuses).
    */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    // the tokenized frame feeds corpus stats AND the posting lists —
    // persist it so the regex tokenization runs one corpus pass (the
    // per-token explode below is the expensive part of this query)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), Text.wordTokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast(LongType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.NearDup.registerCache(docs)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(Bm25.Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).cast(DoubleType).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("tok"),
        round(log((col("n_docs").cast(DoubleType) - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6).as("idf"))
    val scored = tf
      .join(broadcast(idf), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("tfnorm",
        col("tf") * lit(Bm25.K1 + 1.0) /
          (col("tf") + lit(Bm25.K1) * (lit(1.0 - Bm25.B) + lit(Bm25.B) * col("dl").cast(DoubleType) / col("avgdl"))))
      .withColumn("contrib", round(col("idf") * col("tfnorm"), 6).cast(DecimalType(18, 6)))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")).cast(DoubleType), 4).as("score"),
        count(lit(1)).as("n_terms"))
    scored
  }

  // ---------- P37: hybrid retrieval (RRF fusion) ----------

  /** RRF constants, shared with the oracle. */
  object Rrf { val K = 60; val Probe = 0L; val TopN = 20; val ListN = 100 }

  /** Hybrid search over the corpus: the BM25 lexical ranking (docs
    * holding ≥1 query term) fused with a vector ranking (cosine to
    * the probe embedding, all vectors) by reciprocal rank. Joining
    * the two towers on doc_id = vec_id mirrors a real corpus where
    * both indexes key the same documents.
    */
  def qHybridSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    // each tower contributes its top-ListN only (the real retrieval
    // shape): orderBy+limit is a distributed TakeOrdered, so the
    // corpus is never funneled through a single-partition window —
    // the rank window then runs over ≤ ListN rows
    val wLex = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = bm25Scored(s, dir)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(Rrf.ListN)
      .withColumn("rank", row_number().over(wLex))
      .select("doc_id", "rank")

    val e = t(s, dir, "embeddings")
    val probe = e.where(col("vec_id") === Rrf.Probe)
      .select(col("embedding").as("_probe"))
    val wVec = Window.orderBy(col("sim").desc, col("doc_id"))
    val vec = e.crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        graft.functions.Vectors.cosine(col("embedding"), col("_probe")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id")).limit(Rrf.ListN)
      .withColumn("rank", row_number().over(wVec))
      .select("doc_id", "rank")

    Retrieval.rrfFuse(Seq(lex, vec), "doc_id", "rank", Rrf.K)
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(Rrf.TopN)
  }

  // ---------- P32: bigram language model ----------

  /** Smoothing constant for the bigram LM, shared with the oracle. */
  object Lm { val Alpha = 0.5 }

  /** Corpus-trained bigram language model, add-alpha smoothed, scoring
    * every document: p(w2|w1) = (c(w1 w2)+α) / (c(w1)+α·V). All
    * probabilities are pure IEEE divisions of exact integer counts —
    * no transcendental calls anywhere — rounded per-bigram at 6 dp and
    * decimal-summed, so the result is bit-stable across engines by
    * construction. Per-source aggregate output. Scale shape: the model
    * IS a dataframe (bigram + unigram count tables, shuffled on the
    * token key with map-side partial aggregation); scoring re-joins
    * the corpus bigrams against it on the same key. A 100 TB corpus
    * trains and scores in three shuffles of token-sized rows.
    */
  def qNgramLm(s: SparkSession, dir: String): DataFrame =
    lmScoredBigrams(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(sum(col("p6")).cast(DoubleType) / count(lit(1)), 6).as("avg_p"))
      .orderBy("source")

  /** Per-bigram smoothed probabilities (doc_id, source, p6) — the
    * shared scoring frame behind q_ngram_lm and q_ppl_buckets.
    */
  private[queries] def lmScoredBigrams(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), Text.wordTokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigrams = toks
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr("transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("bg"))
      .select(col("doc_id"), col("source"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCounts = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    bigrams
      .join(bgCounts, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("p",
        (col("c2").cast(DoubleType) + Lm.Alpha) /
          (col("c1").cast(DoubleType) + lit(Lm.Alpha) * col("v").cast(DoubleType)))
      .withColumn("p6", round(col("p"), 6).cast(DecimalType(18, 6)))
      .select(col("doc_id"), col("source"), col("p6"))
  }

  // ---------- P49: perplexity-bucket curation split ----------

  /** CCNet-style quality split: score each document with the corpus
    * bigram LM and cut every source into head/middle/tail terciles.
    * The cut is RANK-based (ntile over a total order: score desc,
    * doc_id tie-break), not percentile-threshold-based — interpolated
    * thresholds can land bit-differently across engines and flip the
    * boundary document, while ntile over an identical total order is
    * engine-exact by construction. Per-document scores divide an
    * exact decimal sum by an exact count, so the order itself is
    * deterministic. Scale shape: adds one doc-keyed hash aggregate
    * and one source-partitioned window to the LM's token-keyed
    * shuffles; nothing corpus-wide materializes on any single node.
    */
  def qPplBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Cross-engine float discipline: the per-doc ORDERING score is a
    // raw (unrounded) double quotient of an exact decimal sum by an
    // exact count — bit-identical in both engines, and ordering needs
    // no rounding. Outputs expose only grid-exact values (decimal
    // sums re-rounded at their own scale, the dsum trick) — an
    // avg-then-round(6) of an arbitrary quotient can land on a
    // half-boundary where Spark (shortest-repr HALF_UP) and DuckDB
    // (true binary value) disagree in the last digit.
    val docScores = lmScoredBigrams(s, dir)
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("p6")).as("sp6"), count(lit(1)).as("nbg"))
      .withColumn("score", col("sp6").cast(DoubleType) / col("nbg"))
    val byScore = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    docScores
      .withColumn("tercile", ntile(3).over(byScore))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("sp6")).cast(DoubleType), 6).as("sum_score"),
        sum(col("nbg")).as("n_bigrams"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("source", "bucket")
  }

  // ---------- R35 proof: shallow clone end-to-end ----------

  private val cloneTables = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One (source, clone) pair per (JVM, sf dir): part appended as a
    * delta table, shallow-cloned, then the CLONE edited — DELETE of
    * p_partkey < 200 (rewrites into the clone against absolute-path
    * source files) and an append of shifted copies of p_partkey >=
    * 1800. The source is untouched throughout.
    */
  private def clonedPart(s: SparkSession, dir: String): String =
    cloneTables.getOrElseUpdate(dir, {
      import graft.core.{Filter, Filters}
      import graft.tables.{DeltaDdl, DeltaWrite}
      val base = java.nio.file.Files.createTempDirectory("graft_delta_clone").toString
      val src = s"$base/part_src"
      val dst = s"$base/part_clone"
      val part = t(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
      DeltaWrite.append(s, part, src)
      DeltaDdl.cloneShallow(s, src, dst)
      DeltaWrite.deleteWhere(s, dst,
        Filters.normalize(Seq(Filter("p_partkey", "<", 200))))
      DeltaWrite.append(s,
        part.where(col("p_partkey") >= 1800)
          .withColumn("p_partkey", col("p_partkey") + 1000000L), dst)
      dst
    })

  /** Read the edited shallow clone: per-brand rollup over rows served
    * from a mix of absolute-path (source-owned) and clone-local files.
    */
  def qDeltaClone(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaTable, ReadArgs}
    val table = new DeltaTable("part_clone", clonedPart(s, dir))
    table(s, ReadArgs())
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("p_partkey")).as("sum_key"),
        dsum(d4(col("p_retailprice"))).as("sum_price"))
      .orderBy("p_brand")
  }

  // ---------- R36 proof: UPDATE ... SET end-to-end ----------

  private val updateTables = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One updated part table per (JVM, sf dir): appended as delta, then
    * UPDATE p_size = p_size + 100, p_retailprice = p_retailprice + 10
    * WHERE p_partkey < 500 — the SET sees the old row; the predicate
    * prunes untouched files by stats.
    */
  private def updatedPart(s: SparkSession, dir: String): String =
    updateTables.getOrElseUpdate(dir, {
      import graft.core.{Filter, Filters}
      import graft.tables.DeltaWrite
      val path = java.nio.file.Files
        .createTempDirectory("graft_delta_update").toString + "/part"
      DeltaWrite.append(s,
        t(s, dir, "part").select("p_partkey", "p_brand", "p_size", "p_retailprice"),
        path)
      DeltaWrite.updateWhere(s, path,
        Filters.normalize(Seq(Filter("p_partkey", "<", 500))),
        Seq("p_size" -> "p_size + 100",
          "p_retailprice" -> "p_retailprice + 10"))
      path
    })

  /** Read the updated table: per-brand rollup whose sums only match if
    * exactly the predicate rows were updated with exactly the SET
    * arithmetic.
    */
  def qDeltaUpdate(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaTable, ReadArgs}
    val table = new DeltaTable("part_updated", updatedPart(s, dir))
    table(s, ReadArgs())
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("p_size").cast(LongType)).as("sum_size"),
        dsum(d4(col("p_retailprice"))).as("sum_price"))
      .orderBy("p_brand")
  }

  // ---------- P34: SemDeDup (semantic embedding dedup) ----------

  /** SemDeDup constants, shared verbatim with the oracle SQL. */
  object Sem { val Stride = 100; val Threshold = 0.38 }

  /** Semantic dedup over the embeddings table: deterministic IVF
    * cluster assignment (modulo-seed centroids — the SQL-expressible
    * oracle form of the index; the learned k-means path plugs into the
    * same pruning step), then within-cluster pairwise cosine with the
    * min-id-survives rule. Output = every vector with its cluster and
    * kept flag, so the oracle checks both the clustering and the
    * pruning decision row-for-row.
    */
  def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val assigned = Similarity.ivfAssign(
      t(s, dir, "embeddings"), "vec_id", "embedding", Sem.Stride)
    Similarity.semDedup(assigned, "vec_id", "embedding", Sem.Threshold)
      .select(col("vec_id"), col("centroid_id"), col("kept"))
      .orderBy("vec_id")
  }

  // ---------- P35: sequence packing (concat-and-chunk) ----------

  /** Tokens per packed training example, shared with the oracle. */
  object Pack { val Budget = 512L }

  /** Packing plan for the documents corpus: per-source token streams
    * ordered by doc_id, cut into 512-token examples. Every document's
    * chunk span is emitted (pure integer window arithmetic → exact
    * hash match), so the oracle checks the entire packing plan, not
    * just counts.
    */
  def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Text.wordTokens(col("text"))).cast(LongType).as("n_tokens"))
    Packing.concatChunks(docs, "source", "doc_id", "n_tokens", Pack.Budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tok_start"),
        col("chunk_first"), col("chunk_last"))
      .orderBy("doc_id")
  }

  // ---------- P41: best-representative dedup ----------

  /** Near-dup dedup keeping the HIGHEST-QUALITY member of every
    * duplicate cluster (longest doc, id tie-break) instead of the
    * arbitrary min-id — what production pipelines actually keep. The
    * connected components come from the same MinHash-LSH pair graph
    * q_dup_clusters verifies; unclustered docs survive as their own
    * representative. One extra bounded shuffle over cluster members.
    */
  def qClusterBest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.NearDup
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
    val pairs = NearDup.minhashPairs(
      t(s, dir, "documents"), "doc_id", "text",
      k = 5, numHashes = 8, bands = 2, threshold = 0.5)
    val clusters = NearDup.dupClusters(pairs, "a_id", "b_id")
      .withColumnRenamed("id", "doc_id")
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cid", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars").cast(LongType)).as("sum_chars"),
        min(col("doc_id")).as("min_id"))
      .orderBy("source")
  }

  // ---------- P40: end-to-end curation pipeline ----------

  /** Curation-capstone constants, shared with the oracle. The gate is
    * a corpus-appropriate subset of the Gopher thresholds (this
    * synthetic corpus never reaches MinStopHits=2, which would zero
    * the funnel and verify nothing).
    */
  object Curate {
    val Rate = 0.5
    val MinWords = 50L; val MinStop = 1L
    val MinAlpha = 0.8; val MinMwl = 3.0; val MaxMwl = 10.0
  }

  /** The whole curation funnel as ONE verified dataflow: Gopher
    * quality gate → exact dedup (min-id survives per content hash) →
    * deterministic Bernoulli sample — the composition a real corpus
    * intake runs, oracle-checked end-to-end so stage interactions
    * (not just stages) are verified. Scale shape: two scans' worth of
    * signal arithmetic, ONE shuffle (the dedup hash), then a pure
    * gate predicate.
    */
  def qCuration(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.QualityRules
    import graft.operators.Sampling
    val signals = t(s, dir, "documents")
      .withColumn("toks", Text.wsTokens(col("text")))
      .withColumn("wtoks", Text.wordTokens(col("text")))
      .withColumn("ls", QualityRules.lines(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mwl", Text.meanTokenLenOf(col("toks")))
      .withColumn("symr", QualityRules.symbolRatio(col("text"), col("toks")))
      .withColumn("bulr", QualityRules.bulletRatio(col("ls")))
      .withColumn("ellr", QualityRules.ellipsisRatio(col("ls")))
      .withColumn("alpr", QualityRules.alphaRatio(col("toks")))
      .withColumn("stoph", QualityRules.stopHits(col("wtoks")))
    val kept = signals
      .where(col("n_words") >= Curate.MinWords && col("stoph") >= Curate.MinStop &&
        col("alpr") >= Curate.MinAlpha &&
        col("mwl") >= Curate.MinMwl && col("mwl") <= Curate.MaxMwl)
      .select(col("doc_id"), col("source"), col("text"), col("n_words"))
      .withColumn("h", md5(col("text")))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .where(Sampling.sampledBy(col("doc_id"), Curate.Rate, salt = "curate"))
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_words")).as("sum_words"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("source")
  }

  // ---------- P39: sliding-window chunking (overlap) ----------

  /** Chunking constants, shared with the oracle. */
  object Chunk { val Size = 200; val Stride = 150 }

  /** Overlapping character chunks (RAG / embedding-index
    * segmentation) over the corpus: per source, how many chunks the
    * documents cut into and how many are distinct across the corpus
    * (overlap + boilerplate make repeated chunks — the quantity an
    * index deduplicates). Chunk content is md5-digested, so the hash
    * match verifies every chunk boundary byte-for-byte.
    */
  def qChunks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(Text.slidingChunks(col("text"), Chunk.Size, Chunk.Stride)).as("chunk"))
      .select(col("source"), md5(col("chunk")).as("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct_chunks"))
      .orderBy("source")

  // ---------- P38 proof: shard assignment profile ----------

  /** Shard-export constants, shared with the oracle. */
  object Shards { val N = 8 }

  /** Per-shard profile of the documents corpus under the shard
    * assignment [[graft.sinks.Sinks.writeShuffledShards]] writes:
    * counts, bytes, and source coverage — the oracle reproducing the
    * exact assignment proves the exported layout is engine-portable
    * (a loader in any stack can recompute which shard holds a row).
    */
  def qShardStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("shard", graft.sinks.Sinks.shardOf(col("doc_id"), Shards.N))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast(LongType)).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("shard")

  // ---------- P36: quality-weighted sampling ----------

  /** Weighted-sampling constants, shared with the oracle. */
  object WSample { val Rate = 0.5; val CharNorm = 2000.0 }

  /** Quality-weighted Bernoulli sample: keep probability scales with
    * document length (min(1, n_chars/2000) — a stand-in for any
    * engine-stable quality score), gated by the same portable md5
    * bucket the uniform sampler uses. Summary per source over the
    * kept set; exact integers only.
    */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = t(s, dir, "documents")
    docs
      .where(Sampling.weightedSample(
        col("doc_id"),
        least(lit(1.0), col("n_chars").cast(DoubleType) / lit(WSample.CharNorm)),
        WSample.Rate))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast(LongType)).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("source")
  }

  // ---------- P33: substring-level dedup ----------

  /** Gram length for substring dedup, shared with the oracle. */
  object Substr { val K = 20 }

  /** Per-source substring-duplication profile: of all character
    * 20-gram positions, how many carry a gram occurring in ≥2 distinct
    * documents (recurring spans — boilerplate, templates, copies).
    */
  def qSubstrDedup(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.gramDupStats(
      t(s, dir, "documents"), "doc_id", "text", "source", Substr.K)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_dup_pos")).as("n_dup_pos"))
      .orderBy("source")

  // ---------- P42: int8 embedding quantization ----------

  /** Per-vector symmetric int8 quantization profile (scan-only, one
    * pass; floor arithmetic so every column is engine-exact).
    */
  def qVecQuant(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantize.int8Summary(
      t(s, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  // ---------- P43: n-gram novelty ----------

  /** Gram width for the novelty metric, shared with the oracle. */
  object Novel { val N = 5 }

  /** Per-source first-seen gram fraction (corpus diversity metric):
    * native gram-hash pass, one skinny (gram, doc) shuffle, join back.
    */
  def qGramNovelty(s: SparkSession, dir: String): DataFrame =
    graft.operators.Novelty.gramNovelty(
      t(s, dir, "documents"), "doc_id", "source", "text", Novel.N)
      .orderBy("source")
}
