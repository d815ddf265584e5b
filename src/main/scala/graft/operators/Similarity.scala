package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  ): DataFrame =
    rankedBySimilarity(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")),
      broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))),
      keep = col("query_id") =!= col("neighbor_id"),
      leftId = "query_id", rightId = "neighbor_id", k = k)

  /** One ranking core for every exact-similarity miner (nearest
    * neighbors, hard negatives): rounded cosine over `_qv`/`_cv`,
    * rank by sim desc with right-id tie-break — the oracle-replayed
    * convention lives in exactly one place.
    */
  private def rankedBySimilarity(
      right: DataFrame,
      leftBroadcast: DataFrame,
      keep: Column,
      leftId: String,
      rightId: String,
      k: Int
  ): DataFrame = {
    val scored = leftBroadcast
      .crossJoin(right)
      .where(keep)
      .withColumn("sim", Vectors.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(leftId).orderBy(col("sim").desc, col(rightId))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(leftId, rightId, "sim", "rank")
  }

  /** Hard-negative mining for contrastive / embedding training
    * (triplet & InfoNCE training data): for each anchor, the top-k
    * most SIMILAR corpus vectors carrying a DIFFERENT label — the
    * near-misses that actually move a metric-learning loss, vs the
    * easy random negatives that contribute ~zero gradient. Exact
    * brute-force over a bounded anchor set (the oracle baseline, same
    * shape as [[bruteForceTopK]]); at corpus scale, run the identical
    * ranking over [[ivfAssign]]-bucketed candidates so each anchor
    * scans only its probed buckets.
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int
  ): DataFrame =
    rankedBySimilarity(
      corpus.select(
        col(idCol).as("negative_id"), col(vecCol).as("_cv"), col(labelCol).as("_cl")),
      broadcast(anchors.select(
        col(idCol).as("anchor_id"), col(vecCol).as("_qv"), col(labelCol).as("_ql"))),
      keep = col("_ql") =!= col("_cl"),
      leftId = "anchor_id", rightId = "negative_id", k = k)

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

  /** Deterministic Lloyd k-means for a real IVF index (SURVEY §7 r2:
    * replaces the modulo-seed centroids as the scale path; ivfAssign
    * stays as the SQL-expressible oracle formulation).
    *
    * Determinism, run to run AND partitioning-independent:
    *  - init = ONE deterministic hash-sample scan (md5-gated like
    *    [[Sampling]], so the sample is partitioning- and engine-
    *    stable) targeting `initOversample`·k candidates, then a
    *    DRIVER-side farthest-point (k-center greedy) traversal over
    *    the sample: seed 1 is the lowest-id candidate, each next seed
    *    maximizes min-distance to the chosen seeds with an id
    *    tie-break — no RNG, and unlike lowest-k-ids it cannot start
    *    with all seeds inside one cluster (which Lloyd can never
    *    recover from). Init cost is O(1) Spark jobs (a count + one
    *    sample collect) regardless of k — the r2 version ran one
    *    full-corpus TakeOrdered PER SEED, which is 4096 corpus scans
    *    at a realistic k;
    *  - assignment = argmin over rounded L2 with centroid-id
    *    tie-break;
    *  - update = per-dimension mean via exact DECIMAL sums (order-
    *    independent), so shuffles can't change the result;
    *  - fixed iteration count (no data-dependent stop).
    *
    * Scale shape per iteration: one broadcast of k·dim doubles, one
    * scan computing each row's nearest centroid (native one-pass
    * VecL2Sq), one partial-aggregated groupBy((cid, dim)) of k·dim
    * groups collected to the driver. No corpus materialization, no
    * growing lineage (each iteration re-plans from the source scan
    * with new literal centroids).
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 5,
      initOversample: Int = 4
  ): Seq[(Long, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // ---- init: one hash-sample pass + driver k-center greedy ----
    val n = corpus.count()
    require(n > 0, "kmeansCentroids on an empty corpus")
    def collectSample(fraction: Double): Array[(Long, Array[Double])] =
      corpus.select(col(idCol).cast("long"), col(vecCol))
        .where(
          if (fraction >= 1.0) lit(true)
          else Sampling.sampledBy(col(idCol), fraction, salt = "kmeans-init"))
        .as[(Long, Seq[Float])]
        .collect()
        .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
        .sortBy(_._1)
    val target = initOversample.toLong * k
    var fraction = math.min(1.0, target.toDouble / n)
    var sample = collectSample(fraction)
    // an under-filled hash margin escalates GEOMETRICALLY (each retry
    // collects an expected 4× the previous target) instead of jumping
    // to an unbounded full-corpus collect; fraction 1.0 means the
    // corpus itself is ≤ the requested sample — driver-small by
    // construction, so the final full collect is always bounded
    while (sample.length < k && fraction < 1.0) {
      fraction = math.min(1.0, fraction * 4)
      sample = collectSample(fraction)
    }

    var centroids: Seq[(Long, Seq[Double])] = greedySeeds(sample, k)

    (1 to maxIter).foreach { _ =>
      val assigned = assignNearest(corpus, vecCol, centroids)
      val sums = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
        .groupBy("centroid_id", "_pos")
        .agg(
          sum(col("_v").cast(DecimalType(28, 10))).as("_s"),
          count(lit(1)).as("_n"))
        .as[(Long, Int, java.math.BigDecimal, Long)]
        .collect()
      val byCid = sums.groupBy(_._1)
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val mean = rows.sortBy(_._2).map { case (_, _, s, n) =>
              (BigDecimal(s) / n).toDouble
            }.toSeq
            (cid, mean)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
    }
    centroids
  }

  /** Deterministic k-center greedy over an id-ascending sample (the
    * farthest-point init every learner here shares): seed 0 is the
    * lowest id, each next seed maximizes min-distance to the chosen
    * set (ties keep the lowest id). Extracted so [[Pq.fit]] can init
    * all m subspace codebooks from ONE sample collect and stay
    * bit-identical to per-subspace [[kmeansCentroids]] runs.
    */
  private[operators] def greedySeeds(
      sample: Array[(Long, Array[Double])], k: Int): Seq[(Long, Seq[Double])] = {
    val seeds = scala.collection.mutable.Buffer[Array[Double]](sample.head._2)
    // min squared distance from each candidate to the chosen seed set
    val minD = sample.map(p => l2sqLocal(p._2, seeds.head))
    while (seeds.size < math.min(k, sample.length)) {
      var best = 0
      var i = 1
      while (i < sample.length) {
        if (minD(i) > minD(best)) best = i // ids ascending → ties keep lowest id
        i += 1
      }
      val next = sample(best)._2
      seeds += next
      i = 0
      while (i < sample.length) {
        val d = l2sqLocal(sample(i)._2, next)
        if (d < minD(i)) minD(i) = d
        i += 1
      }
    }
    seeds.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
  }

  private def l2sqLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Corpus + `centroid_id` of the nearest learned centroid — write
    * this out partitioned/bucketed by `centroid_id` and searches
    * become pruned single-bucket scans.
    */
  def kmeansIvfAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 5
  ): DataFrame =
    assignNearest(corpus, vecCol, kmeansCentroids(corpus, idCol, vecCol, k, maxIter))

  /** One scan: nearest centroid per row via a broadcast join + partial
    * min_by aggregation... no — cheaper: k is small, so the argmin is
    * computed per row against a literal centroid matrix (pure scan
    * work, zero shuffle).
    */
  /** Corpus + `centroid_id` of the nearest of the GIVEN centroids —
    * the assignment half of [[kmeansIvfAssign]] for callers that
    * already hold a learned centroid set (e.g. the IVF-PQ index
    * build, which shares one coarse codebook across stages).
    */
  def assignNearest(
      corpus: DataFrame,
      vecCol: String,
      centroids: Seq[(Long, Seq[Double])]
  ): DataFrame =
    corpus.withColumn("centroid_id", nearestExpr(centroids, col(vecCol)).getField("cid"))

  /** Per-row argmin over a literal centroid matrix: fold over the
    * centroid structs keeping struct(best_d2, best_cid). Rounded
    * distance + cid tie-break = engine- and partitioning-stable.
    * Shared with [[Pq]], which runs it per subvector slice.
    */
  private[operators] def nearestExpr(centroids: Seq[(Long, Seq[Double])], vec: Column) =
    aggregate(
      array(centroids.sortBy(_._1).map { case (cid, v) =>
        struct(lit(cid).as("cid"), array(v.map(lit): _*).as("c"))
      }: _*),
      struct(lit(Double.MaxValue).as("d"), lit(-1L).as("cid")),
      (acc, cs) => {
        val d = round(graft.functions.VectorExpressions.l2sq(cs.getField("c"), vec), 4)
        when(d < acc.getField("d"), struct(d.as("d"), cs.getField("cid").as("cid")))
          .otherwise(acc)
      })

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * near-duplicate pruning — cluster the embedding space, compare
    * pairs only WITHIN a cluster, and keep the lowest-id member of
    * every near-duplicate neighborhood.
    *
    * `assigned` must carry a `centroid_id` column: [[ivfAssign]] is
    * the SQL-expressible oracle form, [[kmeansIvfAssign]] the learned
    * scale path — the pruning step is identical for either. A row is
    * dropped iff some lower-id row in the SAME cluster has rounded
    * cosine ≥ threshold; the min-id row of each neighborhood survives
    * by construction, so the rule needs no iteration (unlike
    * connected-components dedup) and one pass suffices.
    *
    * Scale shape — the published SemDeDup trick: the quadratic
    * pairwise term is confined to a cluster (k grows with the corpus,
    * so cluster size stays bounded), and the only corpus-wide shuffle
    * is the equi-join on `centroid_id`. Cosines are rounded (4 dp)
    * before the threshold test, so the keep set is engine- and
    * partitioning-stable. Returns `assigned` + `kept` (1/0).
    */
  def semDedup(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    // the assignment subtree is referenced three times (both self-join
    // sides + the final join-back); persist it once so the clustering
    // runs one corpus pass, not three (NearDup's capped registry frees
    // it via releaseCaches)
    val once = assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NearDup.registerCache(once)
    val a = once.select(
      col("centroid_id"), col(idCol).as("_a_id"), col(vecCol).as("_av"))
    val b = once.select(
      col("centroid_id"), col(idCol).as("_b_id"), col(vecCol).as("_bv"))
    val dropped = a.join(b, Seq("centroid_id"))
      .where(col("_a_id") < col("_b_id"))
      .where(Vectors.cosine(col("_av"), col("_bv")) >= threshold)
      .select(col("_b_id").as(idCol))
      .distinct()
    once
      .join(dropped.withColumn("_dropped", lit(1L)), Seq(idCol), "left")
      .withColumn("kept", when(col("_dropped").isNull, 1L).otherwise(0L))
      .drop("_dropped")
  }

  /** SRP-LSH near-duplicate pairs over an embedding column — the
    * vector-space analogue of [[NearDup.minhashPairs]]: signed-random-
    * projection signatures ([[graft.functions.Srp]]), band-bucket
    * self-join for candidates, exact-cosine verify inside buckets.
    *
    * Scale shape: signatures are pure scan work (one native expression
    * per row); the only corpus-sized shuffle is the band equi-join,
    * which carries (band, bh, id) only — bounded fan-out, never the
    * O(n²) all-pairs cross join that brute force needs. Vectors ride
    * to the *surviving candidates* via two id-equi-joins. The banded
    * and vector frames are persisted through NearDup's capped cache
    * registry ([[NearDup.releaseCaches]] frees them).
    *
    * A pair with cosine θ collides in one band with probability
    * (1 − θ/π)^r; bands multiply the chances. The default (nbits=16,
    * bands=4 → r=4) keeps background (θ≈90°) collisions at ~6%/band
    * while catching near-parallel vectors with high probability.
    */
  def srpPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nbits: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.4,
      seed: String = "srp"
  ): DataFrame = {
    require(nbits % bands == 0, "bands must divide nbits")
    require(nbits <= 63, "signature is packed into a long")
    val rowsPerBand = nbits / bands
    val matrix = graft.functions.Srp.signMatrix(nbits, dim, seed)

    // the SRP signature is a dense matrix multiply per row — CPU-bound
    // scan work whose parallelism is capped by the input's partition
    // count. Widen narrow embedding scans to session parallelism
    // (StageProfile: a 1-task 0.29 s signature stage inside a 1.6 s
    // q_srp_pairs); no-op on cluster-shaped inputs (operators.Widen).
    val banded = Widen.toParallelism(corpus.select(col(idCol), col(vecCol)))
      .select(
        col(idCol).as("_id"),
        graft.functions.Srp.signature(col(vecCol), matrix).as("_sig"))
      .select(col("_id"), explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          graft.functions.Srp.bandValue(col("_sig"), b, rowsPerBand).as("bh"))
      }: _*)).as("_b"))
      .select(col("_id"), col("_b.band").as("band"), col("_b.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NearDup.registerCache(banded)

    // pin the candidate-pair shuffle (same rationale as
    // NearDup.spreadPairs: the cosine verify downstream is CPU-dense
    // per skinny row, and AQE's byte-based coalescing collapsed it to
    // 3 post-shuffle partitions at bench scale)
    val candidates = NearDup.spreadPairs(banded.as("a")
      .join(banded.as("b"), Seq("band", "bh"))
      .where(col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id")), "a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    // vectors attach to surviving candidates only (no broadcast hint:
    // at corpus scale this stays a shuffle join; AQE upgrades it)
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NearDup.registerCache(vecs)

    candidates
      .join(vecs, col("a_id") === col("_vid")).withColumnRenamed("_vv", "_av").drop("_vid")
      .join(vecs, col("b_id") === col("_vid")).withColumnRenamed("_vv", "_bv").drop("_vid")
      .withColumn("cosine", Vectors.cosine(col("_av"), col("_bv")))
      .where(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
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

  /** Recall@k of an approximate neighbor table against the exact one
    * — the acceptance metric every ANN deployment tracks before
    * swapping brute force out. Both inputs use this file's result
    * shape (`query_id`, `neighbor_id`, `rank`); rows ranked past k
    * are ignored, so a k=5 exact table evaluates a k=3 approx table
    * at recall@3. Returns one row per query (`n_exact`, `n_hit`,
    * `recall`) — macro-average downstream if a scalar is wanted.
    *
    * Scale shape: only (query_id, neighbor_id) id-pairs shuffle —
    * O(queries x k) rows regardless of corpus size; the vectors never
    * move. Queries whose approx set missed entirely still appear
    * (recall 0), via the left join from the exact side.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"recallAtK needs k >= 1, got $k")
    val a = approx.where(col("rank") <= k).select("query_id", "neighbor_id")
    val e = exact.where(col("rank") <= k).select("query_id", "neighbor_id")
    val hits = a.join(e, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    e.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(
          coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_exact").cast("double"),
          4).as("recall"))
      .orderBy("query_id")
  }
}
