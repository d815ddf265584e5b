package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization for ANN at corpus scale (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search", IEEE TPAMI):
  * split each d-dim vector into `m` contiguous subvectors, learn a
  * small k-means codebook per subspace, and store each vector as `m`
  * small codes instead of `d` floats — a 64-dim float32 embedding
  * (256 B) compresses to m bytes, so a 100 TB embedding corpus's
  * search structure fits in a fraction of the executors' memory and
  * the ADC scan reads codes, not vectors.
  *
  * Scale shape:
  *  - training is `m` runs of the deterministic bounded-collect
  *    k-means in [[Similarity.kmeansCentroids]] (driver holds
  *    m·ksub·(d/m) doubles — KB, not data);
  *  - encoding is pure scan work against literal codebook matrices
  *    (zero shuffle, codegen'd fold per subspace);
  *  - search is asymmetric distance computation (ADC): each query
  *    precomputes an m×ksub lookup table of exact
  *    query-subvector→centroid distances on the driver, and every
  *    corpus row's approximate distance is `m` array lookups summed —
  *    no float vector is read at query time.
  *
  * Everything downstream of training is deterministic given the data
  * (hash-sample init, exact-decimal means, rounded argmin with cid
  * tie-break), so the DuckDB oracle can splice the learned codebooks
  * and query LUTs as literals and replay encode + ADC end to end.
  *
  * The reference has no ANN surface; this extends the engine's IVF /
  * brute-force ladder (Similarity.scala) with the memory-bound path.
  */
object Pq {

  /** Learned PQ model: `m` codebooks of up to `ksub` centroids, each
    * centroid a (d/m)-dim double vector, cids dense from 0 per
    * subspace.
    */
  final case class Model(dims: Int, m: Int, codebooks: Seq[Seq[(Long, Seq[Double])]]) {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val subDim: Int = dims / m
  }

  /** Train one codebook per contiguous subvector slice — in ONE pass
    * per Lloyd round shared by all m sub-learners (maxIter + 2 jobs
    * total: count, sample collect, maxIter aggregations), not m
    * independent k-means runs: each row's m subspace assignments are
    * computed in the same scan and a single groupBy((j, cid, pos))
    * aggregation feeds every codebook's mean update. At 100 TB,
    * m × (maxIter + 2) corpus passes versus maxIter + 2 is the
    * difference between an overnight job and a coffee break.
    *
    * Bit-identical to m per-subspace [[Similarity.kmeansCentroids]]
    * runs (PqSpec asserts it): the init sample is gated by the SAME
    * id hash (so every subspace sees the same rows — slicing the
    * collected vectors locally equals collecting sliced vectors),
    * the greedy seeding is the shared [[Similarity.greedySeeds]],
    * and per-round means divide the same exact decimal sums.
    */
  def fit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ksub: Int,
      maxIter: Int = 3
  ): Model = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val d = dims / m
    val spark = corpus.sparkSession
    import spark.implicits._

    // ---- init: one count + one FULL-vector sample collect; each
    // subspace's greedy seeding runs on the sliced sample ----
    val n = corpus.count()
    require(n > 0, "Pq.fit on an empty corpus")
    def collectSample(fraction: Double): Array[(Long, Array[Double])] =
      corpus.select(col(idCol).cast("long"), col(vecCol))
        .where(
          if (fraction >= 1.0) lit(true)
          else Sampling.sampledBy(col(idCol), fraction, salt = "kmeans-init"))
        .as[(Long, Seq[Float])]
        .collect()
        .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
        .sortBy(_._1)
    val target = 4L * ksub // kmeansCentroids' default initOversample
    var fraction = math.min(1.0, target.toDouble / n)
    var sample = collectSample(fraction)
    // an under-filled hash margin escalates GEOMETRICALLY (each retry
    // collects an expected 4× the previous target) instead of jumping
    // to an unbounded full-corpus collect; fraction 1.0 means the
    // corpus itself is ≤ the requested sample — driver-small by
    // construction, so the final full collect is always bounded
    while (sample.length < ksub && fraction < 1.0) {
      fraction = math.min(1.0, fraction * 4)
      sample = collectSample(fraction)
    }
    var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { j =>
      Similarity.greedySeeds(
        sample.map { case (id, v) => (id, v.slice(j * d, j * d + d)) }, ksub)
    }

    // ---- Lloyd rounds: ONE aggregation per round for all m books ----
    (1 to maxIter).foreach { _ =>
      val cids = array((0 until m).map(j =>
        Similarity.nearestExpr(books(j), slice(col(vecCol), j * d + 1, d))
          .getField("cid")): _*)
      val sums = corpus
        // two projections: the generator extraction re-analyzes its
        // select, which strips the aliases inside nearestExpr's
        // lambda struct — resolving _cids first keeps it an attribute
        .select(cids.as("_cids"), col(vecCol))
        .select(col("_cids"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
        .select(
          floor(col("_pos") / d).cast("int").as("_j"),
          col("_cids"), (col("_pos") % d).as("_sp"), col("_v"))
        .withColumn("_cid", element_at(col("_cids"), col("_j") + 1))
        .groupBy("_j", "_cid", "_sp")
        .agg(
          sum(col("_v").cast(DecimalType(28, 10))).as("_s"),
          count(lit(1)).as("_n"))
        .select("_j", "_cid", "_sp", "_s", "_n")
        .as[(Int, Long, Int, java.math.BigDecimal, Long)]
        .collect()
      val byJc = sums.groupBy(t => (t._1, t._2))
      books = (0 until m).map { j =>
        books(j).map { case (cid, old) =>
          byJc.get((j, cid)) match {
            case Some(rows) =>
              (cid, rows.sortBy(_._3).map { case (_, _, _, s, cnt) =>
                (BigDecimal(s) / cnt).toDouble
              }.toSeq)
            case None => (cid, old) // empty cluster keeps its centroid
          }
        }
      }
    }
    Model(dims, m, books)
  }

  /** Corpus + `codesCol`: array<int> of length m, the per-subspace
    * nearest-centroid ids. Scan-only — the codebooks ride along as
    * literal matrices, no shuffle, no collect.
    */
  def encode(
      corpus: DataFrame,
      vecCol: String,
      model: Model,
      codesCol: String = "pq_codes"
  ): DataFrame = {
    val d = model.subDim
    val codes = array((0 until model.m).map { j =>
      Similarity
        .nearestExpr(model.codebooks(j), slice(col(vecCol), j * d + 1, d))
        .getField("cid")
        .cast("int")
    }: _*)
    corpus.withColumn(codesCol, codes)
  }

  /** The m×ksub ADC lookup table for one query vector: exact L2²
    * between the query's j-th subvector and each centroid of codebook
    * j, ascending-index double accumulation (the same order the
    * oracle's `list_sum(list_transform(...))` uses).
    */
  def lut(model: Model, query: Seq[Double]): Seq[Seq[Double]] = {
    require(query.length == model.dims, s"query dim ${query.length} != ${model.dims}")
    val d = model.subDim
    (0 until model.m).map { j =>
      model.codebooks(j).sortBy(_._1).map { case (_, c) =>
        var s = 0.0
        var i = 0
        while (i < d) { val diff = query(j * d + i) - c(i); s += diff * diff; i += 1 }
        s
      }
    }
  }

  /** Deterministic bounded query collect: vectors of `idCol < bound`,
    * ascending id, widened to double.
    */
  def collectQueries(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bound: Long
  ): Seq[(Long, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .where(col(idCol) < bound)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .collect()
      .sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
      .toSeq
  }

  /** The nprobe nearest coarse centroids for a query vector, under
    * the SAME rounded-distance + lowest-cid-tie-break order the
    * row-side argmin ([[Similarity.nearestExpr]]) uses — so the
    * driver's probe list and the executors' assignments can never
    * disagree on the metric.
    */
  def probeCentroids(
      coarse: Seq[(Long, Seq[Double])],
      query: Seq[Double],
      nprobe: Int
  ): Seq[Long] =
    coarse
      .map { case (cid, c) =>
        var s = 0.0
        var i = 0
        while (i < c.length) { val d = query(i) - c(i); s += d * d; i += 1 }
        (BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
      }
      .sortBy(identity)
      .take(nprobe)
      .map(_._2)

  /** IVF-PQ search (the FAISS `IVFPQ` layout with `by_residual =
    * false`): the corpus is bucketed by nearest coarse centroid and
    * stored as PQ codes; a query probes only its `nprobe` nearest
    * buckets and ranks the candidates by ADC table lookups. The two
    * halves compound at 100 TB: IVF cuts the candidate set by
    * ~k/nprobe×, PQ cuts the bytes per candidate by ~64× — the scan
    * reads a sliver of a compressed index and never touches a float
    * vector.
    *
    * `indexed` must carry `centroid_id` ([[Similarity]] assignment)
    * and `codesCol` ([[encode]]); write it out partitioned by
    * `centroid_id` and the probe filter becomes partition pruning.
    */
  def ivfPqTopK(
      indexed: DataFrame,
      idCol: String,
      codesCol: String,
      coarse: Seq[(Long, Seq[Double])],
      model: Model,
      queries: Seq[(Long, Seq[Double])],
      nprobe: Int,
      k: Int
  ): DataFrame = {
    require(queries.nonEmpty, "ivfPqTopK with no queries")
    val qlits = queries.sortBy(_._1).map { case (qid, qv) =>
      struct(
        lit(qid).as("query_id"),
        array(probeCentroids(coarse, qv, nprobe).map(lit): _*).as("probes"),
        array(lut(model, qv).map(row => array(row.map(lit): _*)): _*).as("lut"))
    }
    val exploded = indexed
      .select(col(idCol).as("neighbor_id"), col(codesCol).as("_codes"),
        col("centroid_id"))
      .select(col("neighbor_id"), col("_codes"), col("centroid_id"),
        explode(array(qlits: _*)).as("_q"))
      .where(array_contains(col("_q.probes"), col("centroid_id")) &&
        col("_q.query_id") =!= col("neighbor_id"))
    val adist = round(
      (0 until model.m)
        .map(j =>
          element_at(
            element_at(col("_q.lut"), j + 1),
            element_at(col("_codes"), j + 1) + 1))
        .reduce(_ + _),
      4)
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    exploded
      .select(col("_q.query_id").as("query_id"), col("neighbor_id"), adist.as("adist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** ADC top-k over the encoded corpus: per (query, row) the
    * approximate distance is a FIXED-ORDER sum of m literal-table
    * lookups (`lut[j][code_j]`, j ascending, left-associated — the
    * exact addition order the oracle's `t0 + t1 + ...` chain uses),
    * rounded to 4 decimals; ties break on neighbor id. One window
    * shuffle on query_id ranks the candidates; the corpus vectors are
    * never touched.
    */
  def adcTopK(
      encoded: DataFrame,
      idCol: String,
      codesCol: String,
      model: Model,
      queries: Seq[(Long, Seq[Double])],
      k: Int
  ): DataFrame = {
    require(queries.nonEmpty, "adcTopK with no queries")
    val qlits = queries.sortBy(_._1).map { case (qid, qv) =>
      struct(
        lit(qid).as("query_id"),
        array(lut(model, qv).map(row => array(row.map(lit): _*)): _*).as("lut"))
    }
    val exploded = encoded
      .select(col(idCol).as("neighbor_id"), col(codesCol).as("_codes"))
      .select(col("neighbor_id"), col("_codes"), explode(array(qlits: _*)).as("_q"))
      .where(col("_q.query_id") =!= col("neighbor_id"))
    val adist = round(
      (0 until model.m)
        .map(j =>
          element_at(
            element_at(col("_q.lut"), j + 1),
            element_at(col("_codes"), j + 1) + 1))
        .reduce(_ + _),
      4)
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    exploded
      .select(col("_q.query_id").as("query_id"), col("neighbor_id"), adist.as("adist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }
}
