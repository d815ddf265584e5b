package graft.operators

import graft.core.Filter
import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent PQ ANN index over Delta — the production serving shape
  * for [[Pq]]: the learned codebooks and the encoded corpus live as
  * Delta tables, so the index SURVIVES the session, grows by
  * O(batch) appends as the corpus grows (the [[IncrementalNearDup]]
  * arrival pattern), and any number of searchers read a consistent
  * snapshot through the ordinary Delta machinery (time travel,
  * OPTIMIZE, VACUUM all apply).
  *
  * Layout: `<root>/model` — one row per (subspace, centroid id,
  * centroid vector); `<root>/codes` — (id, pq_codes array<int>), m
  * bytes-worth per vector instead of d floats; optionally
  * `<root>/coarse` — the IVF coarse centroids, with the codes table
  * PARTITIONED by nearest-centroid id so probed searches are pruned
  * Delta scans (see [[create]]/[[search]]). Doubles round-trip
  * parquet bit-exactly, so a loaded model is IDENTICAL to the fitted
  * one and search results are reproducible across sessions (the gate
  * query's DuckDB oracle replays the whole encode+ADC pipeline from
  * the spliced model).
  *
  * Scale shape: create/addBatch are scan-only encodes (codebooks ride
  * as literals) + one Delta commit; search is the [[Pq.adcTopK]]
  * lookup-table scan over the codes table — the float corpus is
  * never read after indexing. Racing `addBatch` loaders both land via
  * Delta's optimistic commits.
  */
object VectorIndex {

  private def modelPath(root: String) = s"$root/model"
  private def codesPath(root: String) = s"$root/codes"
  private def coarsePath(root: String) = s"$root/coarse"

  /** Fit the PQ model on `corpus`, persist model + codes. Returns the
    * fitted model (identical to what [[loadModel]] reads back).
    *
    * `coarseK > 0` additionally learns an IVF coarse quantizer
    * ([[Similarity.kmeansCentroids]]), persists it at
    * `<root>/coarse`, and PARTITIONS the codes table by each row's
    * nearest-centroid id — so a probed search reads only the
    * `nprobe` bucket directories through ordinary Delta partition
    * pruning, never the whole codes table (the FAISS IVFPQ serving
    * layout, persisted). `coarseK = 0` keeps the flat layout.
    */
  def create(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      dims: Int,
      m: Int,
      ksub: Int,
      maxIter: Int = 3,
      payload: Seq[String] = Nil,
      coarseK: Int = 0,
      coarseIter: Int = 5
  ): Pq.Model = {
    // a second create would APPEND a second model — duplicate (j, cid)
    // rows silently corrupt the positional LUT indexing downstream, so
    // an existing index refuses (delete the root to retrain)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(modelPath(root), "_delta_log")),
      s"index already exists at $root — delete it to retrain (codebooks are frozen)")
    val model = Pq.fit(corpus, idCol, vecCol, dims, m, ksub, maxIter)
    import spark.implicits._
    val rows = model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.map { case (cid, v) => (j, cid, v) }
    }.toDF("j", "cid", "centroid")
    DeltaWrite.append(spark, rows, modelPath(root))
    if (coarseK > 0) {
      val coarse = Similarity.kmeansCentroids(corpus, idCol, vecCol, coarseK, coarseIter)
      DeltaWrite.append(spark, coarse.toDF("cid", "centroid"), coarsePath(root))
      DeltaWrite.append(spark,
        Pq.encode(Similarity.assignNearest(corpus, vecCol, coarse), vecCol, model)
          .select(col(idCol).as("id") +: col("pq_codes") +: col("centroid_id") +:
            payload.map(col): _*),
        codesPath(root), partitionBy = Seq("centroid_id"))
    } else
      DeltaWrite.append(spark,
        Pq.encode(corpus, vecCol, model)
          .select(col(idCol).as("id") +: col("pq_codes") +: payload.map(col): _*),
        codesPath(root))
    model
  }

  /** Encode a new batch with the PERSISTED model and append its codes
    * — O(batch) work against an ever-growing corpus, never a refit
    * (the standard IVF/PQ serving contract: the codebooks are frozen
    * at train time; re-create the index to retrain).
    */
  def addBatch(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      payload: Seq[String] = Nil
  ): Unit = {
    val model = loadModel(spark, root)
    // the batch must carry the index's payload columns exactly: Delta
    // would otherwise null-fill silently and filtered search would
    // never return these rows under a payload predicate
    val existing = new DeltaTable("vecindex_codes", codesPath(root))(spark, ReadArgs.empty)
      .columns.filterNot(Set("id", "pq_codes", "centroid_id")).toSet
    require(existing == payload.toSet,
      s"payload columns ${payload.mkString("[", ",", "]")} do not match the " +
        s"index's ${existing.mkString("[", ",", "]")} at $root")
    loadCoarse(spark, root) match {
      case Some(coarse) => // frozen coarse layer: assign, land in-bucket
        DeltaWrite.append(spark,
          Pq.encode(Similarity.assignNearest(batch, vecCol, coarse), vecCol, model)
            .select(col(idCol).as("id") +: col("pq_codes") +: col("centroid_id") +:
              payload.map(col): _*),
          codesPath(root), partitionBy = Seq("centroid_id"))
      case None =>
        DeltaWrite.append(spark,
          Pq.encode(batch, vecCol, model)
            .select(col(idCol).as("id") +: col("pq_codes") +: payload.map(col): _*),
          codesPath(root))
    }
  }

  /** Delete corpus rows from the index by id — the lifecycle
    * complement of [[addBatch]]: without it a row deleted from the
    * source corpus keeps surfacing from the codes table until a full
    * rebuild. The codes table IS a Delta table, so this is a keyed
    * [[DeltaWrite.deleteWhere]]; on a coarse-partitioned index the
    * deleted ids' OWNING buckets are resolved first (one pruned read
    * of the ids' (id, centroid_id) pairs) and the delete predicate
    * carries `centroid_id IN (owners)` — partition pruning then
    * bounds the rewrite to exactly those bucket directories, never
    * the whole codes table. Returns the number of owning buckets
    * rewritten (0 = no id was present, no commit made).
    */
  def deleteByIds(
      spark: SparkSession,
      root: String,
      ids: Seq[Any]
  ): Int = {
    require(ids.nonEmpty, "deleteByIds with no ids")
    val idFilter = Filter("id", "in", ids)
    val codes = new DeltaTable("vecindex_codes", codesPath(root))(
      spark, ReadArgs.where(idFilter))
    if (codes.columns.contains("centroid_id")) {
      val owners = codes.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      if (owners.isEmpty) return 0
      DeltaWrite.deleteWhere(spark, codesPath(root), graft.core.Filters.normalize(
        Seq(idFilter, Filter("centroid_id", "in", owners))))
      owners.size
    } else {
      if (codes.limit(1).isEmpty) return 0
      DeltaWrite.deleteWhere(spark, codesPath(root),
        graft.core.Filters.normalize(Seq(idFilter)))
      1
    }
  }

  /** Re-train the IVF coarse layer over the CURRENT codes and
    * repartition the codes table by the new assignments — the
    * maintenance op that restores `search(nprobe)` pruning after many
    * [[addBatch]] rounds have skewed the frozen buckets (the standard
    * IVF serving contract: assignment quality decays as the corpus
    * drifts from the training distribution, so the coarse layer is
    * periodically retrained while the PQ codebooks stay frozen).
    *
    * Vectors are RECONSTRUCTED from the PQ codes (the FAISS
    * re-cluster shape — the float corpus is never re-read): decode is
    * a scan-only expression against the literal codebooks, so the
    * whole op costs one k-means fit over reconstructions plus one
    * partitioned rewrite of the codes table.
    *
    * Concurrency/atomicity contract: the codes rewrite is ONE Delta
    * overwrite guarded by `requireBase` — a racing [[addBatch]]
    * between the read and the commit raises ConcurrentWriteException
    * instead of losing its rows (retry the rebalance). The coarse
    * swap is a second, metadata-sized commit; a searcher in that
    * one-commit window (or after a crash between the two) sees
    * mismatched centroids — returned rows stay exact-ADC correct,
    * only probe recall degrades — and re-running rebalance converges
    * it. Returns the new coarse centroids.
    */
  def rebalance(
      spark: SparkSession,
      root: String,
      /** New bucket count; 0 keeps the existing one. */
      coarseK: Int = 0,
      coarseIter: Int = 5
  ): Seq[(Long, Seq[Double])] = {
    val coarse = loadCoarse(spark, root).getOrElse(throw new IllegalArgumentException(
      s"$root is a flat index (created without coarseK); nothing to rebalance"))
    val model = loadModel(spark, root)
    val base = graft.tables.DeltaLog
      .snapshot(spark, codesPath(root), withFiles = false).version
    val codes = new DeltaTable("vecindex_codes", codesPath(root))(spark, ReadArgs.empty)
    val payloadCols = codes.columns.filterNot(Set("id", "pq_codes", "centroid_id")).toSeq
    // positional decode: cid i is row i of each sorted codebook (the
    // same dense-cid invariant the ADC LUT indexes by)
    val books: Seq[Seq[Seq[Double]]] = model.codebooks.map(_.sortBy(_._1).map(_._2))
    // float32, the corpus embedding convention every k-means path here
    // consumes (reconstructions are centroid copies — float-exact)
    val decoded = codes.drop("centroid_id").withColumn("_vec",
      flatten(transform(col("pq_codes"),
        (c, j) => element_at(element_at(typedlit(books), j + lit(1)), c + lit(1))))
        .cast("array<float>"))
    val k = if (coarseK > 0) coarseK else coarse.size
    val newCoarse = Similarity.kmeansCentroids(decoded, "id", "_vec", k, coarseIter)
    val reassigned = Similarity.assignNearest(decoded, "_vec", newCoarse).drop("_vec")
    DeltaWrite.overwrite(spark,
      reassigned.select(col("id") +: col("pq_codes") +: col("centroid_id") +:
        payloadCols.map(col): _*),
      codesPath(root), partitionBy = Seq("centroid_id"), requireBase = Some(base))
    DeltaWrite.overwrite(spark,
      spark.createDataFrame(newCoarse).toDF("cid", "centroid"), coarsePath(root))
    newCoarse
  }

  /** The persisted coarse centroids, or None for a flat index. */
  def loadCoarse(spark: SparkSession, root: String): Option[Seq[(Long, Seq[Double])]] = {
    val p = new org.apache.hadoop.fs.Path(coarsePath(root), "_delta_log")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(
      new DeltaTable("vecindex_coarse", coarsePath(root))(spark, ReadArgs.empty)
        .select("cid", "centroid")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1)
        .toSeq)
  }

  /** Read the codebooks back — bit-identical to the fitted model. */
  def loadModel(spark: SparkSession, root: String): Pq.Model = {
    val rows = new DeltaTable("vecindex_model", modelPath(root))(spark, ReadArgs.empty)
      .select("j", "cid", "centroid")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq))
    require(rows.nonEmpty, s"no PQ model rows under ${modelPath(root)}")
    val m = rows.map(_._1).max + 1
    val subDim = rows.head._3.length
    val books = (0 until m).map { j =>
      rows.filter(_._1 == j).sortBy(_._2).map { case (_, cid, v) => (cid, v) }.toSeq
    }
    Pq.Model(m * subDim, m, books)
  }

  /** ADC top-k over the persisted codes with the persisted model.
    * `where` is a payload predicate in the engine's Filter algebra,
    * applied as a PRE-filter: the candidate set is restricted before
    * distance ranking, so exactly k matching neighbors come back
    * (post-filtering can starve below k). Because it rides ReadArgs
    * into the Delta read, per-file payload stats skip whole code
    * files — at 100 TB a selective predicate prunes the ADC scan to
    * the matching files, not just the matching rows.
    */
  def search(
      spark: SparkSession,
      root: String,
      queries: Seq[(Long, Seq[Double])],
      k: Int,
      where: Seq[Filter] = Nil,
      /** Coarse buckets probed per query (indexes built with
        * `coarseK > 0`). The UNION of all queries' probe sets becomes
        * a `centroid_id IN (...)` filter INSIDE the Delta read, so
        * partition pruning opens only the probed bucket directories
        * — O(nprobe/K of the corpus) per query instead of a full ADC
        * scan; per-query probe membership then gates candidate pairs
        * exactly as the in-session [[Pq.ivfPqTopK]]. `0` = exhaustive
        * scan (exact ADC ranking, also the only choice on a flat
        * index — a positive nprobe there refuses loudly).
        */
      nprobe: Int = 0
  ): DataFrame = {
    val model = loadModel(spark, root)
    val coarse = loadCoarse(spark, root)
    require(nprobe == 0 || coarse.isDefined,
      s"nprobe=$nprobe needs a coarse layer; $root was created without coarseK")
    coarse match {
      case Some(cs) if nprobe > 0 =>
        val probes = queries.flatMap(q => Pq.probeCentroids(cs, q._2, nprobe)).distinct.sorted
        val codes = new DeltaTable("vecindex_codes", codesPath(root))(
          spark, ReadArgs.where(where :+ Filter("centroid_id", "in", probes): _*))
        Pq.ivfPqTopK(codes, "id", "pq_codes", cs, model, queries, nprobe, k)
      case _ =>
        val codes = new DeltaTable("vecindex_codes", codesPath(root))(
          spark, ReadArgs.where(where: _*))
        Pq.adcTopK(codes, "id", "pq_codes", model, queries, k)
    }
  }
}
