package graft.operators

import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTENT LSH band
  * index — the production shape of corpus dedup once data arrives in
  * batches: instead of recomputing MinHash over the whole corpus per
  * batch (O(corpus) each time), the corpus's banded signatures live
  * in a Delta table and each new batch (a) probes the index for
  * candidates, (b) verifies them exactly, (c) appends its own bands —
  * O(batch) compute + one index join per batch, ever-growing corpus.
  *
  * The index is SKINNY: one `(doc_id, band, bh)` row per document per
  * band — the same relation [[NearDup.minhashPairs]] self-joins,
  * made durable. Text never enters the index; exact-Jaccard
  * verification joins shingle sets from the caller-provided corpus
  * lookup by candidate id (at 100 TB, candidates are a vanishing
  * fraction, so this join touches almost nothing). Band keys use the
  * portable md5 machinery, so index contents are engine- and
  * batch-order-independent: checking then appending batches in ANY
  * order yields the same index as indexing the union at once
  * (spec-asserted), and the whole flow replays in SQL for the oracle.
  *
  * Concurrency: appends ride Delta's optimistic commit protocol; two
  * racing batch loaders both land. Dedup across batches stays exact
  * as long as each batch checks before appending itself.
  */
object IncrementalNearDup {

  final case class Params(k: Int = 5, numHashes: Int = 8, bands: Int = 2) {
    require(numHashes % bands == 0, "bands must divide numHashes")
  }

  /** The banded relation of a frame: (doc_id, band, bh). */
  private def banded(
      df: DataFrame, idCol: String, textCol: String, p: Params): DataFrame = {
    val rowsPerBand = p.numHashes / p.bands
    NearDup.minhashSignatures(df, textCol, p.k, p.numHashes).select(
      col(idCol).cast("long").as("doc_id"),
      array((0 until p.bands).map { band =>
        val sigs = (band * rowsPerBand until (band + 1) * rowsPerBand)
          .map(j => col(NearDup.sigCol(j)))
        struct(lit(band).as("band"), NearDup.bandKey(sigs).as("bh"))
      }: _*).as("_bands"))
      .select(col("doc_id"), explode(col("_bands")).as("_b"))
      .select(col("doc_id"), col("_b.band").as("band"), col("_b.bh").as("bh"))
  }

  /** Append `docs`' band rows to the index table (created on first
    * append). Call AFTER [[check]] for batch-vs-corpus semantics.
    */
  def appendToIndex(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      p: Params = Params()
  ): Unit =
    DeltaWrite.append(spark, banded(docs, idCol, textCol, p), indexPath)

  /** Near-duplicate pairs between `batch` and the indexed corpus:
    * (new_id, idx_id, jaccard ≥ threshold). `corpus` provides text
    * for exact verification of the banded candidates (joined by id —
    * only candidate ids are ever read in full).
    */
  def check(
      spark: SparkSession,
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      p: Params = Params(),
      threshold: Double = 0.5
  ): DataFrame = {
    // a not-yet-created index is an EMPTY index (the first batch of a
    // streaming pipeline checks before anything was ever appended)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(indexPath, "_delta_log")))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("new_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("idx_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("jaccard",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    val index = new DeltaTable("near_dup_index", indexPath)(spark, ReadArgs.empty)
    val probe = banded(batch, idCol, textCol, p)
    val candidates = index.as("i")
      .join(probe.as("n"), Seq("band", "bh"))
      .select(col("n.doc_id").as("new_id"), col("i.doc_id").as("idx_id"))
      // self-pair guard: a batch re-checked after its own append (a
      // loader retry past the check-then-append checkpoint) must not
      // report every doc as a jaccard-1.0 duplicate of itself
      .where(col("new_id") =!= col("idx_id"))
      .dropDuplicates("new_id", "idx_id")

    def shsets(df: DataFrame, out: String): DataFrame = df.select(
      col(idCol).cast("long").as(s"${out}_id0"),
      graft.functions.TextHashExpressions.shingleHashSet(col(textCol), p.k).as(s"${out}_sh"))

    val withSets = candidates
      .join(shsets(batch, "n"), col("new_id") === col("n_id0")).drop("n_id0")
      .join(shsets(corpus, "i"), col("idx_id") === col("i_id0")).drop("i_id0")
    val inter = graft.functions.TextHashExpressions
      .sortedIntersectCount(col("n_sh"), col("i_sh")).cast("double")
    val union = (size(col("n_sh")) + size(col("i_sh"))).cast("double") - inter
    withSets
      .withColumn("jaccard", round(inter / union, 4))
      .where(col("jaccard") >= threshold)
      .select("new_id", "idx_id", "jaccard")
  }
}
