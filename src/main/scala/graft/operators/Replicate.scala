package graft.operators

import graft.tables.{ChangeFeed, DeltaChanges, DeltaLog, DeltaWrite, HudiWrite, IcebergWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-format CDC replication — the APPLY CHANGES INTO shape (SCD
  * Type 1, the public Delta Live Tables semantics) generalized over
  * the lakehouse triad: tail ANY Delta/Iceberg/Hudi table's typed
  * change stream through [[graft.tables.ChangeFeed]] and apply it as
  * keyed upserts + deletes to a replica in ANY of the three formats.
  * The piece that closes the change-stream story: sources (R61/R62 +
  * Delta CDF) and exactly-once sinks existed; this is the
  * source→target bridge that keeps a REPLICA table current.
  *
  * Semantics per sync batch over the source range `(watermark, head]`:
  * the change rows FOLD to each key's net effect first — the row
  * whose `_commit_version` is the key's maximum wins; a key whose
  * final change is a delete (or an update pre-image with no
  * post-image, i.e. a key-changing update's OLD key) is removed from
  * the replica; everything else upserts. Intermediate versions never
  * touch the target, so a key churned 1000× in the range costs one
  * write. Cost ∝ changed rows (one window shuffle + the keyed apply),
  * never source or target size — the property that makes minute-cadence
  * replication of a 100 TB table affordable.
  *
  * Exactly-once / crash-safety: the applied watermark rides the
  * TARGET's own commit metadata (Delta `SetTransaction`, Iceberg
  * snapshot-summary `graft.txn-*` keys, Hudi commit `extraMetadata`)
  * under `appId`. The Delta leg applies upserts AND deletes in ONE
  * atomic merge commit (`deleteKeys`); the Iceberg/Hudi legs use two
  * commits (deletes first, then the watermark-carrying upsert) and
  * recover through IDEMPOTENCE — the fold is deterministic for a
  * committed range and keyed deletes/upserts are idempotent, so a
  * crash between the two commits replays the same batch to the same
  * state. The watermark never moves except on the batch's final
  * commit.
  *
  * Requirements, refused loudly: the source must be KEYED (at most
  * one live row per key — the full snapshot is proven at initialize,
  * and two surviving rows for one key within a batch's fold refuse)
  * with non-null keys; `sync` must be called with the keys
  * `initialize` used (the fold is keyed by them); a Hudi replica
  * needs a single key column (the Hudi record key); a Delta source
  * needs `delta.enableChangeDataFeed` (checked at initialize, not
  * first sync). Declared boundary: a source that BECOMES un-keyed
  * after initialize through duplicate inserts in SEPARATE commits is
  * out of contract and not detectable from the change stream alone
  * (full re-proof would scan the source per sync); the fold then
  * converges last-writer-wins — the replica keeps exactly one row
  * per key, which is the keyed-apply semantic, but it no longer
  * mirrors the (un-keyed) source row-for-row.
  */
object Replicate {

  /** Default watermark app id; override per pipeline when several
    * replications target the same table.
    */
  val AppId = "graft-replicate"

  /** What a sync does when the SOURCE dropped a column the replica
    * still carries (non-additive evolution — outside the formats' own
    * additive contracts, so it needs a declared policy).
    */
  sealed trait DropPolicy
  object DropPolicy {
    /** Refuse loudly with a recreate hint (the default): dropping a
      * replica column in place is destructive, so it must be an
      * explicit operator decision.
      */
    case object Refuse extends DropPolicy
    /** Keep the dropped column as a TOMBSTONE: it stays in the
      * replica's schema and every row this and later batches upsert
      * writes null into it; historical rows keep their old values.
      * The replica remains a superset of the source — the safe
      * automatic policy for pipelines that must not stop.
      */
    case object Tombstone extends DropPolicy
  }

  /** One table of a [[syncAll]] pipeline. */
  final case class TableSpec(
      sourcePath: String,
      targetPath: String,
      keys: Seq[String],
      format: String,
      partitionBy: Seq[String] = Seq.empty)

  /** Multi-table driver: keep N replicas current under ONE watermark
    * namespace (`appId`) — each table's watermark still rides its own
    * target's commit metadata, so tables advance independently and a
    * failure in one leaves the others' exactly-once state untouched.
    * A missing target initializes (snapshot create), an existing one
    * syncs; returns the new per-target watermarks. Cost is the sum of
    * the per-table syncs — each ∝ that table's changed rows, never
    * its size.
    */
  def syncAll(
      spark: SparkSession,
      tables: Seq[TableSpec],
      appId: String = AppId,
      onDrop: DropPolicy = DropPolicy.Refuse
  ): Map[String, Long] = {
    require(tables.map(_.targetPath).distinct.size == tables.size,
      "syncAll table specs name a duplicate targetPath")
    // each table syncs independently: one failure must not discard the
    // watermarks of replicas that already advanced in this call, so
    // every table is attempted and failures surface TOGETHER with the
    // partial result ([[SyncAllException]]) instead of aborting mid-list
    val attempts: Seq[(String, scala.util.Try[Long])] = tables.map { t =>
      t.targetPath -> scala.util.Try {
        ChangeFeed.detectFormat(spark, t.targetPath) match {
          case None =>
            initialize(spark, t.sourcePath, t.targetPath, t.keys, t.format,
              t.partitionBy, appId)
          case Some(_) =>
            sync(spark, t.sourcePath, t.targetPath, t.keys, appId, onDrop)
        }
      }
    }
    val advanced = attempts.collect { case (p, scala.util.Success(w)) => p -> w }.toMap
    val failed = attempts.collect { case (p, scala.util.Failure(e)) => p -> e }.toMap
    if (failed.nonEmpty) throw new SyncAllException(advanced, failed)
    advanced
  }

  /** Thrown when [[syncAll]] fails on one or more tables: carries the
    * watermarks of every replica that DID advance in the same call
    * (exactly-once state is already committed on those targets) plus
    * the per-table causes, so callers can tell which replicas moved.
    */
  final class SyncAllException(
      val advanced: Map[String, Long],
      val failures: Map[String, Throwable]
  ) extends RuntimeException(
    s"syncAll failed on ${failures.size} of ${advanced.size + failures.size} " +
      s"table(s): ${failures.map { case (p, e) => s"$p (${e.getMessage})" }.mkString("; ")}" +
      (if (advanced.isEmpty) "" else s"; advanced: ${advanced.keys.mkString(", ")}"),
    failures.values.head)

  /** Full snapshot at the source's head → CREATE the replica in
    * `format` ("delta" | "iceberg" | "hudi") carrying the initial
    * watermark. Returns the source version captured.
    */
  def initialize(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      keys: Seq[String],
      format: String,
      partitionBy: Seq[String] = Seq.empty,
      appId: String = AppId
  ): Long = {
    require(keys.nonEmpty, "replication needs at least one key column")
    require(ChangeFeed.detectFormat(spark, targetPath).isEmpty,
      s"target $targetPath already exists — use sync")
    val feed = ChangeFeed.forPath(spark, sourcePath)
    // a Delta source without CDF would pass initialize and refuse on
    // the FIRST sync, after the replica exists — fail here instead
    feed match {
      case d: graft.tables.DeltaFeed =>
        val meta = DeltaLog.snapshot(spark, d.path, withFiles = false).metadata
        require(meta.configuration.get("delta.enableChangeDataFeed").contains("true"),
          s"Delta source $sourcePath has no change data feed " +
            "(set delta.enableChangeDataFeed=true) — sync would refuse")
      case _ =>
    }
    val head = feed.head(spark)
    val snap = feed.snapshotAt(spark, head)
    keys.foreach(k => require(snap.columns.contains(k),
      s"key column $k is not a column of $sourcePath"))
    // keyed + non-null proof over the snapshot: one bounded agg (the
    // per-sync fold re-checks only the CHANGED keys)
    requireKeyed(snap, keys, s"source $sourcePath at version $head")
    val empty = snap.limit(1).isEmpty
    require(!empty,
      s"source $sourcePath is empty at version $head — an empty create " +
        "cannot carry the watermark commit on every format; initialize " +
        "once the source has rows")
    format match {
      case "delta" =>
        DeltaWrite.append(spark, snap, targetPath, partitionBy,
          txn = Some(appId -> head))
      case "iceberg" =>
        IcebergWrite.append(spark, snap, targetPath, partitionBy,
          txn = Some(appId -> head))
      case "hudi" =>
        require(keys.size == 1,
          s"a Hudi replica is keyed by its single record key, got ${keys.size}")
        require(partitionBy.forall(p => !keys.contains(p)),
          "Hudi partition columns cannot overlap the record key")
        HudiWrite.bulkInsert(spark, snap, targetPath, keys.head, partitionBy,
          txn = Some(appId -> head))
      case other =>
        throw new IllegalArgumentException(
          s"unknown replica format $other (delta | iceberg | hudi)")
    }
    head
  }

  /** Apply the source's changes in `(watermark, head]` to the replica;
    * a no-op when already current (or when the source has no safely
    * consumable head yet). Returns the new watermark.
    */
  def sync(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      keys: Seq[String],
      appId: String = AppId,
      onDrop: DropPolicy = DropPolicy.Refuse
  ): Long = {
    val targetFormat = ChangeFeed.detectFormat(spark, targetPath).getOrElse(
      throw new IllegalArgumentException(
        s"target $targetPath is not a Delta, Iceberg or Hudi table"))
    val last = watermark(spark, targetPath, appId).getOrElse(
      throw new IllegalArgumentException(
        s"replica $targetPath carries no $appId watermark — initialize it first"))
    val feed = ChangeFeed.forPath(spark, sourcePath)
    val head = feed.headOption(spark) match {
      case Some(h) if h > last => h
      case _                   => return last // current, or no safe head yet
    }

    val dataCols = feed.tableSchema(spark).fieldNames.toSeq
    val atMax = foldAtMax(
      feed.changesUniform(spark, last, head), keys,
      s"source $sourcePath range ($last, $head]")
    try {
      if (atMax.limit(1).isEmpty) return last // metadata-only commits
      applyNet(spark, atMax, dataCols, targetFormat, targetPath, keys,
        appId -> head, onDrop)
      head
    } finally atMax.unpersist()
  }

  /** Apply a folded change batch's net effect to the replica: the
    * surviving rows upsert, the all-dead keys delete, and the
    * `marker` rides the final commit. The Delta leg is ONE atomic
    * merge commit; Iceberg/Hudi use two (deletes first) and recover
    * through idempotent replay of the same folded batch.
    */
  private def applyNet(
      spark: SparkSession,
      atMax: DataFrame,
      dataCols0: Seq[String],
      targetFormat: String,
      targetPath: String,
      keys: Seq[String],
      marker: (String, Long),
      onDrop: DropPolicy = DropPolicy.Refuse): Unit = {
    // Non-additive evolution gate, uniform across the triad: columns
    // the replica carries but the source no longer has follow the
    // declared [[DropPolicy]] — refuse with a recreate hint, or keep
    // them as null-filled tombstones. Gated on the batch SCHEMA, not
    // on the batch having survivors: a delete-only batch after an
    // evolution still passes the evolved frame to the keyed apply.
    val tgtFields: Seq[org.apache.spark.sql.types.StructField] = targetFormat match {
      case "delta" =>
        DeltaLog.snapshot(spark, targetPath, withFiles = false).metadata.schema.fields.toSeq
      case _ => ChangeFeed.forPath(spark, targetPath).tableSchema(spark).fields.toSeq
    }
    val droppedFields = tgtFields.filterNot(f => dataCols0.contains(f.name))
    val dataCols: Seq[String] = onDrop match {
      case _ if droppedFields.isEmpty => dataCols0
      case DropPolicy.Refuse =>
        throw new IllegalArgumentException(
          s"replica $targetPath carries column(s) " +
            s"${droppedFields.map(_.name).mkString(", ")} the source no longer " +
            "has — replication is additive-only under DropPolicy.Refuse; " +
            "recreate the replica (drop it and initialize again) or sync with " +
            "DropPolicy.Tombstone to keep the columns null-filled")
      case DropPolicy.Tombstone => dataCols0 ++ droppedFields.map(_.name)
    }
    val tombstoned =
      if (droppedFields.isEmpty) atMax
      else droppedFields.foldLeft(atMax)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    val survivors = tombstoned.where(col("_is_post"))
      .select(dataCols.map(col): _*)
    val dead = atMax.groupBy(keys.map(col): _*)
      .agg(max(when(col("_is_post"), 1).otherwise(0)).as("_p"))
      .where(col("_p") === 0).select(keys.map(col): _*)
    val hasSurvivors = !survivors.limit(1).isEmpty
    val hasDead = !dead.limit(1).isEmpty
    val wm = Some(marker)
    targetFormat match {
      case "delta" =>
        // ADDITIVE source evolution propagates: columns the replica
        // lacks are added by explicit DDL before the apply (the
        // Iceberg/Hudi legs evolve inside their own upsert paths).
        locally {
          val added = survivors.schema.fields
            .filterNot(f => tgtFields.exists(_.name == f.name))
          if (added.nonEmpty)
            graft.tables.DeltaDdl.addColumns(spark, targetPath, added.toSeq)
        }
        // one atomic commit: upserts + deletes + watermark
        DeltaWrite.merge(spark, targetPath, survivors, keys,
          txn = wm, deleteKeys = if (hasDead) Some(dead) else None)
      case "iceberg" =>
        if (hasDead)
          IcebergWrite.deleteEquality(spark, targetPath, dead,
            txn = if (hasSurvivors) None else wm)
        if (hasSurvivors)
          IcebergWrite.upsertEquality(spark, survivors, targetPath, keys,
            txn = wm)
      case "hudi" =>
        require(keys.size == 1,
          s"a Hudi replica is keyed by its single record key, got ${keys.size}")
        if (hasDead)
          HudiWrite.delete(spark, dead, targetPath,
            txn = if (hasSurvivors) None else wm)
        if (hasSurvivors)
          HudiWrite.upsert(spark, survivors, targetPath, txn = wm)
    }
  }

  /** CONTINUOUS replication: a Structured Streaming pipeline tailing
    * the source's typed change stream (the E63
    * [[graft.streaming.ChangeFeedStreamSource]]) and applying each
    * micro-batch's folded net effect to the replica — the streaming
    * form of poll-driven [[sync]]. Returns a configured
    * `DataStreamWriter`; the caller picks the trigger and calls
    * `.start()` (use `Trigger.AvailableNow` for a catch-up-and-stop
    * run, `ProcessingTime` for minute-cadence replication).
    *
    * Lifecycle: the target must NOT exist at first start — the
    * stream's FIRST batch (the source snapshot surfaced as inserts)
    * CREATES the replica; every later batch applies folded
    * upserts + deletes exactly like `sync`. Offsets ride the stream
    * CHECKPOINT (`checkpointDir`); exactly-once re-delivery is
    * guarded by the epoch marker — each batch's id commits with the
    * apply (SetTransaction / snapshot-summary / extraMetadata under
    * `appId`), and a replayed batch with `id <= marker` is skipped.
    * The Iceberg/Hudi legs' two-commit applies recover through
    * idempotence (the fold is deterministic for a checkpointed
    * range), the same argument as `sync`.
    *
    * The marker holds BATCH IDS here, not source versions — do not
    * mix `sync` and `stream` on one replica under one `appId` (reads
    * of either still work; the watermarks just aren't comparable).
    * A target that exists WITHOUT the `appId` marker refuses — the
    * stream never clobbers a foreign table.
    */
  def stream(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      keys: Seq[String],
      format: String,
      checkpointDir: String,
      partitionBy: Seq[String] = Seq.empty,
      appId: String = AppId,
      maxCommitsPerTrigger: Option[Int] = None,
      /** Opt-in pass-through of the CDC source's additive-drift
        * tolerance: a source that GAINS columns mid-stream keeps
        * streaming under the pinned start schema (the replica evolves
        * on the next restart, when the stream re-pins); without it a
        * mid-stream evolution refuses, the source's default.
        */
      additiveSchemaTolerance: Boolean = false,
      /** Non-additive policy, exactly as in [[sync]]. It matters at
        * RESTART: a mid-stream DROP stops the source (schema pinning),
        * and the restarted stream re-pins the narrower schema — under
        * the default Refuse the first batch then stalls the pipeline
        * permanently; Tombstone lets it continue with the dropped
        * replica column null-filled.
        */
      onDrop: DropPolicy = DropPolicy.Refuse
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keys.nonEmpty, "replication needs at least one key column")
    require(Set("delta", "iceberg", "hudi")(format),
      s"unknown replica format $format (delta | iceberg | hudi)")
    if (format == "hudi") require(keys.size == 1,
      s"a Hudi replica is keyed by its single record key, got ${keys.size}")
    val reader = spark.readStream
      .format("graft.streaming.ChangeFeedStreamSourceProvider")
      .option("path", sourcePath)
      .option("additiveSchemaTolerance", additiveSchemaTolerance.toString)
    val src = maxCommitsPerTrigger
      .fold(reader)(n => reader.option("maxCommitsPerTrigger", n.toString))
      .load()
    keys.foreach(k => require(src.columns.contains(k),
      s"key column $k is not a column of $sourcePath"))
    val dataCols = src.columns.toSeq.dropRight(3) // minus the 3 cdc columns
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyStreamBatch(spark, batch, batchId, dataCols, targetPath, keys,
          format, partitionBy, appId, onDrop)
      }
  }

  private def applyStreamBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      dataCols: Seq[String],
      targetPath: String,
      keys: Seq[String],
      format: String,
      partitionBy: Seq[String],
      appId: String,
      onDrop: DropPolicy = DropPolicy.Refuse): Unit = {
    val existing = ChangeFeed.detectFormat(spark, targetPath)
    existing.foreach { f =>
      require(f == format,
        s"replica $targetPath is a $f table, not the configured $format")
      val last = watermark(spark, targetPath, appId).getOrElse(
        throw new IllegalArgumentException(
          s"$targetPath exists but carries no $appId marker — " +
            "refusing to stream into a table this pipeline did not create"))
      if (batchId <= last) return // replayed batch: already applied
    }
    val atMax = foldAtMax(batch, keys, s"stream batch $batchId")
    try {
      if (atMax.limit(1).isEmpty) return // empty batch: marker holds
      if (existing.isEmpty) {
        // first batch: the source snapshot as inserts CREATES the replica
        val dead = atMax.where(!col("_is_post")).limit(1)
        require(dead.isEmpty,
          s"stream batch $batchId would create $targetPath but carries " +
            "deletes — the replica's first batch must be the snapshot")
        val snap = atMax.select(dataCols.map(col): _*)
        format match {
          case "delta" =>
            DeltaWrite.append(spark, snap, targetPath, partitionBy,
              txn = Some(appId -> batchId))
          case "iceberg" =>
            IcebergWrite.append(spark, snap, targetPath, partitionBy,
              txn = Some(appId -> batchId))
          case "hudi" =>
            HudiWrite.bulkInsert(spark, snap, targetPath, keys.head,
              partitionBy, txn = Some(appId -> batchId))
        }
      } else {
        applyNet(spark, atMax, dataCols, format, targetPath, keys,
          appId -> batchId, onDrop)
      }
    } finally atMax.unpersist()
  }

  /** The source version the replica reflects (its `appId` marker in
    * the target's own commit metadata).
    */
  def watermark(
      spark: SparkSession, targetPath: String, appId: String = AppId): Option[Long] =
    ChangeFeed.detectFormat(spark, targetPath) match {
      case Some("delta") =>
        DeltaLog.snapshot(spark, targetPath, withFiles = false).txns.get(appId)
      case Some("iceberg") =>
        IcebergWrite.lastCommittedBatch(spark, targetPath, appId)
      case Some("hudi") =>
        HudiWrite.lastCommittedBatch(spark, targetPath, appId)
      case _ => None
    }

  /** The change rows at each key's MAXIMUM version in the range,
    * `_is_post` marking rows that survive (insert/update_postimage),
    * PERSISTED (the caller unpersists); refuses null keys and keys
    * with more than one surviving row (un-keyed source) in one
    * bounded job over the changed keys.
    */
  private def foldAtMax(
      changes: DataFrame, keys: Seq[String], what: String): DataFrame = {
    val ver = DeltaChanges.CommitVersionCol
    val w = Window.partitionBy(keys.map(col): _*)
    val atMax = changes
      .withColumn("_vmax", max(col(ver)).over(w))
      .where(col(ver) === col("_vmax"))
      .withColumn("_is_post",
        col(DeltaChanges.ChangeTypeCol).isin("insert", "update_postimage"))
      .persist()
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val bad = atMax.groupBy(keys.map(col): _*)
      .agg(sum(when(col("_is_post"), 1L).otherwise(0L)).as("_np"),
        max(when(nullKey, 1).otherwise(0)).as("_null"))
      .where(col("_np") > 1 || col("_null") === 1)
      .limit(1).collect()
    if (bad.nonEmpty) {
      atMax.unpersist()
      val r = bad.head
      if (r.getAs[Int]("_null") == 1) throw new IllegalArgumentException(
        s"$what takes null values in a key column (${keys.mkString(",")}); " +
          "keyed replication cannot match null keys")
      else throw new IllegalArgumentException(
        s"$what leaves ${r.getAs[Long]("_np")} live rows for one key " +
          s"(${keys.mkString(",")}) — replication requires a keyed source " +
          "(at most one live row per key)")
    }
    atMax
  }

  /** Refuse duplicate or null keys in a full frame (initialize). */
  private def requireKeyed(df: DataFrame, keys: Seq[String], what: String): Unit = {
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val bad = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), max(when(nullKey, 1).otherwise(0)).as("_null"))
      .where(col("_n") > 1 || col("_null") === 1)
      .limit(1).collect()
    if (bad.nonEmpty) {
      if (bad.head.getAs[Int]("_null") == 1) throw new IllegalArgumentException(
        s"$what takes null values in a key column (${keys.mkString(",")})")
      else throw new IllegalArgumentException(
        s"$what holds ${bad.head.getAs[Long]("_n")} rows for one key " +
          s"(${keys.mkString(",")}) — replication requires a keyed source")
    }
  }
}
