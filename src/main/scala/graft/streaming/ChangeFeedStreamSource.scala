package graft.streaming

import graft.tables.{ChangeFeed, DeltaChanges}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Structured Streaming CDC source over ANY of the lakehouse triad —
  * `readStream.format("graft.streaming.ChangeFeedStreamSourceProvider")
  * .option("path", t)` tails a Delta/Iceberg/Hudi table's TYPED
  * change stream (the [[ChangeFeed]] dispatch): each micro-batch is
  * `changesUniform` over the offset range — table columns +
  * `_change_type` (insert/delete, plus update_pre/postimage from
  * Delta's CDF) + `_commit_version` (the feed's monotonic Long) +
  * `_commit_timestamp`. Where [[DeltaStreamSource]] and the
  * E55 sources tail net ROWS, this source tails CHANGES — the shape
  * a streaming aggregate-maintainer or downstream CDC replicator
  * consumes (a foreachBatch over it is the streaming form of
  * [[graft.operators.IncrementalView]]).
  *
  * First batch: the full table at the current version as `insert`
  * rows (`_commit_timestamp` null — the snapshot is not one commit).
  * Offsets are the feed's version Longs; restarts resume from the
  * engine checkpoint exactly-once. `maxCommitsPerTrigger` bounds
  * catch-up batches per the feed's commit list — declared boundary:
  * the Source v1 API surfaces the checkpointed offset only in
  * getBatch, so the FIRST offset of a restarted query with a fully
  * committed checkpoint has no base to cap from and may span the
  * whole backlog; the cap engages from the next trigger on (getBatch
  * seeds the base either way). Per batch: one driver metadata diff +
  * scans ∝ changed data; the schema-drift check runs once per
  * ADVANCED version, not per trigger (for Hudi it costs a snapshot
  * plan).
  */
class ChangeFeedStreamSourceProvider extends StreamSourceProvider {
  private def pathOf(p: Map[String, String]): String =
    p.getOrElse("path",
      throw new IllegalArgumentException("graft cdc source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    ("graft-cdc", ChangeFeed.forPath(spark, pathOf(parameters)).uniformSchema(spark))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedStreamSource(sqlContext.sparkSession, pathOf(parameters),
      maxCommitsPerTrigger = parameters.get("maxCommitsPerTrigger").map(_.toInt),
      additiveSchemaTolerance =
        parameters.get("additiveSchemaTolerance").exists(_.toBoolean))
}

class ChangeFeedStreamSource(
    spark: SparkSession,
    tablePath: String,
    maxCommitsPerTrigger: Option[Int] = None,
    /** Opt-in ADDITIVE schema-drift tolerance: a table that gains
      * columns mid-stream keeps streaming — batches stay under the
      * stream's START schema (Spark streams cannot change schema
      * mid-query; the new columns surface after a restart). Renames,
      * drops and type changes of pinned columns still refuse loudly.
      * Without the opt-in ANY drift refuses (the pre-r12 contract).
      */
    additiveSchemaTolerance: Boolean = false
) extends Source {

  private val feed = ChangeFeed.forPath(spark, tablePath)
  private val pinned = feed.uniformSchema(spark)
  override val schema: StructType = pinned

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.toString.toLong
  }

  @volatile private var lastSeen: Option[Long] = None
  @volatile private var validatedThrough: Long = Long.MinValue

  override def getOffset: Option[Offset] = {
    // a feed with no safely-consumable head yet (e.g. the Hudi
    // pending-instant fence below every completed commit) HOLDS the
    // previous offset instead of failing the query — the same
    // non-exceptional shape HudiStreamSource.getOffset uses
    feed.headOption(spark) match {
      case None => lastSeen.map(LongOffset(_))
      case Some(head) =>
        val capped = (lastSeen, maxCommitsPerTrigger) match {
          case (Some(base), Some(n)) if head > base =>
            feed.versions(spark, base, head).take(math.max(n, 1))
              .lastOption.getOrElse(head)
          case _ => head
        }
        lastSeen = Some(math.max(capped, lastSeen.getOrElse(Long.MinValue)))
        Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = versionOf(end)
    if (to > validatedThrough) {
      val live = feed.tableSchema(spark)
      val pinnedData = StructType(pinned.fields.dropRight(3))
      val ok =
        if (!additiveSchemaTolerance) live == pinnedData
        else pinnedData.fields.forall(f =>
          live.fields.exists(lf => lf.name == f.name && lf.dataType == f.dataType))
      require(ok,
        s"schema of $tablePath changed ${
          if (additiveSchemaTolerance) "non-additively " else ""
        }mid-stream; restart the query to pick it up")
      validatedThrough = to
    }
    lastSeen = Some(math.max(to, lastSeen.getOrElse(Long.MinValue)))
    val df = start match {
      case None =>
        // initial batch: the whole table at `to`, surfaced as inserts
        feed.snapshotAt(spark, to)
          .withColumn(DeltaChanges.ChangeTypeCol, lit("insert"))
          .withColumn(DeltaChanges.CommitVersionCol, lit(to))
          .withColumn(DeltaChanges.CommitTimestampCol,
            lit(null).cast(TimestampType))
      case Some(s) if versionOf(s) == to =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
      case Some(s) =>
        feed.changesUniform(spark, versionOf(s), to)
    }
    // align to the pinned schema, NULL-FILLING pinned columns the
    // frame lacks: a restart replays its last batch via
    // getBatch(None, oldOffset) — a time-traveled snapshot that
    // predates an additive evolution would otherwise fail to resolve
    // the evolved-in columns (the replayed frame is discarded by any
    // idempotent sink; it must still analyze)
    val have = df.columns.toSet
    val aligned = df.select(pinned.fields.map { f =>
      if (have(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    Bridge.internalCreateDataFrame(
      spark, aligned.queryExecution.toRdd, pinned, isStreaming = true)
  }

  override def stop(): Unit = ()
}
