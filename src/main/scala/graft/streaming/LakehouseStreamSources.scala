package graft.streaming

import graft.tables.{HudiTable, HudiWrite, IcebergMeta, IcebergTable, ReadArgs}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

/** Structured Streaming sources over the native Iceberg and Hudi
  * incremental reads — the [[DeltaStreamSource]] shape for the other
  * two lakehouse formats, so a pipeline can tail ANY of the triad
  * without hand-rolling offset bookkeeping:
  *
  *  - Iceberg: offsets are snapshot SEQUENCE NUMBERS (monotonic per
  *    commit where snapshot ids need not be); each micro-batch is the
  *    manifest-level file-set diff [[IcebergTable.incremental]]
  *    plans — appended files only, refusing rewrite ranges loudly.
  *  - Hudi: offsets are timeline INSTANTS (17-digit UTC timestamps,
  *    already totally ordered); each micro-batch is
  *    [[HudiTable.incremental]] — exactly the rows committed in
  *    `(from, to]` with their new values, MOR log records included.
  *
  * First batch semantics: with no checkpointed offset the stream
  * starts from the FULL current table (a snapshot read), then tails
  * increments — the delta-spark `startingVersion=0` shape. Restarts
  * resume from the engine-checkpointed offset exactly-once.
  *
  * Scale shape: per batch, one driver-side metadata diff plus scans
  * of exactly the new files/slices — cost ∝ new data, never ∝ table
  * size. `maxCommitsPerTrigger` bounds catch-up batches after the
  * initial one (a commit is the atomicity unit).
  */
class IcebergStreamSourceProvider extends StreamSourceProvider {
  private def pathOf(p: Map[String, String]): String =
    p.getOrElse("path",
      throw new IllegalArgumentException("graft iceberg source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val fs = new Path(pathOf(parameters))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ("graft-iceberg", IcebergMeta.load(fs, pathOf(parameters)).schema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters),
      maxCommitsPerTrigger = parameters.get("maxCommitsPerTrigger").map(_.toInt),
      upsertChanges = parameters.get("upsertChanges").exists(_.toBoolean))
}

class IcebergStreamSource(
    spark: SparkSession,
    tablePath: String,
    maxCommitsPerTrigger: Option[Int] = None,
    /** Tail tables written by equality-UPSERTS: each batch is the
      * range's added rows with the range's own deletes applied —
      * latest-per-changed-key, the shape a key-upserting downstream
      * sink consumes. Overwrite/compaction ranges still refuse.
      */
    upsertChanges: Boolean = false
) extends Source {

  private def fs = new Path(tablePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val pinned = IcebergMeta.load(fs, tablePath).schema
  override val schema: StructType = pinned

  private def seqOf(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.toString.toLong
  }

  @volatile private var lastSeen: Option[Long] = None

  override def getOffset: Option[Offset] = {
    val meta = IcebergMeta.load(fs, tablePath)
    val current = meta.currentSnapshotId
      .flatMap(id => meta.snapshots.find(_.id == id))
    val capped = current.map { cur =>
      (lastSeen, maxCommitsPerTrigger) match {
        case (Some(base), Some(n)) =>
          // bounded catch-up: admit at most n commits past the base
          val admitted = meta.snapshots.map(_.sequenceNumber)
            .filter(s => s > base && s <= cur.sequenceNumber)
            .sorted.take(math.max(n, 1))
          admitted.lastOption.getOrElse(cur.sequenceNumber)
        case _ => cur.sequenceNumber
      }
    }
    capped.foreach(c => lastSeen = Some(math.max(c, lastSeen.getOrElse(Long.MinValue))))
    capped.map(LongOffset(_))
  }

  /** Snapshot with the greatest sequence number ≤ `seq` (expired
    * snapshots resolve to their closest surviving ancestor).
    */
  private def snapshotAtSeq(meta: IcebergMeta.TableMeta, seq: Long) =
    meta.snapshots.filter(_.sequenceNumber <= seq)
      .sortBy(_.sequenceNumber).lastOption
      .getOrElse(throw new IllegalStateException(
        s"no snapshot of $tablePath at or before sequence $seq " +
          "(history expired past the stream's checkpoint)"))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val meta = IcebergMeta.load(fs, tablePath)
    require(meta.schema == pinned,
      s"schema of $tablePath changed mid-stream; restart the query to pick it up")
    val toSeq = seqOf(end)
    lastSeen = Some(math.max(toSeq, lastSeen.getOrElse(Long.MinValue)))
    val table = new IcebergTable("stream", tablePath)
    val to = snapshotAtSeq(meta, toSeq)
    val df = start match {
      case None =>
        // initial batch: the full table as of the end offset
        table(spark, ReadArgs(extra = Map(table.SnapshotIdKey -> to.id)))
      case Some(s) =>
        val from = snapshotAtSeq(meta, seqOf(s))
        if (from.id == to.id)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
        else table.incremental(spark, from.id, to.id,
          allowNewDeletes = upsertChanges)
    }
    val aligned = df.select(
      pinned.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    Bridge.internalCreateDataFrame(
      spark, aligned.queryExecution.toRdd, pinned, isStreaming = true)
  }

  override def stop(): Unit = ()
}

class HudiStreamSourceProvider extends StreamSourceProvider {
  private def pathOf(p: Map[String, String]): String =
    p.getOrElse("path",
      throw new IllegalArgumentException("graft hudi source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-hudi",
      new HudiTable("stream", pathOf(parameters))(
        sqlContext.sparkSession, ReadArgs.empty).schema)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new HudiStreamSource(sqlContext.sparkSession, pathOf(parameters),
      maxCommitsPerTrigger = parameters.get("maxCommitsPerTrigger").map(_.toInt))
}

class HudiStreamSource(
    spark: SparkSession,
    tablePath: String,
    maxCommitsPerTrigger: Option[Int] = None
) extends Source {

  private def fs = new Path(tablePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val table = new HudiTable("stream", tablePath)
  private val pinned = table(spark, ReadArgs.empty).schema
  override val schema: StructType = pinned

  private def instantOf(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.toString.toLong
  }

  /** 17-digit zero-padded timeline spelling of an offset. */
  private def spell(i: Long): String = f"$i%017d"

  @volatile private var lastSeen: Option[Long] = None

  override def getOffset: Option[Offset] = {
    // fenced at the earliest PENDING instant: a racing writer whose
    // lower instant completes later must not be skipped forever by
    // this stream's advancing offset. A None fence means NOTHING is
    // safely consumable yet — hold the previous offset, never fall
    // open to the unfenced timeline
    val (fence, fenced) = HudiWrite.fencedTimeline(fs, tablePath)
    if (fence.isEmpty) return lastSeen.map(LongOffset(_))
    val instants = fenced.map(_._1)
    val latest = instants.lastOption.map(_.toLong)
    val capped = latest.map { l =>
      (lastSeen, maxCommitsPerTrigger) match {
        case (Some(base), Some(n)) =>
          val admitted = instants.map(_.toLong)
            .filter(i => i > base && i <= l).take(math.max(n, 1))
          admitted.lastOption.getOrElse(l)
        case _ => l
      }
    }
    capped.foreach(c => lastSeen = Some(math.max(c, lastSeen.getOrElse(Long.MinValue))))
    capped.map(LongOffset(_))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = instantOf(end)
    lastSeen = Some(math.max(to, lastSeen.getOrElse(Long.MinValue)))
    val df = start match {
      case None =>
        table(spark, ReadArgs(extra = Map(table.AsOfInstantKey -> spell(to))))
      case Some(s) =>
        val from = instantOf(s)
        if (from >= to)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
        else table.incremental(spark, spell(from), Some(spell(to)))
    }
    require(pinned.fieldNames.forall(df.columns.contains),
      s"schema of $tablePath changed mid-stream; restart the query to pick it up")
    val aligned = df.select(
      pinned.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    Bridge.internalCreateDataFrame(
      spark, aligned.queryExecution.toRdd, pinned, isStreaming = true)
  }

  override def stop(): Unit = ()
}
