package graft.streaming

import graft.tables.{DeltaLog, DeltaRead}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{StructField, StructType}

/** Structured Streaming source over a Delta table: the stream is the
  * table's commit log, each micro-batch the dataChange `add` files of
  * newly-landed versions — lakehouse-as-message-bus, the standard way
  * a 100 TB pipeline feeds incremental consumers without a second
  * queueing system.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[DeltaStreamSourceProvider].getName)
  *   .option("path", tableDir)
  *   .option("startingVersion", "0")   // default 0 (full history)
  *   .option("ignoreDeletes", "true")  // tolerate delete-only commits
  *   .option("maxFilesPerTrigger", "1000") // backpressure: cap files/batch
  *   .load()
  * }}}
  *
  * Semantics match the public delta-spark streaming contract:
  * append-only commits stream their added rows; a delete-only commit
  * refuses unless `ignoreDeletes`; a rewrite commit (both adds and
  * removes — OPTIMIZE, MERGE, copy-on-write DELETE) refuses unless
  * `ignoreChanges`, which re-emits the rewritten files' rows.
  * Offsets are table versions, checkpointed by the engine, so a
  * restarted query resumes exactly after the last committed version.
  *
  * Scale shape: per batch, one driver-side log read of the new
  * versions plus parquet scans of exactly the new files — cost ∝ new
  * data, never ∝ table size.
  */
class DeltaStreamSourceProvider extends StreamSourceProvider {

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft delta source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = DeltaLog.snapshot(
      sqlContext.sparkSession, pathOf(parameters), withFiles = false).schema
    val full =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) table
      else StructType(table.fields ++ Seq(
        StructField(graft.tables.DeltaChanges.ChangeTypeCol,
          org.apache.spark.sql.types.StringType),
        StructField(graft.tables.DeltaChanges.CommitVersionCol,
          org.apache.spark.sql.types.LongType),
        StructField(graft.tables.DeltaChanges.CommitTimestampCol,
          org.apache.spark.sql.types.TimestampType)))
    ("graft-delta", full)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(
      sqlContext.sparkSession,
      pathOf(parameters),
      startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean),
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toInt),
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map(_.toLong))
}

class DeltaStreamSource(
    spark: SparkSession,
    tablePath: String,
    startingVersion: Long,
    ignoreDeletes: Boolean,
    ignoreChanges: Boolean,
    readChangeFeed: Boolean = false,
    /** Backpressure (delta-spark parity): cap the ADD files admitted
      * per micro-batch. A stream restarted against a large backlog
      * then drains it in bounded batches instead of one giant one —
      * the difference between a smooth catch-up and an executor-OOM
      * on a 100 TB table. Version-granular: a batch always advances
      * ≥ 1 version (never stalls), and a single jumbo commit is
      * admitted whole (commits are the atomicity unit).
      */
    maxFilesPerTrigger: Option[Int] = None,
    /** Byte-denominated companion to maxFilesPerTrigger (sum of
      * admitted add-file sizes per batch); both may be set — the
      * tighter bound wins.
      */
    maxBytesPerTrigger: Option[Long] = None
) extends Source {

  // schema pinned at stream start; a mid-stream metadata change that
  // alters it refuses in getBatch rather than emitting mixed shapes
  private val meta = DeltaLog.snapshot(spark, tablePath, withFiles = false).metadata
  override val schema: StructType =
    if (!readChangeFeed) meta.schema
    else StructType(meta.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        graft.tables.DeltaChanges.ChangeTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        graft.tables.DeltaChanges.CommitVersionCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        graft.tables.DeltaChanges.CommitTimestampCol, org.apache.spark.sql.types.TimestampType)))

  private def version(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.toString.toLong
  }

  /** Last version this source has OFFERED or EMITTED — the base the
    * rate limit advances from. Seeded by getBatch (the engine replays
    * the restored batch before asking for a new offset on restart),
    * so a restarted stream is rate-limited from its checkpoint, not
    * from zero.
    */
  @volatile private var lastSeen: Option[Long] = None

  /** Latest version with the table's log as the stream's high-water
    * mark; None until the first commit at/after startingVersion.
    * Under `maxFilesPerTrigger`, offers the furthest version whose
    * cumulative add-file count stays within budget (always ≥ 1
    * version of progress).
    */
  override def getOffset: Option[Offset] = {
    val latest = DeltaLog.latestVersion(spark, tablePath).filter(_ >= startingVersion)
    val capped =
      if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) latest
      else latest.map { l =>
        val fileBudget = maxFilesPerTrigger.map(_.toLong).getOrElse(Long.MaxValue)
        val byteBudget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
        val from = lastSeen.map(_ + 1).getOrElse(startingVersion)
        if (from > l) l
        else {
          // lazy walk: commits parse one version at a time and the
          // walk stops at the first budget-busting version, so a
          // restart against a huge backlog does O(admitted) parse
          // work per trigger, not O(backlog)
          var files = 0L
          var bytes = 0L
          var v = from - 1
          val it = DeltaLog.changeActionsIter(spark, tablePath, from, l)
          var stop = false
          while (!stop && it.hasNext) {
            val vc = it.next()
            val n = vc.adds.size.toLong
            val b = vc.adds.map(_.size).sum
            // first version always admits (atomicity unit); after
            // that, stop before the version that busts either budget
            if (v >= from && (files + n > fileBudget || bytes + b > byteBudget))
              stop = true
            else { files += n; bytes += b; v = vc.version }
          }
          math.max(v, from) // ≥ 1 version even if it alone busts
        }
      }
    capped.foreach(c => lastSeen = Some(math.max(c, lastSeen.getOrElse(Long.MinValue))))
    capped.map(LongOffset(_))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version(_) + 1).getOrElse(startingVersion)
    val to = version(end)
    // seed the rate-limit base on restart (the engine replays the
    // restored batch before the first getOffset)
    lastSeen = Some(math.max(to, lastSeen.getOrElse(Long.MinValue)))
    val cur = DeltaLog.snapshot(spark, tablePath, withFiles = false).metadata
    require(cur.schemaString == meta.schemaString,
      s"schema of $tablePath changed mid-stream; restart the query to pick it up")

    if (readChangeFeed) {
      // CDF mode: change rows per version — deletes/updates arrive as
      // typed rows instead of refusals
      val df =
        if (from > to) None
        else Some(graft.tables.DeltaChanges.between(spark, tablePath, from, to))
      return df match {
        case Some(d) =>
          val aligned = d.select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
          Bridge.internalCreateDataFrame(
            spark, aligned.queryExecution.toRdd, schema, isStreaming = true)
        case None =>
          Bridge.internalCreateDataFrame(spark,
            spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
            schema, isStreaming = true)
      }
    }

    val adds =
      if (from > to) Seq.empty
      else DeltaLog.changeActions(spark, tablePath, from, to).flatMap { vc =>
        if (vc.removes.nonEmpty && vc.adds.nonEmpty)
          require(ignoreChanges,
            s"version ${vc.version} of $tablePath rewrote data files " +
              "(MERGE/DELETE/OPTIMIZE); set ignoreChanges=true to re-emit " +
              "the rewritten rows, or stream from the change data feed")
        else if (vc.removes.nonEmpty)
          // delta-spark's ignoreChanges subsumes ignoreDeletes
          require(ignoreDeletes || ignoreChanges,
            s"version ${vc.version} of $tablePath deleted data files; " +
              "set ignoreDeletes=true to skip delete-only commits")
        vc.adds
      }

    val batch =
      if (adds.isEmpty)
        Bridge.internalCreateDataFrame(spark,
          spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
          schema, isStreaming = true)
      else {
        val df = DeltaRead.readFiles(spark, tablePath, meta, adds)
        Bridge.internalCreateDataFrame(
          spark, df.queryExecution.toRdd, schema, isStreaming = true)
      }
    batch
  }

  override def stop(): Unit = ()
}
