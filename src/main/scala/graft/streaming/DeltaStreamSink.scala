package graft.streaming

import graft.tables.{DeltaLog, DeltaWrite}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming sink writing micro-batches into a Delta
  * table with EXACTLY-ONCE delivery: every batch commit carries a
  * `txn` (SetTransaction) action `(txnAppId, batchId)`, and a batch
  * whose id is already recorded under the appId in the log is skipped
  * — so when the engine replays the last batch after a crash, the
  * second attempt is a no-op instead of duplicate rows. This is the
  * protocol's own idempotent-writer mechanism (PROTOCOL.md
  * "Transaction Identifiers"); the high-water marks survive log
  * cleanup via checkpoint txn rows.
  *
  * Usage:
  * {{{
  * df.writeStream
  *   .format(classOf[DeltaStreamSinkProvider].getName)
  *   .option("path", tableDir)
  *   .option("txnAppId", "my-pipeline")   // stable across restarts
  *   .option("checkpointLocation", ckpt)
  *   .outputMode("append")
  *   .start()
  * }}}
  */
class DeltaStreamSinkProvider extends StreamSinkProvider {
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft delta sink supports Append output mode only, got $outputMode")
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "merge",
      s"mode must be append or merge, got $mode")
    val keyCols = parameters.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    require(mode != "merge" || keyCols.nonEmpty,
      "merge mode requires option 'keyCols' (comma-separated)")
    new DeltaStreamSink(
      sqlContext.sparkSession,
      parameters.getOrElse("path",
        throw new IllegalArgumentException("graft delta sink requires option 'path'")),
      partitionColumns,
      parameters.getOrElse("txnAppId",
        throw new IllegalArgumentException(
          "graft delta sink requires option 'txnAppId' (a stable writer id — " +
            "exactly-once depends on it surviving restarts)")),
      mergeKeys = if (mode == "merge") Some(keyCols) else None)
  }
}

class DeltaStreamSink(
    spark: SparkSession,
    tablePath: String,
    partitionColumns: Seq[String],
    txnAppId: String,
    /** When set, each batch MERGEs by these keys (streaming upsert —
      * the triad-symmetric mode: Iceberg equality-upserts, Hudi
      * record-key upserts, Delta MERGE) instead of appending.
      */
    mergeKeys: Option[Seq[String]] = None
) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // replayed batch? the log remembers the last committed id per appId
    val lastCommitted =
      if (!DeltaLog.isDeltaTable(spark, tablePath)) None
      else DeltaLog.snapshot(spark, tablePath, withFiles = false).txns.get(txnAppId)
    if (lastCommitted.exists(_ >= batchId)) return

    // the incoming frame's plan belongs to the streaming engine and
    // cannot be re-planned by a batch writer — re-wrap its rows (the
    // same move Spark's own file sink makes)
    val batch = Bridge.internalCreateDataFrame(
      spark, data.queryExecution.toRdd, data.schema, isStreaming = false)
    mergeKeys match {
      case Some(keys) if DeltaLog.isDeltaTable(spark, tablePath) =>
        DeltaWrite.merge(spark, tablePath, batch, keys,
          txn = Some(txnAppId -> batchId))
      case _ =>
        DeltaWrite.append(spark, batch, tablePath, partitionColumns,
          txn = Some(txnAppId -> batchId))
    }
  }

  override def toString: String = s"GraftDeltaSink[$tablePath]"
}
