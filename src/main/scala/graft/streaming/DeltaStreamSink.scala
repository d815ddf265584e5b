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
    new DeltaStreamSink(
      sqlContext.sparkSession,
      parameters.getOrElse("path",
        throw new IllegalArgumentException("graft delta sink requires option 'path'")),
      partitionColumns,
      parameters.getOrElse("txnAppId",
        throw new IllegalArgumentException(
          "graft delta sink requires option 'txnAppId' (a stable writer id — " +
            "exactly-once depends on it surviving restarts)")))
  }
}

class DeltaStreamSink(
    spark: SparkSession,
    tablePath: String,
    partitionColumns: Seq[String],
    txnAppId: String
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
    DeltaWrite.append(spark, batch, tablePath, partitionColumns,
      txn = Some(txnAppId -> batchId))
  }

  override def toString: String = s"GraftDeltaSink[$tablePath]"
}
