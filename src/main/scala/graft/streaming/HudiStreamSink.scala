package graft.streaming

import graft.tables.HudiWrite
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming sink UPSERTING micro-batches into a native
  * Hudi table with EXACTLY-ONCE delivery — completing the
  * lakehouse-sink triad ([[DeltaStreamSink]], [[IcebergStreamSink]]).
  * Every commit stamps `(graft.txn-app-id, graft.txn-batch-id)` into
  * the commit JSON's `extraMetadata` (the upstream
  * deltastreamer-checkpoint carrier); a replayed batch whose id is
  * already recorded is skipped.
  *
  * Each batch is a Hudi UPSERT by the table's record key — on a
  * MERGE_ON_READ table updates land as log appends (O(delta) write
  * cost, the minute-cadence ingest shape), on COPY_ON_WRITE as group
  * rewrites. The table must exist (bulk-insert it first: the record
  * key and partitioning are table-level choices, not per-batch ones).
  *
  * Usage:
  * {{{
  * df.writeStream
  *   .format(classOf[HudiStreamSinkProvider].getName)
  *   .option("path", tableDir)
  *   .option("txnAppId", "my-pipeline")  // stable across restarts
  *   .option("checkpointLocation", ckpt)
  *   .outputMode("append")
  *   .start()
  * }}}
  */
class HudiStreamSinkProvider extends StreamSinkProvider {
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft hudi sink supports Append output mode only, got $outputMode")
    new HudiStreamSink(
      sqlContext.sparkSession,
      parameters.getOrElse("path",
        throw new IllegalArgumentException("graft hudi sink requires option 'path'")),
      parameters.getOrElse("txnAppId",
        throw new IllegalArgumentException(
          "graft hudi sink requires option 'txnAppId' (a stable writer id — " +
            "exactly-once depends on it surviving restarts)")))
  }
}

class HudiStreamSink(
    spark: SparkSession,
    tablePath: String,
    txnAppId: String
) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (HudiWrite.lastCommittedBatch(spark, tablePath, txnAppId).exists(_ >= batchId))
      return
    val batch = Bridge.internalCreateDataFrame(
      spark, data.queryExecution.toRdd, data.schema, isStreaming = false)
    HudiWrite.upsert(spark, batch, tablePath, txn = Some(txnAppId -> batchId))
  }

  override def toString: String = s"GraftHudiSink[$tablePath]"
}
