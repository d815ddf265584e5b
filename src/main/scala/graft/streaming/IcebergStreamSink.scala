package graft.streaming

import graft.tables.IcebergWrite
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming sink writing micro-batches into a native
  * Iceberg table with EXACTLY-ONCE delivery — the [[DeltaStreamSink]]
  * contract for the second lakehouse format. Every batch commit
  * stamps `(graft.txn-app-id, graft.txn-batch-id)` into the snapshot
  * summary; a replayed batch whose id is already recorded is skipped,
  * so a crash between the engine's checkpoint and the table commit
  * cannot duplicate rows.
  *
  * Two modes:
  *  - `append` (default): each batch is an Iceberg append.
  *  - `upsert` with `keyCols`: each batch is ONE atomic
  *    equality-upsert snapshot ([[IcebergWrite.upsertEquality]]) —
  *    the Flink-connector upsert shape, latest-per-key with no scan
  *    of existing data.
  *
  * Usage:
  * {{{
  * df.writeStream
  *   .format(classOf[IcebergStreamSinkProvider].getName)
  *   .option("path", tableDir)
  *   .option("txnAppId", "my-pipeline")  // stable across restarts
  *   .option("mode", "upsert")
  *   .option("keyCols", "id")
  *   .option("checkpointLocation", ckpt)
  *   .outputMode("append")
  *   .start()
  * }}}
  */
class IcebergStreamSinkProvider extends StreamSinkProvider {
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft iceberg sink supports Append output mode only, got $outputMode")
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "upsert",
      s"mode must be append or upsert, got $mode")
    val keyCols = parameters.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    require(mode != "upsert" || keyCols.nonEmpty,
      "upsert mode requires option 'keyCols' (comma-separated)")
    new IcebergStreamSink(
      sqlContext.sparkSession,
      parameters.getOrElse("path",
        throw new IllegalArgumentException("graft iceberg sink requires option 'path'")),
      partitionColumns,
      parameters.getOrElse("txnAppId",
        throw new IllegalArgumentException(
          "graft iceberg sink requires option 'txnAppId' (a stable writer id — " +
            "exactly-once depends on it surviving restarts)")),
      upsertKeys = if (mode == "upsert") Some(keyCols) else None)
  }
}

class IcebergStreamSink(
    spark: SparkSession,
    tablePath: String,
    partitionColumns: Seq[String],
    txnAppId: String,
    upsertKeys: Option[Seq[String]]
) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val lastCommitted =
      try IcebergWrite.lastCommittedBatch(spark, tablePath, txnAppId)
      catch { case _: IllegalArgumentException => None } // table absent yet
    if (lastCommitted.exists(_ >= batchId)) return

    // re-wrap the engine-owned streaming plan as a batch frame (the
    // same move Spark's own file sink makes)
    val batch = Bridge.internalCreateDataFrame(
      spark, data.queryExecution.toRdd, data.schema, isStreaming = false)
    upsertKeys match {
      case Some(keys) =>
        IcebergWrite.upsertEquality(spark, batch, tablePath, keys,
          txn = Some(txnAppId -> batchId))
      case None =>
        IcebergWrite.append(spark, batch, tablePath, partitionColumns,
          txn = Some(txnAppId -> batchId))
    }
  }

  override def toString: String = s"GraftIcebergSink[$tablePath]"
}
