package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalView
import graft.tables.{DeltaLog, DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end: a streaming ingest (exactly-once Delta sink) feeding an
  * incrementally-maintained materialized view — the steady-state shape
  * of a 100 TB ingest+serve pipeline: the stream appends micro-batches,
  * each view refresh reads only the change feed since its watermark,
  * and the view equals a from-scratch recompute after every batch.
  */
class StreamingViewSpec extends SparkSpec {
  import spark.implicits._

  private val sinkFmt = classOf[DeltaStreamSinkProvider].getName

  private def viewRows(view: String): Map[String, (Long, Long)] =
    new DeltaTable("v", view)(spark, ReadArgs())
      .select("grp", "n_rows", "sum_v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  private def recompute(base: String): Map[String, (Long, Long)] =
    new DeltaTable("b", base)(spark, ReadArgs())
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("streamed micro-batches keep the incremental view equal to a recompute") {
    implicit val sqlCtx = spark.sqlContext
    val base = tempDir("sview-base").toString + "/t"
    val view = tempDir("sview-view").toString + "/v"
    val ckpt = tempDir("sview-ckpt").toString

    // CDF-enabled base, created before the stream starts
    DeltaWrite.append(spark, Seq.empty[(String, Long)].toDF("grp", "v"), base)
    DeltaWrite.setTableProperties(spark, base,
      Map("delta.enableChangeDataFeed" -> "true"))
    IncrementalView.initialize(spark, base, view,
      keys = Seq("grp"), sums = Seq(("v", "sum_v")))

    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("grp", "v").writeStream
      .format(sinkFmt).option("path", base).option("txnAppId", "sview-app")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      IncrementalView.refresh(spark, base, view, Seq("grp"), Seq(("v", "sum_v")))
      assert(viewRows(view) == recompute(base), "after batch 1")

      input.addData(("a", 10L), ("c", 5L))
      q.processAllAvailable()
      IncrementalView.refresh(spark, base, view, Seq("grp"), Seq(("v", "sum_v")))
      assert(viewRows(view) == recompute(base), "after batch 2")
    } finally q.stop()

    // a base DELETE (CDC rows) also flows through the same refresh
    DeltaWrite.deleteWhere(spark, base,
      graft.core.Filters.normalize(Seq(graft.core.Filter("grp", "=", "a"))))
    IncrementalView.refresh(spark, base, view, Seq("grp"), Seq(("v", "sum_v")))
    assert(viewRows(view) == recompute(base), "after delete")
    assert(!viewRows(view).contains("a")) // zero-net keys leave the view
  }
}
