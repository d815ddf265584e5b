package graft.streaming

import graft.SparkSpec
import graft.operators.{IncrementalNearDup, NearDup}
import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end STREAMING corpus dedup: documents arrive as a stream,
  * each micro-batch probes the persistent LSH band index for
  * near-dups of everything ingested before it, unique docs land in a
  * Delta table, and the batch's bands append to the index — the
  * check-then-append contract per trigger. This is the composition
  * the batch operators were shaped for: the index and sink are plain
  * tables, so the same pipeline runs batch or streaming unchanged.
  */
class StreamingDedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch check-then-append dedups a stream against all prior batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = tempDir("stream-dedup").toString
    val indexDir = s"$base/index"
    val sinkDir = s"$base/corpus"
    val ckpt = s"$base/ckpt"

    val phrase = "spark engines shuffle partitioned data across executors for joins"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val q = docs.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val known =
          if (new java.io.File(s"$sinkDir/_delta_log").exists())
            new DeltaTable("corpus", sinkDir)(batch.sparkSession, ReadArgs.empty)
          else batch.limit(0)
        val dups = IncrementalNearDup.check(
          batch.sparkSession, batch, known, "doc_id", "text", indexDir)
        val unique = batch.join(dups.select(col("new_id").as("doc_id")).distinct(),
          Seq("doc_id"), "leftanti")
        DeltaWrite.append(batch.sparkSession, unique, sinkDir)
        // index ONLY what was kept: the corpus lookup is the sink, so
        // indexing dropped docs would create candidates that can
        // never verify (and an ever-growing dead index)
        IncrementalNearDup.appendToIndex(
          batch.sparkSession, unique, "doc_id", "text", indexDir)
      }
      .start()
    try {
      // batch 1: two unique docs (index starts empty)
      input.addData((1L, phrase), (2L, "a completely different cooking text tonight"))
      q.processAllAvailable()
      // batch 2: one near-dup of doc 1 (dropped), one fresh doc
      input.addData((3L, phrase + " quickly"), (4L, "gardening tips and tulip care notes"))
      q.processAllAvailable()
      // batch 3: a near-dup of the BATCH-2 doc — cross-batch state
      input.addData((5L, "gardening tips and tulip care advice notes"))
      q.processAllAvailable()
    } finally q.stop()

    val kept = new DeltaTable("corpus", sinkDir)(spark, ReadArgs.empty)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
    NearDup.releaseCaches()
  }

  test("streamed batches detect cross-batch near-dups via the persistent index") {
    val base = tempDir("stream-dedup").toString
    val src = s"$base/docs"
    val idx = s"$base/index"
    val dupText = "alpha beta gamma delta epsilon zeta"
    DeltaWrite.append(spark, Seq(
      (1L, dupText),
      (2L, "completely different text body here"),
      (3L, "another unrelated document entirely")).toDF("doc_id", "text"), src)

    val found = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = spark.readStream
      .format(classOf[DeltaStreamSourceProvider].getName)
      .option("path", src).load()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val corpus = new DeltaTable("docs", src)(spark, ReadArgs.empty)
        val pairs = IncrementalNearDup
          .check(spark, batch, corpus, "doc_id", "text", idx)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        found.synchronized { found ++= pairs }
        IncrementalNearDup.appendToIndex(spark, batch, "doc_id", "text", idx)
      }
      .start()
    try {
      q.processAllAvailable()
      assert(found.isEmpty, s"first batch has no prior corpus, got $found")

      DeltaWrite.append(spark, Seq(
        (4L, dupText),
        (5L, "fresh text again nothing shared")).toDF("doc_id", "text"), src)
      q.processAllAvailable()
      assert(found.toSet == Set((4L, 1L, 1.0)), found)

      // intra-batch twins (8,9) are NOT cross-batch dups — only the
      // chained copies of doc 1 report, each against the prior corpus
      DeltaWrite.append(spark, Seq(
        (7L, dupText),
        (8L, "twin text appearing twice in one batch"),
        (9L, "twin text appearing twice in one batch")).toDF("doc_id", "text"), src)
      q.processAllAvailable()
      assert(found.toSet == Set((4L, 1L, 1.0), (7L, 1L, 1.0), (7L, 4L, 1.0)), found)
    } finally q.stop()
  }
}
