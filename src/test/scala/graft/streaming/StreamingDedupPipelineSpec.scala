package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalNearDup
import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end streaming corpus dedup: a Delta documents table grows
  * by appends, a stream tails it (E42 source), and every micro-batch
  * checks the PERSISTENT LSH index before appending its own bands
  * (P62) — the check-then-append contract means each arriving doc is
  * compared against exactly the corpus that preceded it.
  */
class StreamingDedupPipelineSpec extends SparkSpec {
  import spark.implicits._

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
