package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))

  test("windowedRollup aggregates event-time windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamOps.windowedRollup(df, "ts", "event_type", "value", "1 hour")
      .writeStream.format("memory").queryName("wr").outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts(0), "click", 1.5), (ts(60), "click", 2.5), (ts(3700), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, sum_value FROM wr")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 4.0)))
      assert(rows.contains(("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionRollup closes sessions on gap (streaming session_window)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")

    // session windows only support Append mode: a session is emitted
    // once the watermark passes its close — drive it across batches
    val q = StreamOps.sessionRollup(df, "ts", "user_id", "value", "30 minutes",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sr").outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, 1.0), (ts(60), 1L, 2.0))
      q.processAllAvailable()
      input.addData((ts(5000), 1L, 5.0)) // watermark -> 4400s, past session 1's close
      q.processAllAvailable()
      input.addData((ts(100000), 2L, 0.0)) // watermark far ahead, closes session 2
      q.processAllAvailable()
      input.addData((ts(100001), 2L, 0.0)) // one more batch so the new watermark applies
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, sum_value FROM sr")
        .as[(Long, Long, Double)].collect().toSet
      // two sessions for user 1: [0,60] and [5000]
      assert(rows.contains((1L, 2L, 3.0)))
      assert(rows.contains((1L, 1L, 5.0)))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on the same data") {
    val batch = Seq((1L, ts(0), 1.0), (1L, ts(60), 2.0), (1L, ts(5000), 5.0))
      .toDF("user_id", "ts", "value")
    // session_window works on batch frames too — same plan, same result
    val viaWindow = StreamOps.sessionRollup(batch, "ts", "user_id", "value", "30 minutes")
      .select("user_id", "n_events", "sum_value").as[(Long, Long, Double)].collect().toSet
    val viaBatch = graft.operators.Sessionize
      .rollup(batch, "user_id", "ts", "value", gapSeconds = 1800)
      .select("user_id", "n_events", "sum_value").as[(Long, Long, Double)].collect().toSet
    assert(viaWindow == viaBatch)
  }

  test("runningTotals keeps per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.runningTotals(input.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("rt").outputMode(OutputMode.Update()).start()
    try {
      input.addData(StreamOps.UserEvent(1L, ts(0), 1.0))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(1L, ts(10), 2.0), StreamOps.UserEvent(2L, ts(11), 7.0))
      q.processAllAvailable()
      val last = spark.sql("SELECT user_id, n_events, sum_value FROM rt")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(1L) == ((1L, 2L, 3.0)))
      assert(last(2L) == ((2L, 1L, 7.0)))
    } finally q.stop()
  }
}
