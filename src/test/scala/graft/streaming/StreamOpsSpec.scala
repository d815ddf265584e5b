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

  test("stream-static enrichment joins each micro-batch against a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "emea"), (2L, "apac")).toDF("nation_id", "region")
    val enriched = StreamOps.enrich(
      input.toDF().toDF("nation_id", "value"), dim, Seq("nation_id"))
      .groupBy("region").agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val q = enriched.writeStream.format("memory").queryName("enr")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 5.0), (3L, 9.0)) // 3 has no dim row
      q.processAllAvailable()
      val rows = spark.sql("SELECT region, n, sum_value FROM enr")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("emea", 2L, 3.0), ("apac", 1L, 5.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to impressions") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      keyCol = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 hour")
    val q = joined.select("ad_id", "imp_ts", "click_ts")
      .writeStream.format("memory").queryName("ssj").outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(0)))
      clicks.addData(
        (1L, ts(600)),   // within the hour → match
        (2L, ts(7200)),  // 2h later → no match
        (4L, ts(60)))    // no impression → no match
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad_id FROM ssj").as[Long].collect().toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      keyCol = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      within = "10 minutes", watermarkDelay = "1 minute", joinType = "left_outer")
    val q = joined.select("ad_id", "click_ts")
      .writeStream.format("memory").queryName("ssjo").outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(60)))
      q.processAllAvailable()
      // push both watermarks far past imp_ts + within + delay so the
      // unmatched impression (ad 2) is provably unjoinable
      imps.addData((9L, ts(10000)))
      clicks.addData((9L, ts(10000)))
      q.processAllAvailable()
      imps.addData((10L, ts(20000)))
      clicks.addData((10L, ts(20000)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad_id, click_ts FROM ssjo")
        .as[(Long, Option[java.sql.Timestamp])].collect().toMap
      assert(rows(1L).contains(ts(60)))
      assert(rows.contains(2L) && rows(2L).isEmpty, s"unmatched row missing: $rows")
    } finally q.stop()
  }

  test("batch and streaming interval join agree on the same data") {
    val impsB = Seq((1L, ts(0)), (2L, ts(0)), (3L, ts(0))).toDF("ad_id", "imp_ts")
    val clicksB = Seq((1L, ts(600)), (2L, ts(7200)), (4L, ts(60))).toDF("ad_id", "click_ts")
    val viaJoin = StreamOps.intervalJoin(impsB, clicksB,
        "ad_id", "imp_ts", "click_ts", within = "1 hour")
      .select("ad_id").as[Long].collect().toSeq
    assert(viaJoin == Seq(1L))
  }

  test("dedupWithinWatermark drops repeats, keeps state bounded by the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("event_id", "ts", "payload")
    val q = StreamOps.dedupWithinWatermark(df, "ts", Seq("event_id"),
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("ddw").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      input.addData((1L, ts(5), "a-dup2")) // still within horizon → dropped
      q.processAllAvailable()
      // advance the watermark far past the horizon, then repeat key 1:
      // its dedup state has been evicted, so the event is NEW
      input.addData((99L, ts(100000), "advance"))
      q.processAllAvailable()
      input.addData((1L, ts(100001), "a-again"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT payload FROM ddw").as[String].collect().toSet
      assert(rows == Set("a", "b", "advance", "a-again"), s"got $rows")
    } finally q.stop()
  }

  test("stateful queries run on the RocksDB state store provider") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tempDir("rocksdb-ckpt").toString
    StreamOps.useRocksDbStateStore(spark)
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val df = input.toDF().toDF("event_id", "ts", "payload")
      val q = StreamOps.dedupWithinWatermark(df, "ts", Seq("event_id"),
          watermarkDelay = "5 minutes")
        .writeStream.format("memory").queryName("rocks")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((1L, ts(0), "a"), (1L, ts(1), "dup"), (2L, ts(2), "b"))
        q.processAllAvailable()
        input.addData((1L, ts(5), "dup2"), (3L, ts(6), "c"))
        q.processAllAvailable()
        val rows = spark.sql("SELECT payload FROM rocks").as[String].collect().toSet
        assert(rows == Set("a", "b", "c"), s"got $rows")
        // the checkpoint must carry RocksDB artifacts (snapshot zips /
        // changelogs), proving the provider actually ran
        val stateDir = java.nio.file.Paths.get(ckpt, "state")
        val files = java.nio.file.Files.walk(stateDir).toArray.map(_.toString)
        assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
          s"no RocksDB artifacts under $stateDir: ${files.take(20).mkString(",")}")
      } finally q.stop()
    } finally StreamOps.useDefaultStateStore(spark)
  }

  test("transformWithState running totals agree with the mapGroupsWithState API") {
    implicit val sqlCtx = spark.sqlContext
    StreamOps.useRocksDbStateStore(spark) // transformWithState requires it
    try {
      val input = MemoryStream[StreamOps.UserEvent]
      val q = StreamOps.runningTotalsTws(input.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(StreamOps.UserEvent(1L, ts(0), 1.0))
        q.processAllAvailable()
        input.addData(
          StreamOps.UserEvent(1L, ts(10), 2.0), StreamOps.UserEvent(2L, ts(11), 7.0))
        q.processAllAvailable()
        val last = spark.sql("SELECT user_id, n_events, sum_value FROM tws")
          .as[(Long, Long, Double)].collect()
          .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
        // identical to what runningTotals (mapGroupsWithState) produces
        assert(last(1L) == ((1L, 2L, 3.0)))
        assert(last(2L) == ((2L, 1L, 7.0)))
      } finally q.stop()
    } finally StreamOps.useDefaultStateStore(spark)
  }

  test("transformWithState accepts a TTL (ProcessingTime mode engages)") {
    implicit val sqlCtx = spark.sqlContext
    StreamOps.useRocksDbStateStore(spark)
    try {
      val input = MemoryStream[StreamOps.UserEvent]
      input.addData(
        StreamOps.UserEvent(1L, ts(0), 2.0), StreamOps.UserEvent(1L, ts(5), 3.0))
      // under ProcessingTime time mode the engine schedules timer
      // batches continuously, so neither processAllAvailable nor
      // AvailableNow ever quiesces — poll the sink for the first
      // processed batch instead
      val q = StreamOps.runningTotalsTws(input.toDS(),
          ttl = Some(java.time.Duration.ofHours(1)))
        .writeStream.format("memory").queryName("twsttl")
        .outputMode(OutputMode.Update()).start()
      try {
        val deadline = System.currentTimeMillis() + 120000
        def rows() = spark.sql(
          "SELECT n_events, sum_value FROM twsttl WHERE n_events = 2")
          .as[(Long, Double)].collect()
        while (rows().isEmpty && System.currentTimeMillis() < deadline) {
          q.exception.foreach(throw _)
          Thread.sleep(200)
        }
        assert(rows().headOption.contains((2L, 5.0)), s"got ${rows().toSeq}")
      } finally q.stop()
    } finally StreamOps.useDefaultStateStore(spark)
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
