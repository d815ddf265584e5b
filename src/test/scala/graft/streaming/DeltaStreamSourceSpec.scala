package graft.streaming

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.DeltaWrite
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}

class DeltaStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[DeltaStreamSourceProvider].getName

  private def readStream(dir: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format(fmt).option("path", dir)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("streams existing versions, then tails new appends incrementally") {
    val dir = tempDir("delta-src").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), dir)     // v0
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "grp"), dir)                // v1

    val q = readStream(dir).writeStream
      .format("memory").queryName("dsrc").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM dsrc").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L))

      DeltaWrite.append(spark, Seq((4L, "d"), (5L, "e")).toDF("id", "grp"), dir)   // v2
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM dsrc").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the current log and terminates") {
    val dir = tempDir("delta-src-an").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), dir)     // v0
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "grp"), dir)                // v1

    val q = readStream(dir).writeStream
      .format("memory").queryName("dsrc_an").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(spark.sql("SELECT id FROM dsrc_an").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))

    // data arriving AFTER the drain is not consumed by the finished run
    DeltaWrite.append(spark, Seq((4L, "d")).toDF("id", "grp"), dir)                // v2
    assert(spark.sql("SELECT id FROM dsrc_an").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("foreachBatch: delta→delta pipeline with exactly-once batch markers") {
    val src = tempDir("delta-src-feb").toString + "/t"
    val dst = tempDir("delta-dst-feb").toString + "/t"
    val ckpt = tempDir("delta-feb-ckpt").toString
    DeltaWrite.append(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), src)

    def run(): Unit = {
      val q = readStream(src).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // the txn marker makes a replayed batch detectable; a real
          // resume-after-crash would check snapshot.txns before writing
          val agg = batch.groupBy("id").sum("v").withColumnRenamed("sum(v)", "v_sum")
          DeltaWrite.append(spark, agg, dst, txn = Some(("feb-app", batchId)))
          () // foreachBatch wants Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    run()
    val snap = graft.tables.DeltaLog.snapshot(spark, dst)
    assert(snap.txns.get("feb-app").contains(0L), "batch marker must be recorded")
    assert(new graft.tables.DeltaTable("d", dst)(spark, graft.tables.ReadArgs())
      .orderBy("id").as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))

    DeltaWrite.append(spark, Seq((3L, 30L)).toDF("id", "v"), src)
    run() // restart from the checkpoint: only the new version flows
    assert(new graft.tables.DeltaTable("d", dst)(spark, graft.tables.ReadArgs())
      .orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("restart from checkpoint resumes after the last committed version") {
    val dir = tempDir("delta-src-ckpt").toString + "/t"
    val ckpt = tempDir("delta-src-ckpt-c").toString
    val out = tempDir("delta-src-ckpt-o").toString
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "grp"), dir)                // v0

    def run(): Unit = {
      val q = readStream(dir).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq == Seq(1L))

    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "grp"), dir)                // v1
    // same checkpoint: the restarted query emits ONLY the new version
    run()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("startingVersion skips history") {
    val dir = tempDir("delta-src-sv").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "grp"), dir)                // v0
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "grp"), dir)                // v1
    val q = readStream(dir, Map("startingVersion" -> "1")).writeStream
      .format("memory").queryName("dsrc_sv").outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.sql("SELECT id FROM dsrc_sv").as[Long].collect().toSeq == Seq(2L))
  }

  test("OPTIMIZE rewrites (dataChange=false) are invisible to the stream") {
    val dir = tempDir("delta-src-opt").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "grp"), dir)                // v0
    DeltaWrite.append(spark, Seq((2L, "a")).toDF("id", "grp"), dir)                // v1
    assert(DeltaWrite.optimize(spark, dir, smallFileBytes = 1L << 30).filesRemoved > 0) // v2
    DeltaWrite.append(spark, Seq((3L, "a")).toDF("id", "grp"), dir)                // v3
    // no ignore options needed: the rewrite carries dataChange=false
    val q = readStream(dir).writeStream.format("memory").queryName("dsrc_opt")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.sql("SELECT id FROM dsrc_opt").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("delete-only commits refuse without ignoreDeletes, skip with it") {
    val dir = tempDir("delta-src-del").toString + "/t"
    // partitioned by grp so the delete prunes to exactly the 'a'
    // partition and drops its whole file — a remove-only commit
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp").coalesce(1),
      dir, partitionBy = Seq("grp"))                                               // v0
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("grp", "=", "a")))) // v1

    val strict = readStream(dir).writeStream
      .format("memory").queryName("dsrc_strict").outputMode(OutputMode.Append()).start()
    val e = intercept[StreamingQueryException] {
      strict.processAllAvailable(); strict.stop()
    }
    assert(e.getMessage.contains("ignoreDeletes") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")), e.getMessage)
    strict.stop()

    val tolerant = readStream(dir, Map("ignoreDeletes" -> "true")).writeStream
      .format("memory").queryName("dsrc_tol").outputMode(OutputMode.Append()).start()
    try { tolerant.processAllAvailable() } finally tolerant.stop()
    assert(spark.sql("SELECT id FROM dsrc_tol").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("maxFilesPerTrigger drains a backlog in bounded batches, never stalls") {
    val dir = tempDir("delta-src-rate").toString + "/t"
    // 4 commits x 2 files each = 8 files of backlog
    (0 until 4).foreach { i =>
      DeltaWrite.append(spark,
        Seq((i * 2L, "a"), (i * 2L + 1L, "b")).toDF("id", "grp").repartition(2), dir)
    }
    val q = readStream(dir, Map("maxFilesPerTrigger" -> "2")).writeStream
      .format("memory").queryName("dsrc_rate").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // everything arrives...
      assert(spark.sql("SELECT id FROM dsrc_rate").as[Long].collect().sorted.toSeq ==
        (0L to 7L))
      // ...across >= 4 micro-batches (2 files per trigger = 1 commit each),
      // not one giant catch-up batch
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4, s"expected >=4 bounded batches, got $dataBatches")

      // steady-state: a jumbo commit (4 files > budget) is admitted whole
      DeltaWrite.append(spark,
        (8L to 11L).map((_, "c")).toDF("id", "grp").repartition(4), dir)
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM dsrc_rate").as[Long].collect().sorted.toSeq ==
        (0L to 11L))
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds batches by admitted file size") {
    val dir = tempDir("delta-src-bytes").toString + "/t"
    (0 until 3).foreach { i =>
      DeltaWrite.append(spark, Seq((i.toLong, "x" * 100)).toDF("id", "pad"), dir)
    }
    // 1-byte budget -> one commit per batch (first version always admits)
    val q = readStream(dir, Map("maxBytesPerTrigger" -> "1")).writeStream
      .format("memory").queryName("dsrc_bytes").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM dsrc_bytes").as[Long].collect().sorted.toSeq ==
        Seq(0L, 1L, 2L))
      assert(q.recentProgress.count(_.numInputRows > 0) == 3)
    } finally q.stop()
  }
}
