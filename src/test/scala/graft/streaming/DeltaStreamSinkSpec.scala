package graft.streaming

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaLog, DeltaWrite}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class DeltaStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sinkFmt = classOf[DeltaStreamSinkProvider].getName
  private val srcFmt = classOf[DeltaStreamSourceProvider].getName

  test("streaming writes land as delta commits with txn markers") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("delta-sink").toString + "/t"
    val ckpt = tempDir("delta-sink-c").toString
    val input = MemoryStream[(Long, String)]

    val q = input.toDF().toDF("id", "grp").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "spec-app")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.txns.get("spec-app").exists(_ >= 1L), snap.txns)
    val got = spark.read.schema(snap.schema)
      .parquet(snap.files.map(f => dir + "/" + f.path): _*)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("merge mode upserts by key with exactly-once batch markers") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("delta-sink-merge").toString + "/t"
    val ckpt = tempDir("delta-sink-merge-c").toString
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), dir)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "grp").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "merge-app")
      .option("mode", "merge").option("keyCols", "id")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((2L, "B2"), (3L, "c"))
      q.processAllAvailable()
      input.addData((1L, "A3"))
      q.processAllAvailable()
    } finally q.stop()

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.txns.get("merge-app").exists(_ >= 1L), snap.txns)
    assert(new graft.tables.DeltaTable("t", dir)(spark, graft.tables.ReadArgs())
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "A3"), (2L, "B2"), (3L, "c")))
  }

  test("streaming appends to a row-tracked table mint row ids batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("delta-sink-rt").toString + "/t"
    val ckpt = tempDir("delta-sink-rt-c").toString
    import graft.tables.DeltaWrite
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "grp"), dir)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableRowTracking" -> "true"))

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "grp").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "rt-app")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val t = new graft.tables.DeltaTable("t", dir)
    val ids = t(spark, graft.tables.ReadArgs(extra = Map(t.RowIdsKey -> true)))
      .select("id", "_row_id").as[(Long, Option[Long])].collect().toMap
    assert(ids.keySet == Set(1L, 2L, 3L))
    val assigned = ids.values.map(_.get).toSeq
    assert(assigned.sorted == Seq(0L, 1L, 2L)) // contiguous across batches
    assert(graft.tables.DeltaLog.snapshot(spark, dir).rowIdHighWaterMark == 2L)
  }

  test("a replayed batch id is skipped — exactly-once") {
    val dir = tempDir("delta-sink-once").toString + "/t"
    val sink = new DeltaStreamSink(spark, dir, Seq.empty, "app-x")
    def batch(rows: Seq[(Long, String)]) = {
      val df = rows.toDF("id", "grp")
      // hand the sink a plain batch frame the way the engine would
      org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
        spark, df.queryExecution.toRdd, df.schema, isStreaming = false)
    }
    sink.addBatch(0L, batch(Seq((1L, "a"))))
    sink.addBatch(0L, batch(Seq((1L, "a"))))   // crash-replay of batch 0
    sink.addBatch(1L, batch(Seq((2L, "b"))))
    sink.addBatch(0L, batch(Seq((9L, "z"))))   // stale replay after batch 1

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == 1L, s"duplicate commits: version ${snap.version}")
    assert(snap.txns("app-x") == 1L)
    val rows = spark.read.schema(snap.schema)
      .parquet(snap.files.map(f => dir + "/" + f.path): _*)
      .select("id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L))
  }

  test("txn high-water marks survive checkpoint replay") {
    val dir = tempDir("delta-sink-cp").toString + "/t"
    val sink = new DeltaStreamSink(spark, dir, Seq.empty, "app-cp")
    sink.addBatch(0L, Seq((1L, "a")).toDF("id", "grp"))
    val cpV = DeltaWrite.checkpoint(spark, dir)
    // age out the JSON prefix: the checkpoint is now the only history
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpV).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(dir + "/_delta_log", f"$v%020d.json"), false))
    assert(DeltaLog.snapshot(spark, dir).txns("app-cp") == 0L)
    // replay of batch 0 is still recognized as committed
    sink.addBatch(0L, Seq((9L, "z")).toDF("id", "grp"))
    assert(DeltaLog.snapshot(spark, dir).version == cpV)
  }

  test("delta-to-delta pipeline: stream from one table into another") {
    val src = tempDir("delta-pipe-src").toString + "/t"
    val dst = tempDir("delta-pipe-dst").toString + "/t"
    val ckpt = tempDir("delta-pipe-c").toString
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), src)

    val q = spark.readStream.format(srcFmt).option("path", src).load()
      .withColumn("id2", col("id") * 10)
      .writeStream.format(sinkFmt)
      .option("path", dst).option("txnAppId", "pipe")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "grp"), src)
      q.processAllAvailable()
    } finally q.stop()

    val snap = DeltaLog.snapshot(spark, dst)
    val got = spark.read.schema(snap.schema)
      .parquet(snap.files.map(f => dst + "/" + f.path): _*)
      .select("id2").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 20L, 30L))
  }

  test("CDF-mode source streams typed change rows including deletes") {
    val dir = tempDir("delta-cdf-stream").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "grp").coalesce(1),
      dir, partitionBy = Seq("grp"))                                               // v0
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableChangeDataFeed" -> "true")) // v1
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("grp", "=", "a")))) // v2 cdc

    val q = spark.readStream.format(srcFmt)
      .option("path", dir).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdfs")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql("SELECT id, _change_type, _commit_version FROM cdfs")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "insert", 0L), (2L, "insert", 0L), (1L, "delete", 2L)), s"got $got")
  }
}
