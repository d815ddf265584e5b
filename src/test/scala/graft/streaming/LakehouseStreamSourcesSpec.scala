package graft.streaming

import graft.SparkSpec
import graft.tables.{HudiWrite, IcebergWrite}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming incremental sources over native Iceberg and Hudi
  * tables: initial full batch, incremental tailing, and
  * checkpoint-restart resume — the E42 Delta-source contract for the
  * other two formats.
  */
class LakehouseStreamSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val iceFmt = classOf[IcebergStreamSourceProvider].getName
  private val hudiFmt = classOf[HudiStreamSourceProvider].getName

  test("iceberg: full first batch, then tails appends incrementally") {
    val dir = tempDir("ice-stream").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), dir)

    val q = spark.readStream.format(iceFmt).option("path", dir).load()
      .writeStream.format("memory").queryName("isrc")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM isrc").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L))
      IcebergWrite.append(spark, Seq((4L, "d"), (5L, "e")).toDF("id", "v"), dir)
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM isrc").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("iceberg: checkpoint restart resumes after the committed snapshot") {
    val dir = tempDir("ice-stream-ckpt").toString + "/t"
    val ckpt = tempDir("ice-stream-ckpt-c").toString
    val out = tempDir("ice-stream-ckpt-o").toString
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)

    def drain(): Unit = {
      val q = spark.readStream.format(iceFmt).option("path", dir).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a")))
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), dir)
    drain() // resumes from the checkpoint: rows 2,3 only are appended
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("hudi: full first batch, then upsert deltas — including MOR log records") {
    val dir = tempDir("hudi-stream").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), dir, "id",
      tableType = "MERGE_ON_READ")

    val q = spark.readStream.format(hudiFmt).option("path", dir).load()
      .writeStream.format("memory").queryName("hsrc")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id, v FROM hsrc").as[(Long, String)]
        .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
      // the update lands as a LOG file; the stream must surface it
      HudiWrite.upsert(spark, Seq((2L, "B2"), (9L, "i")).toDF("id", "v"), dir)
      q.processAllAvailable()
      assert(spark.sql("SELECT id, v FROM hsrc").as[(Long, String)]
        .collect().sortBy(t => (t._1, t._2)).toSeq ==
        Seq((1L, "a"), (2L, "B2"), (2L, "b"), (9L, "i")))
    } finally q.stop()
  }

  test("cross-format pipeline: delta source feeds the iceberg upsert sink through restarts") {
    val src = tempDir("xfmt-delta").toString + "/t"
    val dst = tempDir("xfmt-ice").toString + "/t"
    val ckpt = tempDir("xfmt-ckpt").toString
    graft.tables.DeltaWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)

    def run(): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaStreamSourceProvider].getName)
        .option("path", src).load()
        .writeStream
        .format(classOf[IcebergStreamSinkProvider].getName)
        .option("path", dst).option("txnAppId", "xfmt")
        .option("mode", "upsert").option("keyCols", "id")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    run()
    val t = new graft.tables.IcebergTable("t", dst)
    assert(t(spark, graft.tables.ReadArgs.empty)
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // new delta versions flow as upserts: key 2 converges, key 3 lands
    graft.tables.DeltaWrite.append(spark,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), src)
    run()
    assert(t(spark, graft.tables.ReadArgs.empty)
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("iceberg: upsertChanges mode tails equality-upsert commits as latest-per-changed-key") {
    val dir = tempDir("ice-stream-up").toString + "/t"
    val ckpt = tempDir("ice-stream-up-c").toString
    val out = tempDir("ice-stream-up-o").toString
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)

    def drain(): Unit = {
      val q = spark.readStream.format(iceFmt).option("path", dir)
        .option("upsertChanges", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // two upsert commits land in ONE catch-up batch: the changed
    // keys' LATEST values only — the second commit's equality delete
    // supersedes the first's version of key 3 within the range
    IcebergWrite.upsertEquality(spark,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), dir, Seq("id"))
    IcebergWrite.upsertEquality(spark, Seq((3L, "c3")).toDF("id", "v"), dir, Seq("id"))
    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "B2"), (2L, "b"), (3L, "c3")))
  }

  test("iceberg: upsertChanges stream survives a rewrite + DV commit (net-rows fold)") {
    val dir = tempDir("ice-stream-dv").toString + "/t"
    val ckpt = tempDir("ice-stream-dv-c").toString
    val out = tempDir("ice-stream-dv-o").toString
    IcebergWrite.append(spark,
      (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)

    def drain(): Unit = {
      val q = spark.readStream.format(iceFmt).option("path", dir)
        .option("upsertChanges", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    assert(spark.read.parquet(out).count() == 4)

    // one catch-up range containing a COMPACTION (rewrite) and a v3
    // DELETION-VECTOR delete: both previously refused the stream dead;
    // the net-rows fold serves the appended survivors instead
    graft.tables.IcebergMaintenance.rewriteDataFiles(spark, dir)
    IcebergWrite.append(spark,
      Seq((5L, "x5"), (6L, "x6")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.deleteWhereDv(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "in", Seq(1L, 5L)))))
    drain()
    // net new rows of the range: {5,6} ∖ {5 deleted in-range} = {6};
    // the delete of pre-existing id 1 is not an append — ignored
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      (1L to 4L).map(i => (i, s"v$i")) :+ ((6L, "x6")))
  }

  test("hudi: checkpoint restart resumes after the committed instant") {
    val dir = tempDir("hudi-stream-ckpt").toString + "/t"
    val ckpt = tempDir("hudi-stream-ckpt-c").toString
    val out = tempDir("hudi-stream-ckpt-o").toString
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")

    def drain(): Unit = {
      val q = spark.readStream.format(hudiFmt).option("path", dir).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    HudiWrite.upsert(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    HudiWrite.upsert(spark, Seq((3L, "c")).toDF("id", "v"), dir)
    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
