package graft.streaming

import graft.SparkSpec
import graft.tables.{HudiTable, HudiWrite, ReadArgs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Exactly-once Hudi streaming upsert sink: txn markers in commit
  * extraMetadata, replayed batches skipped, MOR log-append writes.
  */
class HudiStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sinkFmt = classOf[HudiStreamSinkProvider].getName

  test("streaming upserts converge to latest-per-key on a MOR table via log appends") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("hudi-sink").toString + "/t"
    val ckpt = tempDir("hudi-sink-c").toString
    HudiWrite.bulkInsert(spark,
      Seq((1L, "seed")).toDF("id", "v").repartition(1), dir, "id",
      tableType = "MERGE_ON_READ")

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "spec-app")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a1"), (2L, "b"))
      q.processAllAvailable()
      input.addData((1L, "a2"))
      q.processAllAvailable()
    } finally q.stop()

    assert(HudiWrite.lastCommittedBatch(spark, dir, "spec-app").exists(_ >= 1L))
    assert(new HudiTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a2"), (2L, "b")))
    // the updates landed as log files, not base rewrites
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var logs = 0
    while (it.hasNext) if (it.next().getPath.getName.contains(".log.")) logs += 1
    assert(logs >= 1)
  }

  test("a replayed batch id is skipped, not duplicated") {
    val dir = tempDir("hudi-sink-replay").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "seed")).toDF("id", "v"), dir, "id")
    val sink = new HudiStreamSink(spark, dir, "replay-app")
    val batch = Seq((2L, "b")).toDF("id", "v")
    sink.addBatch(0L, batch)
    sink.addBatch(0L, batch) // crash-replay
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).count() == 2)
    // idempotence is per-app: a different app id writes
    new HudiStreamSink(spark, dir, "other-app")
      .addBatch(0L, Seq((3L, "c")).toDF("id", "v"))
    assert(t(spark, ReadArgs.empty).count() == 3)
  }
}
