package graft.streaming

import graft.SparkSpec
import graft.tables.{IcebergTable, IcebergWrite, ReadArgs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Exactly-once Iceberg streaming sink: txn markers in snapshot
  * summaries, replayed batches skipped, upsert mode converging to
  * latest-per-key.
  */
class IcebergStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sinkFmt = classOf[IcebergStreamSinkProvider].getName

  test("streaming appends land as iceberg snapshots with txn markers") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("ice-sink").toString + "/t"
    val ckpt = tempDir("ice-sink-c").toString
    val input = MemoryStream[(Long, String)]

    val q = input.toDF().toDF("id", "v").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "spec-app")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    assert(IcebergWrite.lastCommittedBatch(spark, dir, "spec-app").exists(_ >= 1L))
    assert(new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("a replayed batch id is skipped, not duplicated") {
    val dir = tempDir("ice-sink-replay").toString + "/t"
    val sink = new IcebergStreamSink(spark, dir, Seq.empty, "replay-app",
      upsertKeys = None)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink.addBatch(0L, batch)
    sink.addBatch(0L, batch) // crash-replay of the same id
    val t = new IcebergTable("t", dir)
    assert(t(spark, ReadArgs.empty).count() == 2)
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "v"))
    assert(t(spark, ReadArgs.empty).count() == 3)
  }

  test("upsert mode converges to latest-per-key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("ice-sink-up").toString + "/t"
    val ckpt = tempDir("ice-sink-up-c").toString
    val input = MemoryStream[(Long, String)]

    val q = input.toDF().toDF("id", "v").writeStream
      .format(sinkFmt).option("path", dir).option("txnAppId", "up-app")
      .option("mode", "upsert").option("keyCols", "id")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((2L, "B2"), (3L, "c"))
      q.processAllAvailable()
      input.addData((1L, "A3"))
      q.processAllAvailable()
    } finally q.stop()

    assert(new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "A3"), (2L, "B2"), (3L, "c")))
  }
}
