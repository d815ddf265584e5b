package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path

/** checkpointV2Distributed: the driver never holds the file list —
  * replay parity with the driver-side V2 writer is the contract.
  */
class CheckpointDistributedSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("manifest + executor-written sidecars replay an aged-out JSON prefix") {
    val dir = tempDir("dcp").toString + "/t"
    (0 until 3).foreach { i =>
      DeltaWrite.append(spark,
        (1 to 10).map(j => ((i * 10 + j).toLong, s"v$i-$j")).toDF("id", "v"), dir)
    }
    // DVs, row-level delete, domains and txn marks must all survive
    DeltaWrite.deleteWhereDv(spark, dir,
      Filters.normalize(Seq(Filter("id", "<=", 5L))))
    DeltaWrite.append(spark, Seq((100L, "x")).toDF("id", "v"), dir,
      txn = Some(("dcp-app", 7L)))
    val before = DeltaLog.snapshot(spark, dir)
    val expected = new DeltaTable("t", dir)(spark)
      .select("id").as[Long].collect().sorted.toSeq

    val cpV = DeltaWrite.checkpointV2Distributed(spark, dir, sidecars = 3)
    assert(cpV == before.version)
    val f = fs(dir)
    (0L to cpV).foreach(v =>
      f.delete(new Path(dir + "/_delta_log", f"$v%020d.json"), false))

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == cpV)
    assert(snap.protocol.readerFeatures.exists(_.contains("v2Checkpoints")))
    assert(snap.protocol.readerFeatures.exists(_.contains("deletionVectors")))
    assert(snap.txns.get("dcp-app").contains(7L)) // txn marks survive
    val got = new DeltaTable("t", dir)(spark)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
    // tombstones still guard vacuum retention after the prefix is gone
    assert(DeltaWrite.vacuum(spark, dir, retentionMs = 3600L * 1000) == 0)
  }

  test("parity with the driver-side V2 writer: identical replayed state") {
    val a = tempDir("dcp-par-a").toString + "/t"
    val b = tempDir("dcp-par-b").toString + "/t"
    Seq(a, b).foreach { d =>
      DeltaWrite.append(spark,
        (1 to 20).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part"), d,
        partitionBy = Seq("part"))
      DeltaWrite.setTableProperties(spark, d, Map("delta.enableRowTracking" -> "true"))
      DeltaWrite.append(spark, Seq((21L, "p0")).toDF("id", "part"), d)
      DeltaWrite.deleteWhere(spark, d, Filters.normalize(Seq(Filter("id", "=", 3L))))
    }
    DeltaWrite.checkpointV2(spark, a, sidecars = 2)
    DeltaWrite.checkpointV2Distributed(spark, b, sidecars = 2)
    Seq(a, b).foreach { d =>
      val f = fs(d)
      (0L to DeltaLog.snapshot(spark, d).version).foreach(v =>
        f.delete(new Path(d + "/_delta_log", f"$v%020d.json"), false))
    }
    val sa = DeltaLog.snapshot(spark, a)
    val sb = DeltaLog.snapshot(spark, b)
    assert(sa.files.size == sb.files.size)
    assert(sa.domains.keySet == sb.domains.keySet)
    assert(sa.rowIdHighWaterMark == sb.rowIdHighWaterMark)
    val ga = new DeltaTable("t", a)(spark).select("id").as[Long].collect().sorted.toSeq
    val gb = new DeltaTable("t", b)(spark).select("id").as[Long].collect().sorted.toSeq
    assert(ga == gb)
  }

  test("file state and tombstones pin to the checkpointed version") {
    val dir = tempDir("dcp-pin").toString + "/t"
    DeltaWrite.append(spark,
      (1 to 8).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val v0 = DeltaLog.snapshot(spark, dir).version
    // a later commit both removes files (tombstones) and adds new ones
    DeltaWrite.deleteWhere(spark, dir,
      Filters.normalize(Seq(Filter("id", "<=", 4L))))
    val pinnedFiles = DeltaFilesDataset.filesDataset(spark, dir,
      versionAsOf = Some(v0)).select("path").as[String].collect().toSet
    assert(pinnedFiles ==
      DeltaLog.snapshot(spark, dir, versionAsOf = Some(v0)).files.map(_.path).toSet)
    // tombstones pinned at v0 must not see the later delete's removes
    assert(DeltaLog.tombstones(spark, dir, versionAsOf = Some(v0)).isEmpty)
    assert(DeltaLog.tombstones(spark, dir).nonEmpty)
  }

  test("empty table checkpoints and replays") {
    val dir = tempDir("dcp-empty").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    val filesBefore = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet
    val cpV = DeltaWrite.checkpointV2Distributed(spark, dir)
    fs(dir).delete(new Path(dir + "/_delta_log", f"$cpV%020d.json"), false)
    // the zero-row staged file (Spark writes one even for an empty
    // frame) round-trips; the table still reads as empty
    assert(DeltaLog.snapshot(spark, dir).files.map(_.path).toSet == filesBefore)
    assert(new DeltaTable("t", dir)(spark).count() == 0L)
  }
}
