package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

class DeltaIctSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ictOf(path: String, version: Long): Option[Long] =
    DeltaLog.inCommitTimestampOf(fs(path),
      new Path(DeltaLog.logDir(path), f"$version%020d.json"))

  test("tables created with ICT stamp every commit, strictly monotonic") {
    val path = tempDir("ict_new").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType))),
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))
    val pr = DeltaLog.snapshot(spark, path).protocol
    assert(pr.minWriterVersion === 7)
    assert(pr.writerFeatures.exists(_.contains("inCommitTimestamp")))

    DeltaWrite.append(spark, Seq(1L).toDF("id"), path)
    DeltaWrite.append(spark, Seq(2L).toDF("id"), path)
    DeltaWrite.append(spark, Seq(3L).toDF("id"), path)
    val icts = (0L to 3L).map(v => ictOf(path, v))
    assert(icts.forall(_.isDefined), s"every commit must carry an ICT: $icts")
    val vals = icts.map(_.get)
    assert(vals === vals.sorted && vals.distinct === vals, s"not strictly increasing: $vals")
  }

  test("timestampAsOf resolves by in-commit timestamp, not file mtime") {
    val path = tempDir("ict_asof").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType))),
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWrite.append(spark, Seq(1L).toDF("id"), path) // v1
    DeltaWrite.append(spark, Seq(2L).toDF("id"), path) // v2
    val ict1 = ictOf(path, 1L).get
    val ict2 = ictOf(path, 2L).get

    // sabotage the file mtimes (a log copy/restore would do this):
    // mtime says "both ancient" — ICT must still win
    val f = fs(path)
    (0L to 2L).foreach { v =>
      f.setTimes(new Path(DeltaLog.logDir(path), f"$v%020d.json"), 1000L, -1)
    }
    assert(DeltaLog.versionAtTimestamp(spark, path, ict1) === 1L)
    assert(DeltaLog.versionAtTimestamp(spark, path, ict2 - 1) === 1L)
    assert(DeltaLog.versionAtTimestamp(spark, path, ict2) === 2L)
  }

  test("enabling ICT on an existing table upgrades the protocol and records provenance") {
    val path = tempDir("ict_enable").toString + "/t"
    DeltaWrite.append(spark, Seq(1L).toDF("id"), path) // v0, no ICT
    assert(ictOf(path, 0L).isEmpty)

    DeltaWrite.setTableProperties(spark, path,
      Map("delta.enableInCommitTimestamps" -> "true")) // v1
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.protocol.minWriterVersion === 7)
    assert(snap.protocol.writerFeatures.exists(_.contains("inCommitTimestamp")))
    // legacy-implied features survive the v7 upgrade
    assert(snap.protocol.writerFeatures.exists(_.contains("appendOnly")))
    assert(snap.metadata.configuration("delta.inCommitTimestampEnablementVersion") === "1")
    assert(snap.metadata.configuration.contains("delta.inCommitTimestampEnablementTimestamp"))
    assert(ictOf(path, 1L).isDefined, "the enabling commit itself is stamped")

    DeltaWrite.append(spark, Seq(2L).toDF("id"), path) // v2
    assert(ictOf(path, 2L).exists(_ > ictOf(path, 1L).get))
  }

  test("DDL commits on ICT tables are stamped too") {
    val path = tempDir("ict_ddl").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType), StructField("qty", LongType))),
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWrite.append(spark, Seq((1L, 5L)).toDF("id", "qty"), path) // v1
    DeltaDdl.addCheckConstraint(spark, path, "qty_pos", "qty > 0")  // v2
    assert(ictOf(path, 2L).exists(_ >= ictOf(path, 1L).get))
  }
}
