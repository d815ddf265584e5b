package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._

/** Parity between the distributed file-state reconstruction
  * ([[DeltaFilesDataset.filesDataset]]) and the driver-side replay
  * ([[DeltaLog.snapshot]]) across the log shapes that exercise every
  * reconciliation rule: plain appends, copy-on-write DELETE (remove
  * wins), DV DELETE (same-version remove+re-add — add wins), OPTIMIZE
  * rewrites, row-tracking ids, classic and v2 checkpoints, time
  * travel.
  */
class DeltaFilesDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def key(f: DeltaLog.AddFile): (String, Long, Option[String], Long, Option[Long]) =
    (f.path, f.size, f.dv.map(d => s"${d.storageType}:${d.pathOrInlineDv}:${d.cardinality}"),
      f.dv.map(_.cardinality).getOrElse(0L), f.baseRowId)

  private def datasetKeys(path: String, versionAsOf: Option[Long] = None) =
    DeltaFilesDataset.filesDataset(spark, path, versionAsOf)
      .select("path", "size", "deletionVector.storageType",
        "deletionVector.pathOrInlineDv", "deletionVector.cardinality", "baseRowId")
      .collect()
      .map(r => (
        r.getString(0), r.getLong(1),
        Option(r.getString(2)).map(st => s"$st:${r.getString(3)}:${r.getLong(4)}"),
        if (r.isNullAt(4)) 0L else r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSet

  private def snapshotKeys(path: String, versionAsOf: Option[Long] = None) =
    DeltaLog.snapshot(spark, path, versionAsOf).files.map(key).toSet

  private def assertParity(path: String, versionAsOf: Option[Long] = None): Unit = {
    val ds = datasetKeys(path, versionAsOf)
    val snap = snapshotKeys(path, versionAsOf)
    assert(ds == snap,
      s"dataset-vs-replay mismatch at $path (v=$versionAsOf):\n  only dataset: " +
        s"${ds -- snap}\n  only replay: ${snap -- ds}")
    assert(ds.nonEmpty || snap.isEmpty)
  }

  test("parity across appends, cow delete, DV delete, optimize, checkpoint") {
    val dir = tempDir("fds-core").toString + "/t"
    (0 until 4).foreach(i =>
      DeltaWrite.append(spark,
        Seq.tabulate(50)(j => (i * 50L + j, s"v$i-$j")).toDF("id", "v"), dir))
    assertParity(dir)

    // copy-on-write DELETE: removes + rewrites
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("id", "<", 20))))
    assertParity(dir)

    // DV DELETE: same-version remove + re-add of the same path (add wins)
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("id", "<", 60))))
    assertParity(dir)

    // second DV delete replaces descriptors
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("id", "<", 80))))
    assertParity(dir)

    // OPTIMIZE: rewrite with dataChange=false (purges DVs)
    DeltaWrite.optimize(spark, dir)
    assertParity(dir)

    // classic checkpoint, then more commits on top
    DeltaWrite.checkpoint(spark, dir)
    DeltaWrite.append(spark, Seq((999L, "tail")).toDF("id", "v"), dir)
    assertParity(dir)

    // time travel to every version the log still covers
    val latest = DeltaLog.latestVersion(spark, dir).get
    (0L to latest).foreach(v => assertParity(dir, Some(v)))
  }

  test("parity on a row-tracked table (baseRowId carried through)") {
    val dir = tempDir("fds-rt").toString + "/t"
    DeltaDdl.createTable(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))),
      configuration = Map(
        "delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_mat_rid",
        "delta.rowTracking.materializedRowCommitVersionColumnName" -> "_mat_rcv"))
    DeltaWrite.append(spark, Seq(1L, 2L, 3L).toDF("id"), dir)
    DeltaWrite.append(spark, Seq(4L, 5L).toDF("id"), dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.files.forall(_.baseRowId.isDefined))
    assertParity(dir)
  }

  test("parity through a v2 manifest+sidecar checkpoint") {
    val dir = tempDir("fds-v2").toString + "/t"
    (0 until 3).foreach(i =>
      DeltaWrite.append(spark, Seq((i.toLong, s"x$i")).toDF("id", "v"), dir))
    DeltaWrite.checkpointV2(spark, dir)
    DeltaWrite.append(spark, Seq((99L, "after")).toDF("id", "v"), dir)
    assertParity(dir)
    // aged-out JSON prefix: both paths enter through the checkpoint
    val log = new java.io.File(dir, "_delta_log")
    (0L to 2L).foreach(v => new java.io.File(log, f"$v%020d.json").delete())
    assertParity(dir)
  }

  test("refuses a log hole exactly like the replay") {
    val dir = tempDir("fds-hole").toString + "/t"
    (0 until 3).foreach(i =>
      DeltaWrite.append(spark, Seq((i.toLong, "x")).toDF("id", "v"), dir))
    new java.io.File(new java.io.File(dir, "_delta_log"), f"${1L}%020d.json").delete()
    val e = intercept[IllegalArgumentException] {
      DeltaFilesDataset.filesDataset(spark, dir).collect()
    }
    assert(e.getMessage.contains("no commits for versions"))
  }
}
