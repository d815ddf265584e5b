package graft.operators

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaDdl, DeltaTable, DeltaWrite, HudiWrite, IcebergTable, IcebergWrite, ReadArgs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuous replication ([[Replicate.stream]]): the stream's first
  * batch creates the replica, later batches apply folded net
  * changes, checkpoint restarts resume exactly-once, replayed batch
  * ids are skipped via the epoch marker, and foreign targets refuse.
  */
class ReplicateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, off: Int = 0) =
    Seq.tabulate(n)(i => ((i + off).toLong, s"name${i + off}", (i + off).toLong * 10))
      .toDF("id", "name", "v")

  private def mkDeltaSource(tag: String, n: Int = 20): String = {
    val dir = tempDir(s"replstream-$tag").toString + "/src"
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("v", LongType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, rows(n), dir)
    dir
  }

  private def readTarget(path: String): Set[(Long, String, Long)] = {
    val fmt = graft.tables.ChangeFeed.detectFormat(spark, path).get
    val df: DataFrame = fmt match {
      case "delta"   => new DeltaTable("t", path)(spark)
      case "iceberg" => new IcebergTable("t", path)(spark, ReadArgs.empty)
      case "hudi"    => new graft.tables.HudiTable("t", path)(spark, ReadArgs.empty)
    }
    df.select("id", "name", "v").as[(Long, String, Long)].collect().toSet
  }

  private def readSource(path: String): Set[(Long, String, Long)] = {
    val feed = graft.tables.ChangeFeed.forPath(spark, path)
    feed.snapshotAt(spark, feed.head(spark))
      .select("id", "name", "v").as[(Long, String, Long)].collect().toSet
  }

  private def runOnce(src: String, tgt: String, ckpt: String, format: String): Unit = {
    val q = Replicate.stream(spark, src, tgt, Seq("id"), format, ckpt).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("first batch creates an Iceberg replica; later batches fold churn; restart resumes") {
    val src = mkDeltaSource("d2i")
    val base = tempDir("replstream-d2i-t").toString
    val tgt = base + "/replica"
    val ckpt = base + "/ckpt"

    runOnce(src, tgt, ckpt, "iceberg")
    assert(readTarget(tgt) == readSource(src))
    val marker0 = Replicate.watermark(spark, tgt)
    assert(marker0.nonEmpty)

    // churn between runs: double-update one key, insert, delete two
    DeltaWrite.merge(spark, src,
      Seq((3L, "mid", 1L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.merge(spark, src,
      Seq((3L, "final", 2L), (100L, "new", 5L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "<", 2))))

    runOnce(src, tgt, ckpt, "iceberg")
    assert(readTarget(tgt) == readSource(src))
    assert(readTarget(tgt).exists { case (id, n, _) => id == 3L && n == "final" })
    assert(!readTarget(tgt).exists(_._1 < 2L))
    assert(Replicate.watermark(spark, tgt).get > marker0.get)
  }

  test("idle re-run applies nothing: the marker and snapshot count hold") {
    val src = mkDeltaSource("idle", n = 6)
    val base = tempDir("replstream-idle-t").toString
    val (tgt, ckpt) = (base + "/replica", base + "/ckpt")
    runOnce(src, tgt, ckpt, "delta")
    val marker = Replicate.watermark(spark, tgt)
    val version = graft.tables.DeltaLog.snapshot(spark, tgt, withFiles = false).version
    runOnce(src, tgt, ckpt, "delta") // no new source commits
    assert(Replicate.watermark(spark, tgt) == marker)
    assert(graft.tables.DeltaLog.snapshot(spark, tgt, withFiles = false).version == version,
      "an idle stream run must not commit to the replica")
    assert(readTarget(tgt) == readSource(src))
  }

  test("a fresh checkpoint replays batch 0 against an existing replica and skips it") {
    val src = mkDeltaSource("replay", n = 8)
    val base = tempDir("replstream-replay-t").toString
    val tgt = base + "/replica"
    runOnce(src, tgt, base + "/ckpt1", "delta")
    val version = graft.tables.DeltaLog.snapshot(spark, tgt, withFiles = false).version
    // new checkpoint → the stream re-delivers batch 0 (full snapshot);
    // the epoch marker (batchId 0 <= 0) skips the apply
    runOnce(src, tgt, base + "/ckpt2", "delta")
    assert(graft.tables.DeltaLog.snapshot(spark, tgt, withFiles = false).version == version)
    assert(readTarget(tgt) == readSource(src))
  }

  test("Hudi MOR source streams into a Hudi replica (tombstones fold to deletes)") {
    val base = tempDir("replstream-h2h").toString
    val (src, tgt, ckpt) = (base + "/src", base + "/replica", base + "/ckpt")
    HudiWrite.bulkInsert(spark, rows(10), src, "id", tableType = "MERGE_ON_READ")
    runOnce(src, tgt, ckpt, "hudi")
    assert(readTarget(tgt) == readSource(src))

    HudiWrite.upsert(spark,
      Seq((4L, "upserted", 44L), (200L, "new", 7L)).toDF("id", "name", "v"), src)
    HudiWrite.delete(spark, Seq(1L, 2L).toDF("id"), src)
    runOnce(src, tgt, ckpt, "hudi")
    assert(readTarget(tgt) == readSource(src))
    assert(!readTarget(tgt).exists(t => t._1 == 1L || t._1 == 2L))
    assert(readTarget(tgt).exists { case (id, n, _) => id == 4L && n == "upserted" })
  }

  test("a source evolution between runs reaches the replica on the next run") {
    val src = mkDeltaSource("evo", n = 5)
    val base = tempDir("replstream-evo-t").toString
    val (tgt, ckpt) = (base + "/replica", base + "/ckpt")
    runOnce(src, tgt, ckpt, "delta")

    // evolve + churn while the stream is down; the restart re-pins
    // the evolved schema and the apply evolves the replica
    graft.tables.DeltaDdl.addColumns(spark, src,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)))
    DeltaWrite.merge(spark, src,
      Seq((2L, "B", 22L, 200L), (9L, "new", 9L, 900L))
        .toDF("id", "name", "v", "score"), Seq("id"))
    runOnce(src, tgt, ckpt, "delta")

    val got = new DeltaTable("t", tgt)(spark)
      .select("id", "name", "score")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got.contains((2L, "B", Some(200L))))
    assert(got.contains((9L, "new", Some(900L))))
    assert(got.contains((0L, "name0", None)), "pre-evolution rows null-fill")
  }

  test("restart after a source DROP: Refuse stalls, Tombstone continues") {
    // a COLUMN-MAPPED delta source so the drop is possible
    val dir = tempDir("replstream-drop").toString + "/src"
    def mapped(name: String, dt: org.apache.spark.sql.types.DataType, id: Int) =
      StructField(name, dt, nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", id.toLong)
          .putString(graft.tables.DeltaLog.PhysicalNameKey, f"col-$id%02d").build())
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(mapped("id", LongType, 1), mapped("name", StringType, 2),
        mapped("v", LongType, 3))),
      configuration = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3"))
    DeltaWrite.append(spark, rows(5), dir)

    val base = tempDir("replstream-drop-t").toString
    val tgt = base + "/replica"
    val ckpt = base + "/ckpt"
    runOnce(dir, tgt, ckpt, "delta") // creates the replica with (id, name, v)

    // the source DROPS v between runs, then churns
    DeltaDdl.dropColumn(spark, dir, "v")
    DeltaWrite.merge(spark, dir, Seq((1L, "ONE")).toDF("id", "name"), Seq("id"))

    // default policy: the restarted stream's batch fails loudly
    val q1 = Replicate.stream(spark, dir, tgt, Seq("id"), "delta", ckpt).start()
    val e = intercept[Exception] { try q1.processAllAvailable() finally q1.stop() }
    assert(e.getMessage.contains("Tombstone") || 
      Option(e.getCause).exists(_.getMessage.contains("Tombstone")), e.getMessage)

    // Tombstone: the pipeline continues, replica keeps v as nulls for
    // churned rows and historical values elsewhere
    val q2 = Replicate.stream(spark, dir, tgt, Seq("id"), "delta", ckpt,
      onDrop = Replicate.DropPolicy.Tombstone).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = new DeltaTable("t", tgt)(spark)
      .select("id", "name", "v").as[(Long, String, Option[Long])].collect().toSet
    assert(got.contains((1L, "ONE", None)), s"tombstone apply missing: $got")
    assert(got.exists { case (i, _, v) => i != 1L && v.isDefined },
      s"historical values lost: $got")
  }

  test("existing target without the marker refuses; wrong-format target refuses") {
    val src = mkDeltaSource("foreign", n = 4)
    val base = tempDir("replstream-foreign-t").toString
    val foreign = base + "/foreign"
    DeltaWrite.append(spark, rows(3), foreign) // no appId marker
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(src, foreign, base + "/ckpt", "delta")
    }
    assert(e.getMessage.contains("marker") ||
      Option(e.getCause).exists(_.getMessage.contains("marker")))

    val ice = base + "/ice"
    IcebergWrite.append(spark, rows(3), ice)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(src, ice, base + "/ckpt2", "delta")
    }
    assert(e2.getMessage.contains("iceberg") ||
      Option(e2.getCause).exists(_.getMessage.contains("iceberg")))
  }
}
