package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Native Hudi MERGE_ON_READ: deltacommit log-file writes in the
  * upstream HoodieLogFormat, merged (base ∪ log, latest-per-key)
  * snapshot and incremental reads, compaction parity, and loud
  * refusals for the log shapes we cannot merge.
  */
class HudiMorSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listAll(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    val it = fs.listFiles(new Path(dir), true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) buf += it.next().getPath.toString
    buf.result()
  }

  test("MOR upsert appends upstream-named log files instead of rewriting base files") {
    val dir = tempDir("hudi-mor").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    val i2 = HudiWrite.upsert(spark,
      Seq((2L, "B", 0), (4L, "d", 1)).toDF("id", "v", "part"), dir)

    // timeline: both commits are deltacommits
    val names = fsOf(dir).listStatus(new Path(dir, ".hoodie"))
      .map(_.getPath.getName).toSet
    assert(names.contains(s"$i1.deltacommit"), names)
    assert(names.contains(s"$i2.deltacommit"), names)
    assert(!names.contains(s"$i2.commit"))

    // the update of id 2 wrote a LOG file into part=0, named
    // .<fileId>_<baseInstant>.log.<version>_<token>; part=0's base
    // file was NOT rewritten (still the i1 file)
    val files = listAll(dir)
    val logs = files.filter(_.contains(".log."))
    assert(logs.size == 1, files.mkString("\n"))
    assert(logs.head.matches(s".*/part=0/\\.[0-9a-f-]+_${i1}\\.log\\.1_0-0-0"), logs.head)
    assert(!files.exists(f => f.contains("part=0") && f.endsWith(s"_$i2.parquet")),
      "MOR upsert must not rewrite the base file")
    // the insert of id 4 opened a new base-file group in part=1
    assert(files.exists(f => f.contains("part=1") && f.endsWith(s"_$i2.parquet")))

    // merged snapshot: latest per key
    val t = new HudiTable("t", dir)
    val got = t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))

    // time travel to i1 excludes the log
    val v1 = t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("log block bytes follow the public HoodieLogFormat layout") {
    val dir = tempDir("hudi-mor-fmt").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A")).toDF("id", "v"), dir)
    val log = listAll(dir).find(_.contains(".log.")).get
    val fs = fsOf(dir)
    val in = fs.open(new Path(log))
    val magic = new Array[Byte](6)
    in.readFully(magic)
    assert(new String(magic, "UTF-8") == "#HUDI#")
    in.readLong() // block size
    assert(in.readInt() == 1, "log format version")
    assert(in.readInt() == HudiLog.AvroDataBlock, "block type ordinal")
    in.close()
    // block-level parse: instant + writer schema headers present,
    // avro content decodes to the updated row
    val blocks = HudiLog.readBlocks(fs, new Path(log))
    assert(blocks.size == 1)
    assert(blocks.head.header.contains(HudiLog.InstantTimeKey))
    val schemaJson = blocks.head.header(HudiLog.SchemaKey)
    assert(schemaJson.contains("\"record\""))
    val target = HudiWrite.readSlices(spark, dir,
      HudiWrite.allWrittenSlices(fsOf(dir), dir)).schema
    val rows = HudiLog.avroRows(blocks.head.content, schemaJson, target)
    assert(rows.size == 1)
    assert(rows.head.get(target.fieldIndex("v")) == "A")
  }

  test("sequential log upserts stack; latest instant wins per key; incremental sees log changes") {
    val dir = tempDir("hudi-mor-seq").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), dir, "id",
      tableType = "MERGE_ON_READ")
    val i2 = HudiWrite.upsert(spark, Seq((1L, "a2")).toDF("id", "v"), dir)
    val i3 = HudiWrite.upsert(spark, Seq((1L, "a3"), (2L, "b3")).toDF("id", "v"), dir)

    val files = listAll(dir)
    assert(files.count(_.contains(".log.")) == 2, files.mkString("\n"))
    // log versions increment on the same file group
    assert(files.exists(_.matches(s".*\\.log\\.1_0-0-0")), files.mkString("\n"))
    assert(files.exists(_.matches(s".*\\.log\\.2_0-0-0")), files.mkString("\n"))

    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a3"), (2L, "b3")))
    // as of i2: the first log applies, the second doesn't
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i2)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a2"), (2L, "b")))
    // incremental (i1, i2]: only the first log's row
    assert(t.incremental(spark, i1, Some(i2)).select("id", "v")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a2")))
    // incremental (i1, i3]: latest values of both changed keys,
    // exactly once (the i2 version of key 1 is superseded)
    assert(t.incremental(spark, i1, Some(i3)).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a3"), (2L, "b3")))
  }

  test("compaction folds logs into new base files; reads and commit times are preserved") {
    val dir = tempDir("hudi-mor-compact").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    val i2 = HudiWrite.upsert(spark,
      Seq((2L, "B", 0)).toDF("id", "v", "part"), dir)
    val t = new HudiTable("t", dir)
    val before = t(spark, ReadArgs.empty).select("id", "v", "part")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq

    val ic = HudiWrite.compact(spark, dir).get
    val after = t(spark, ReadArgs.empty).select("id", "v", "part")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(after == before)
    // compacted group serves the new base file; the log is no longer
    // an input; part=1 (log-free) was untouched
    val inputs = t(spark, ReadArgs.empty).inputFiles
    assert(inputs.exists(f => f.contains("part=0") && f.contains(s"_$ic.parquet")), inputs.toSeq)
    assert(!inputs.exists(_.contains(".log.")))
    assert(inputs.exists(f => f.contains("part=1") && f.contains(s"_$i1.parquet")), inputs.toSeq)
    // pure layout change: nothing incremental after the compaction
    assert(t.incremental(spark, i2).count() == 0)
    // ...and the log-borne update still reads as committed at i2
    assert(t.incremental(spark, i1, Some(i2)).select("id", "v")
      .as[(Long, String)].collect().toSeq == Seq((2L, "B")))
    // a second compact is a no-op
    assert(HudiWrite.compact(spark, dir).isEmpty)
  }

  test("MOR delete and cluster fold log records instead of dropping them") {
    val dir = tempDir("hudi-mor-del").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((2L, "B2"), (9L, "i")).toDF("id", "v"), dir)
    // key 9 exists ONLY in a base file of the new group; 2's latest
    // version exists only in the log — delete key 1, keep both
    HudiWrite.delete(spark, Seq(1L).toDF("id"), dir)
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "B2"), (9L, "i")))
    HudiWrite.cluster(spark, dir, Seq("id"))
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "B2"), (9L, "i")))
    assert(!t(spark, ReadArgs.empty).inputFiles.exists(_.contains(".log.")))
  }

  test("partition-scoped compaction folds only the selected partition's logs") {
    val dir = tempDir("hudi-mor-pc").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (11L, "x", 1)).toDF("id", "v", "part"), dir, "id",
      Seq("part"), tableType = "MERGE_ON_READ")
    // deltacommit upserts leave log files in BOTH partitions
    HudiWrite.upsert(spark,
      Seq((1L, "A", 0), (11L, "X", 1)).toDF("id", "v", "part"), dir)
    val fs = fsOf(dir)
    def loggedParts = HudiWrite.latestSlices(fs, dir, None)
      .filter(_.logFiles.nonEmpty).map(_.partition).toSet
    assert(loggedParts == Set("part=0", "part=1"))

    HudiWrite.compact(spark, dir, partitions = Some(Seq("part=0")))
    assert(loggedParts == Set("part=1"), "only part=0's logs fold")
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "A"), (11L, "X")))
    // unknown path refuses; fully-compacted scope is a no-op None
    intercept[IllegalArgumentException] {
      HudiWrite.compact(spark, dir, partitions = Some(Seq("part=9")))
    }
    assert(HudiWrite.compact(spark, dir, partitions = Some(Seq("part=0"))).isEmpty)
  }

  test("avro codec round-trips dates, timestamps, decimals, arrays and nulls") {
    val dir = tempDir("hudi-mor-types").toString + "/t"
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, DATE'2021-03-05', TIMESTAMP'2021-03-05 10:11:12.123456',
        |   CAST(12.34 AS DECIMAL(10,2)), array(1, 2, 3), 'x'),
        |  (2L, NULL, NULL, NULL, NULL, NULL)
        |AS t(id, d, ts, dec, xs, s)""".stripMargin)
    HudiWrite.bulkInsert(spark, df, dir, "id", tableType = "MERGE_ON_READ")
    // route BOTH rows through the log path
    HudiWrite.upsert(spark, df, dir)
    assert(listAll(dir).exists(_.contains(".log.")))
    val t = new HudiTable("t", dir)
    val got = t(spark, ReadArgs.empty).orderBy("id")
    val want = df.orderBy("id")
    assert(got.collect().toSeq == want.collect().toSeq,
      got.collect().toSeq + " vs " + want.collect().toSeq)
  }

  test("clean ages out superseded log files after compaction") {
    val dir = tempDir("hudi-mor-clean").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A2")).toDF("id", "v"), dir)
    assert(listAll(dir).exists(_.contains(".log.")))
    HudiWrite.compact(spark, dir)
    // logs still reachable from the pre-compaction snapshot: a wide
    // retention keeps them for time travel
    assert(HudiMaintenance.clean(spark, dir, retainLast = 10).isEmpty)
    assert(listAll(dir).exists(_.contains(".log.")))
    // narrow retention: the superseded log AND the superseded base go
    val deleted = HudiMaintenance.clean(spark, dir, retainLast = 1)
    assert(deleted.exists(_.contains(".log.")), deleted)
    assert(!listAll(dir).exists(_.contains(".log.")))
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "A2"), (2L, "b")))
  }

  test("MOR delete appends DELETE_BLOCK tombstones; compaction retires emptied groups") {
    val dir = tempDir("hudi-mor-tomb").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    def baseFiles() = listAll(dir).count(f =>
      f.endsWith(".parquet") && !f.contains("_staging"))
    val basesBefore = baseFiles()
    HudiWrite.delete(spark, Seq(2L).toDF("id"), dir)
    val t = new HudiTable("t", dir)
    // the delete is a LOG tombstone — no base rewrite happened
    val files1 = listAll(dir)
    assert(files1.exists(_.contains(".log.")), files1.mkString("\n"))
    assert(baseFiles() == basesBefore)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    // time travel to before the delete still sees the key
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // a re-insert AFTER the tombstone wins (later instant)
    HudiWrite.upsert(spark, Seq((2L, "b2", 0)).toDF("id", "v", "part"), dir)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // delete EVERY key of part=0's group, compact: the group retires
    HudiWrite.delete(spark, Seq(1L, 2L).toDF("id"), dir)
    val ic = HudiWrite.compact(spark, dir).get
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().toSeq == Seq(3L))
    val slices = HudiWrite.latestSlices(fsOf(dir), dir, None)
    assert(slices.size == 1 && slices.head.partition == "part=1", slices)
    // non-existent keys are no-ops
    HudiWrite.delete(spark, Seq(99L).toDF("id"), dir)
    assert(t(spark, ReadArgs.empty).count() == 1)
  }

  test("savepoint pins a snapshot through clean; restore rolls the table back") {
    val dir = tempDir("hudi-sp").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), dir, "id")
    val i2 = HudiWrite.upsert(spark, Seq((1L, "a2")).toDF("id", "v"), dir)
    val i3 = HudiWrite.upsert(spark, Seq((2L, "b3")).toDF("id", "v"), dir)

    HudiMaintenance.savepoint(spark, dir, i1)
    HudiMaintenance.savepoint(spark, dir, i2)
    intercept[IllegalArgumentException] {
      HudiMaintenance.savepoint(spark, dir, "19990101000000000")
    }
    // clean with retention 1 would normally drop the i1/i2 slices —
    // the savepoints keep them readable as-of their instants
    HudiMaintenance.clean(spark, dir, retainLast = 1)
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // restore refuses past a later savepoint, then works once dropped
    intercept[IllegalArgumentException] { HudiMaintenance.restore(spark, dir, i1) }
    HudiMaintenance.deleteSavepoint(spark, dir, i2)
    val deleted = HudiMaintenance.restore(spark, dir, i2)
    assert(deleted.exists(_.contains(i3)), deleted)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a2"), (2L, "b")))
    // the timeline continues: a new upsert lands after the restore
    HudiWrite.upsert(spark, Seq((2L, "b4")).toDF("id", "v"), dir)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a2"), (2L, "b4")))
  }

  test("MOR upsert refuses MISSING columns; extra columns are additive evolution") {
    val dir = tempDir("hudi-mor-schema").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id",
      tableType = "MERGE_ON_READ")
    // a frame missing a table column would silently null it for every
    // key its log records update — refused loudly
    val missing = intercept[IllegalArgumentException] {
      HudiWrite.upsert(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    }
    assert(missing.getMessage.contains("missing table column"), missing.getMessage)
    assert(missing.getMessage.contains("v"), missing.getMessage)
    // the table is untouched by the refused attempt
    assert(new HudiTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "v").as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // EXTRA columns evolve additively (HudiEvolutionSpec covers the
    // read-side widening in depth)
    HudiWrite.upsert(spark, Seq((1L, "A", 9)).toDF("id", "v", "n"), dir)
    assert(new HudiTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "v", "n").as[(Long, String, Option[Int])].collect().toSeq ==
      Seq((1L, "A", Some(9))))
  }

  test("rollbackPending removes crashed writes' files and markers, never live data") {
    val dir = tempDir("hudi-rollback").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val fs = fsOf(dir)
    val old = System.currentTimeMillis() - 100000

    // simulate a crash AFTER staging moved files but BEFORE completion:
    // an orphan base file + uncompleted markers, plus a staging dir
    val ghost = "20200101000000000"
    val orphan = new Path(dir, s"part=0/deadbeef-0000_0-0-0_$ghost.parquet")
    fs.create(orphan, true).close()
    val reqM = new Path(dir, s".hoodie/$ghost.commit.requested")
    val infM = new Path(dir, s".hoodie/$ghost.inflight")
    fs.create(reqM, true).close(); fs.create(infM, true).close()
    val staging = new Path(dir, "_staging_hoodie_dead1234")
    fs.mkdirs(staging)
    fs.create(new Path(staging, "junk.parquet"), true).close()
    Seq(orphan, reqM, infM, staging).foreach(p => fs.setTimes(p, old, old))

    // a FRESH pending instant (an active writer) must survive
    val fresh = "20990101000000000"
    fs.create(new Path(dir, s".hoodie/$fresh.commit.requested"), true).close()

    val deleted = HudiMaintenance.rollbackPending(spark, dir, olderThanMs = 50000)
    assert(deleted.exists(_.contains(ghost)), deleted)
    assert(!fs.exists(orphan) && !fs.exists(reqM) && !fs.exists(infM) && !fs.exists(staging))
    assert(fs.exists(new Path(dir, s".hoodie/$fresh.commit.requested")))

    // live data is untouched and still reads
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    // idempotent
    assert(HudiMaintenance.rollbackPending(spark, dir, olderThanMs = 50000)
      .forall(!_.contains(ghost)))
  }

  test("foreign command log blocks refuse loudly; log-only groups refuse") {
    val dir = tempDir("hudi-mor-refuse").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A")).toDF("id", "v"), dir)
    val fs = fsOf(dir)
    val log = listAll(dir).find(_.contains(".log.")).get
    // overwrite the log with a COMMAND (rollback) block — reading
    // must refuse, not silently serve the base-only view
    val blocks = HudiLog.readBlocks(fs, new Path(log))
    fs.delete(new Path(log), false)
    HudiLog.write(fs, new Path(log), Seq(
      blocks.head.copy(blockType = HudiLog.CommandBlock)))
    val t = new HudiTable("t", dir)
    val e = intercept[org.apache.spark.SparkException] {
      t(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("unsupported") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported")), e.getMessage)

    // a deltacommit logging to a file group with no base slice is an
    // explicit unsupported-table refusal
    val dir2 = tempDir("hudi-mor-logonly").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir2, "id",
      tableType = "MERGE_ON_READ")
    val fs2 = fsOf(dir2)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fake = mapper.readTree(
      """{"operationType":"UPSERT","partitionToWriteStats":
        |{"":[{"fileId":"deadbeef","path":".deadbeef_0.log.1_0-0-0","numWrites":1}]}}"""
        .stripMargin.replace("\n", ""))
    val out = fs2.create(new Path(dir2, ".hoodie/99999999999999999.deltacommit"), true)
    out.write(mapper.writeValueAsBytes(fake)); out.close()
    val e2 = intercept[UnsupportedOperationException] {
      new HudiTable("t", dir2)(spark, ReadArgs.empty).collect()
    }
    assert(e2.getMessage.contains("log-only"), e2.getMessage)
  }
}
