package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.hadoop.fs.Path

/** CONVERT TO DELTA over existing parquet / Iceberg / Hudi files:
  * no data rewrite, converted table reads identically, composes with
  * subsequent Delta writes, and refuses unsound sources.
  */
class DeltaConvertSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("parquet dir converts in place: same rows, files untouched, appends compose") {
    val dir = tempDir("conv-pq").toString + "/t"
    val df = (0L until 40L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("id", "v", "part")
    df.write.partitionBy("part").parquet(dir)
    val fs = fsOf(dir)
    val before = fs.listFiles(new Path(dir), true)
    val mtimes = scala.collection.mutable.Map.empty[String, Long]
    while (before.hasNext) { val s = before.next(); if (s.isFile) mtimes(s.getPath.toString) = s.getModificationTime }

    assert(DeltaConvert.fromParquet(spark, dir) == 0L)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      (0L until 40L))
    // partition pruning through the converted metadata
    val p1 = t(spark, ReadArgs(filters = graft.core.Filters.normalize(Seq(Filter("part", "=", 1)))))
    assert(p1.inputFiles.forall(_.contains("part=1")))
    assert(p1.count() == 13L)
    // zero data files rewritten
    val after = fs.listFiles(new Path(dir), true)
    while (after.hasNext) {
      val s = after.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        assert(mtimes(s.getPath.toString) == s.getModificationTime,
          s"data file rewritten: ${s.getPath}")
    }
    // the converted table is a live Delta table: append + time travel
    DeltaWrite.append(spark, Seq((100L, "x", 0)).toDF("id", "v", "part"), dir)
    assert(t(spark, ReadArgs.empty).count() == 41L)
    assert(t(spark, ReadArgs(extra = Map(t.VersionKey -> 0L))).count() == 40L)
    // re-converting refuses
    intercept[IllegalArgumentException] { DeltaConvert.fromParquet(spark, dir) }
  }

  test("converted tables carry full stats: file skipping prunes from the first read") {
    val dir = tempDir("conv-skip").toString + "/t"
    (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id")
      .write.parquet(dir)
    DeltaConvert.fromParquet(spark, dir)
    val t = new DeltaTable("t", dir)
    val all = t(spark, ReadArgs.empty)
    assert(all.inputFiles.length == 4)
    // min/max stats from the conversion job must prune 3 of 4 files
    val narrow = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("id", "<", 100)))))
    assert(narrow.inputFiles.length == 1,
      s"expected stats pruning to 1 file, planned ${narrow.inputFiles.length}")
    assert(narrow.count() == 100L)
  }

  test("foreign layouts reusing basenames across partitions keep per-file stats") {
    // pyarrow/duckdb-style layout: BOTH partitions name their file
    // data_0.parquet — name-keyed stats would collide and mis-skip
    val dir = tempDir("conv-basename").toString + "/t"
    val fs = fsOf(dir)
    def plant(part: Int, ids: Range): Unit = {
      val tmp = tempDir(s"conv-bn-$part").toString + "/out"
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1).write.parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(dir, s"part=$part"))
      fs.rename(new Path(src.toString), new Path(dir, s"part=$part/data_0.parquet"))
    }
    plant(0, 0 until 10)
    plant(1, 100 until 110)
    DeltaConvert.fromParquet(spark, dir)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).count() == 20L)
    // id<50 lives ONLY in part=0's file; colliding stats would either
    // skip it or fail to skip part=1
    val narrow = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("id", "<", 50)))))
    assert(narrow.count() == 10L)
    assert(narrow.inputFiles.length == 1, narrow.inputFiles.mkString(", "))
    assert(narrow.inputFiles.head.contains("part=0"))
  }

  test("Hudi table converts to its snapshot without the meta columns") {
    val dir = tempDir("conv-hudi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    HudiWrite.upsert(spark, Seq((2L, "B", 1), (3L, "c", 0)).toDF("id", "v", "part"), dir)
    DeltaConvert.fromHudi(spark, dir)
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs.empty)
    assert(got.columns.toSeq.sorted == Seq("id", "part", "v"))
    assert(got.select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("date-partitioned Iceberg tables convert with calendar values, not epoch days") {
    val dir = tempDir("conv-ice-date").toString + "/t"
    val rows = Seq(
      (1L, "a", java.sql.Date.valueOf("2020-01-01")),
      (2L, "b", java.sql.Date.valueOf("2021-06-15")))
    IcebergWrite.append(spark, rows.toDF("id", "v", "d"), dir, Seq("d"))
    DeltaConvert.fromIceberg(spark, dir)
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs.empty).select("id", "d")
      .as[(Long, java.sql.Date)].collect().sortBy(_._1).toSeq
    // epoch-day strings ("18262") would cast to NULL dates here
    assert(got == rows.map(r => (r._1, r._3)))
    val p = t(spark, ReadArgs(filters = graft.core.Filters.normalize(
      Seq(Filter("d", "=", java.sql.Date.valueOf("2020-01-01"))))))
    assert(p.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("partition values with '+' and underscore-prefixed ancestors convert correctly") {
    // '+' is NOT escaped by Spark's writer; URLDecoder would turn it
    // into a space and break both readback and pruning
    val root = tempDir("conv-esc").toString + "/_shared"
    val dir = root + "/t"
    Seq((1L, "a+b"), (2L, "c d")).toDF("id", "part")
      .write.partitionBy("part").parquet(dir)
    DeltaConvert.fromParquet(spark, dir) // underscore ANCESTOR must not blank the listing
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "part")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a+b"), (2L, "c d")))
    val p = t(spark, ReadArgs(filters = graft.core.Filters.normalize(
      Seq(Filter("part", "=", "a+b")))))
    assert(p.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("special-char partition dirs keep REAL stats, not a numRecords:0 fallback") {
    // input_file_name() is URI-encoded (space→%20, Hive-escaped ':'
    // → %253A): before decoding, the stats lookup missed these dirs
    // and committed numRecords:0 for live rows
    val dir = tempDir("conv-statkey").toString + "/t"
    Seq((1L, 10L, "a b"), (2L, 20L, "x:y"), (3L, 30L, "p%q"))
      .toDF("id", "n", "part").write.partitionBy("part").parquet(dir)
    DeltaConvert.fromParquet(spark, dir)

    val fs = fsOf(dir)
    val in = fs.open(new Path(dir, "_delta_log/00000000000000000000.json"))
    val commit = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val addStats = commit.linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(addStats.size == 3)
    assert(addStats.forall(_.contains("\\\"numRecords\\\":1")),
      s"every special-char add must carry its real rowcount:\n${addStats.mkString("\n")}")
    // and min/max landed too: stats skipping prunes to one file
    val t = new DeltaTable("t", dir)
    val narrow = t(spark, ReadArgs(filters = graft.core.Filters.normalize(
      Seq(Filter("n", "=", 20L)))))
    assert(narrow.inputFiles.length == 1, narrow.inputFiles.mkString(", "))
    assert(narrow.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("Iceberg table converts; delete-file tables refuse") {
    val dir = tempDir("conv-ice").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, Seq("part"))
    IcebergWrite.append(spark, Seq((3L, "c", 1)).toDF("id", "v", "part"), dir)
    DeltaConvert.fromIceberg(spark, dir)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v", "part")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)))

    // a DV-carrying Delta table exported to Iceberg has position
    // deletes: conversion must refuse, not silently resurrect rows
    val dvDir = tempDir("conv-ice-dv").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dvDir)
    DeltaWrite.deleteWhereDv(spark, dvDir, graft.core.Filters.normalize(Seq(Filter("id", "=", 1))))
    graft.export.IcebergUniform.export(spark, dvDir)
    // move the delta log away so the iceberg metadata stands alone
    val fs = fsOf(dvDir)
    fs.rename(new Path(dvDir, "_delta_log"), new Path(dvDir, "_delta_log_bak"))
    val e = intercept[IllegalArgumentException] { DeltaConvert.fromIceberg(spark, dvDir) }
    assert(e.getMessage.contains("delete files"))
  }

  test("MOR Hudi tables refuse while logs are pending; convert after compaction") {
    val dir = tempDir("conv-hudi-mor").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      dir, "id", tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((2L, "B2")).toDF("id", "v"), dir)
    // a base-only conversion would resurrect the stale value of id 2
    val e = intercept[IllegalArgumentException] { DeltaConvert.fromHudi(spark, dir) }
    assert(e.getMessage.contains("compact"), e.getMessage)

    assert(HudiWrite.compact(spark, dir).nonEmpty)
    DeltaConvert.fromHudi(spark, dir)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "B2")))
  }
}
