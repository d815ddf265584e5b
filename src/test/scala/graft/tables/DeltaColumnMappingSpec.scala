package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column mapping (public PROTOCOL.md "Column Mapping"): parquet
  * files, partitionValues and stats use per-field physical names
  * (`delta.columnMapping.physicalName` in the schema metadata);
  * readers expose logical names. In "id" mode parquet COLUMNS are
  * additionally matched by field id (`delta.columnMapping.id` →
  * `parquet.field.id`), not by name. The reference reads such tables
  * transparently via delta-rs. Writes to mapped tables are refused
  * loudly.
  */
class DeltaColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def putFile(df: DataFrame, tableDir: String, relPath: String): Long = {
    val tmp = tempDir("cmfile").toString + "/out"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = fs(tmp)
    val part = f.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dest = new Path(tableDir, relPath)
    f.mkdirs(dest.getParent)
    f.rename(part, dest)
    f.getFileStatus(dest).getLen
  }

  private def putCommit(tableDir: String, version: Long, lines: Seq[String]): Unit = {
    val dir = new Path(tableDir, "_delta_log")
    val f = fs(tableDir)
    f.mkdirs(dir)
    val out = f.create(new Path(dir, f"$version%020d.json"), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def mapped(name: String, dt: DataType, id: Int, phys: String): StructField =
    StructField(name, dt, nullable = true,
      metadata = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong)
        .putString(DeltaLog.PhysicalNameKey, phys)
        .build())

  private def metaDataJson(
      schema: StructType, partitionColumns: Seq[String], mode: String): String = {
    val m = mapper.createObjectNode()
    m.put("id", "11111111-2222-3333-4444-555555555555")
    m.putObject("format").put("provider", "parquet")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    m.putObject("configuration")
      .put("delta.columnMapping.mode", mode)
      .put("delta.columnMapping.maxColumnId", "10")
    s"""{"metaData":${mapper.writeValueAsString(m)}}"""
  }

  private def addJson(path: String, pv: Map[String, String], size: Long,
                      stats: Option[String] = None): String = {
    val a = mapper.createObjectNode()
    a.put("path", path)
    val p = a.putObject("partitionValues")
    pv.foreach { case (k, v) => p.put(k, v) }
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    stats.foreach(s => a.put("stats", s))
    s"""{"add":${mapper.writeValueAsString(a)}}"""
  }

  // logical: id bigint, v string, s struct<x bigint>, part int (partition)
  private val logicalSchema = StructType(Seq(
    mapped("id", LongType, 1, "col-01"),
    mapped("v", StringType, 2, "col-02"),
    mapped("s", StructType(Seq(mapped("x", LongType, 5, "col-05"))), 4, "col-04"),
    mapped("part", IntegerType, 3, "col-03")))

  private def dataDf(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.map { case (i, v, x) => (i, v, Tuple1(x)) }
      .toDF("col-01", "col-02", "col-04")
      .withColumn("col-04", col("col-04").cast("struct<`col-05`:bigint>"))

  private def mappedTable(): String = {
    val dir = tempDir("delta-cm").toString + "/t"
    val s0 = putFile(dataDf(Seq((1L, "a", 10L), (2L, "b", 20L))), dir, "part=0/f0.parquet")
    val s1 = putFile(dataDf(Seq((11L, "c", 30L))), dir, "part=1/f1.parquet")
    val s2 = putFile(dataDf(Seq((21L, "d", 40L))), dir, "part=1/f2.parquet")
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataJson(logicalSchema, Seq("part"), "name"),
      addJson("part=0/f0.parquet", Map("col-03" -> "0"), s0,
        Some("""{"numRecords":2,"minValues":{"col-01":1},"maxValues":{"col-01":2},"nullCount":{"col-01":0}}""")),
      addJson("part=1/f1.parquet", Map("col-03" -> "1"), s1,
        Some("""{"numRecords":1,"minValues":{"col-01":11},"maxValues":{"col-01":11},"nullCount":{"col-01":0}}""")),
      addJson("part=1/f2.parquet", Map("col-03" -> "1"), s2,
        Some("""{"numRecords":1,"minValues":{"col-01":21},"maxValues":{"col-01":21},"nullCount":{"col-01":0}}"""))))
    dir
  }

  test("mapped table reads with logical names, nested fields included") {
    val t = new DeltaTable("t", mappedTable())
    val df = t(spark, ReadArgs())
    assert(df.columns.toSeq == Seq("id", "v", "s", "part"))
    val got = df.select(col("id"), col("v"), col("s.x"), col("part"))
      .as[(Long, String, Long, Int)].collect().toSet
    assert(got == Set((1L, "a", 10L, 0), (2L, "b", 20L, 0),
      (11L, "c", 30L, 1), (21L, "d", 40L, 1)))
  }

  test("partition pruning and stats skipping key by physical names") {
    val t = new DeltaTable("t", mappedTable())
    // partition filter on the LOGICAL name prunes to the part=1 files
    val p = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("part", "=", 1)))))
    assert(p.inputFiles.length == 2, s"partition pruning failed: ${p.inputFiles.toSeq}")
    // stats filter on id (physical col-01 in minValues/maxValues)
    val s = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("id", ">=", 21)))))
    assert(s.inputFiles.length == 1, s"stats skipping failed: ${s.inputFiles.toSeq}")
    assert(s.select("id").as[Long].collect().toSeq == Seq(21L))
  }

  test("deletion vector on a mapped file composes") {
    val dir = tempDir("delta-cmdv").toString + "/t"
    val size = putFile(dataDf(Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L))),
      dir, "part=0/f0.parquet")
    val bm = RoaringBitmapArray.fromSorted(Array(1L)) // physical row 1 → id 2
    val data = bm.serialize
    val a = mapper.createObjectNode()
    a.put("path", "part=0/f0.parquet")
    a.putObject("partitionValues").put("col-03", "0")
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    val dv = a.putObject("deletionVector")
    dv.put("storageType", "i")
    dv.put("pathOrInlineDv", DeletionVectors.Z85.encode(data))
    dv.put("sizeInBytes", data.length)
    dv.put("cardinality", 1L)
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","columnMapping"],"writerFeatures":["deletionVectors","columnMapping"]}}""",
      metaDataJson(logicalSchema, Seq("part"), "name"),
      s"""{"add":${mapper.writeValueAsString(a)}}"""))
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("checkpoint carries the mapping configuration through replay") {
    val dir = mappedTable()
    val cpV = DeltaWrite.checkpoint(spark, dir)
    (0L to cpV).foreach(v =>
      fs(dir).delete(new Path(dir + "/_delta_log", f"$v%020d.json"), false))
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 11L, 21L))
  }

  test("id mode reads match parquet columns by FIELD ID, not name") {
    val dir = tempDir("delta-cmid").toString + "/t"
    val idSchema = StructType(Seq(
      mapped("id", LongType, 1, "col-01"),
      mapped("v", StringType, 2, "col-02"),
      mapped("s", StructType(Seq(mapped("x", LongType, 5, "col-05"))), 4, "col-04")))
    // the FILE's column names differ from the physical names entirely
    // (the id-mode contract: names are not stable, ids are) — a
    // name-based read would see nothing
    def fid(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val fileSchema = StructType(Seq(
      StructField("legacy_id", LongType, nullable = true, fid(1)),
      StructField("legacy_v", StringType, nullable = true, fid(2)),
      StructField("legacy_s",
        StructType(Seq(StructField("legacy_x", LongType, nullable = true, fid(5)))),
        nullable = true, fid(4))))
    import org.apache.spark.sql.Row
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a", Row(10L)), Row(2L, "b", Row(20L))), fileSchema)
    val size = putFile(df, dir, "f0.parquet")
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataJson(idSchema, Seq.empty, "id"),
      addJson("f0.parquet", Map.empty, size,
        Some("""{"numRecords":2,"minValues":{"col-01":1},"maxValues":{"col-01":2},"nullCount":{"col-01":0}}"""))))
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select(col("id"), col("v"), col("s.x"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "b", 20L)))
    // stats stay keyed by PHYSICAL name in id mode too
    val skipped = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("id", ">", 5L)))))
    assert(skipped.count() == 0)
  }

  // a LOGICAL-named frame matching the mapped fixture's schema
  private def logicalDf(rows: Seq[(Long, String, Long, Int)]): DataFrame =
    rows.map { case (i, v, x, p) => (i, v, Tuple1(x), p) }
      .toDF("id", "v", "s", "part")
      .withColumn("s", col("s").cast("struct<x:bigint>"))

  test("append to a name-mapped table writes physical names and reads back") {
    val dir = mappedTable()
    val res = DeltaWrite.append(spark, logicalDf(Seq((31L, "e", 50L, 2))), dir)
    assert(res.version == 1L && res.filesAdded >= 1)

    val snap = DeltaLog.snapshot(spark, dir)
    // metadata untouched: same schemaString, same mapping config
    assert(snap.metadata.columnMappingMode == "name")
    assert(snap.metadata.schemaString == logicalSchema.json)
    // the new add's partitionValues are keyed by the PHYSICAL name
    val newAdds = snap.files.filterNot(_.path.startsWith("part="))
    assert(newAdds.nonEmpty)
    newAdds.foreach(f => assert(f.partitionValues.keySet == Set("col-03"), f.partitionValues))
    // and the staged parquet file itself carries physical column names
    val raw = spark.read.parquet(dir + "/" + newAdds.head.path)
    assert(raw.columns.toSet == Set("col-01", "col-02", "col-04"))

    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select(col("id"), col("v"), col("s.x"), col("part"))
      .as[(Long, String, Long, Int)].collect().toSet
    assert(got == Set((1L, "a", 10L, 0), (2L, "b", 20L, 0),
      (11L, "c", 30L, 1), (21L, "d", 40L, 1), (31L, "e", 50L, 2)))

    // stats on the new file key by physical name → skipping still works
    val skipped = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("id", ">=", 31L)))))
    assert(skipped.inputFiles.length == 1)
  }

  test("overwrite of a name-mapped table replaces contents, keeps mapping") {
    val dir = mappedTable()
    DeltaWrite.overwrite(spark, logicalDf(Seq((100L, "zz", 1L, 9))), dir)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().toSeq == Seq(100L))
    assert(DeltaLog.snapshot(spark, dir).metadata.isColumnMapped)
  }

  test("append to an id-mapped table carries parquet field ids") {
    val dir = tempDir("delta-cmidw").toString + "/t"
    val idSchema = StructType(Seq(
      mapped("id", LongType, 1, "col-01"),
      mapped("v", StringType, 2, "col-02")))
    def wfid(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val f0Schema = StructType(Seq(
      StructField("col-01", LongType, nullable = true, wfid(1)),
      StructField("col-02", StringType, nullable = true, wfid(2))))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    import org.apache.spark.sql.Row
    val size = putFile(
      spark.createDataFrame(java.util.Arrays.asList(Row(1L, "a")), f0Schema),
      dir, "f0.parquet")
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataJson(idSchema, Seq.empty, "id"),
      addJson("f0.parquet", Map.empty, size)))

    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    val snap = DeltaLog.snapshot(spark, dir)
    val newAdd = snap.files.find(_.path != "f0.parquet").get
    // the written footer must carry field ids: reading the bare file
    // with fieldId.read enabled and a RENAMED id-keyed schema succeeds
    def fid(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val renamed = StructType(Seq(
      StructField("anything", LongType, nullable = true, fid(1)),
      StructField("other", StringType, nullable = true, fid(2))))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val viaIds = spark.read.schema(renamed).parquet(dir + "/" + newAdd.path)
      .as[(Long, String)].collect().toSet
    assert(viaIds == Set((2L, "b")))

    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("schema evolution on mapped tables is refused loudly") {
    val mdir = mappedTable()
    val w = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((99L, "z")).toDF("id", "v"), mdir)
    }
    assert(w.getMessage.contains("schema evolution"))
  }

  test("DML on a name-mapped table: rename -> UPDATE -> DV DELETE -> CDF parity") {
    val dir = mappedTable()
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    // metadata-only rename: physical name col-02 stays, files untouched
    DeltaDdl.renameColumn(spark, dir, "v", "label") // v2
    assert(DeltaLog.snapshot(spark, dir).schema.fieldNames.toSeq ==
      Seq("id", "label", "s", "part"))

    // UPDATE over the RENAMED logical name (CoW rewrite, physical files)
    DeltaWrite.updateWhere(spark, dir,
      Filters.normalize(Seq(Filter("id", "=", 2L))),
      Seq("label" -> "'B'")) // v3
    // merge-on-read DELETE via deletion vector
    DeltaWrite.deleteWhereDv(spark, dir,
      Filters.normalize(Seq(Filter("id", "=", 11L)))) // v4

    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs())
      .select(col("id"), col("label"), col("s.x"), col("part"))
      .as[(Long, String, Long, Int)].collect().toSet
    assert(got == Set((1L, "a", 10L, 0), (2L, "B", 20L, 0), (21L, "d", 40L, 1)))

    // every post-DML add keeps PHYSICAL partitionValues keys and
    // physical parquet columns
    val snap = DeltaLog.snapshot(spark, dir)
    snap.files.foreach(f =>
      assert(f.partitionValues.keySet == Set("col-03"), f.partitionValues))
    val rewritten = snap.files.filterNot(f => Set(
      "part=0/f0.parquet", "part=1/f1.parquet", "part=1/f2.parquet")(f.path))
    assert(rewritten.nonEmpty)
    val raw = spark.read.parquet(dir + "/" + rewritten.head.path)
    assert(raw.columns.toSet == Set("col-01", "col-02", "col-04"))

    // CDF parity: update pre/post images at v3 (logical names), the
    // DV delete's rows at v4
    val upd = DeltaChanges.between(spark, dir, 3, 3)
      .select(col("id"), col("label"), col(DeltaChanges.ChangeTypeCol))
      .as[(Long, String, String)].collect().toSet
    assert(upd == Set((2L, "b", "update_preimage"), (2L, "B", "update_postimage")))
    val del = DeltaChanges.between(spark, dir, 4, 4)
      .select(col("id"), col(DeltaChanges.ChangeTypeCol))
      .as[(Long, String)].collect().toSet
    assert(del == Set((11L, "delete")))
  }

  test("CoW DELETE, MERGE and replaceWhere work on a name-mapped table") {
    val dir = mappedTable()
    // CoW DELETE (no DV routing property set)
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("id", "=", 21L))))
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 11L))

    // MERGE: update id=2, insert id=31
    DeltaWrite.merge(spark, dir,
      logicalDf(Seq((2L, "B2", 99L, 0), (31L, "e", 50L, 2))), Seq("id"))
    val afterMerge = t(spark, ReadArgs())
      .select(col("id"), col("v"), col("s.x"), col("part"))
      .as[(Long, String, Long, Int)].collect().toSet
    assert(afterMerge == Set((1L, "a", 10L, 0), (2L, "B2", 99L, 0),
      (11L, "c", 30L, 1), (31L, "e", 50L, 2)))

    // replaceWhere the part=1 slice
    DeltaWrite.replaceWhere(spark, logicalDf(Seq((12L, "cc", 31L, 1))), dir,
      Filters.normalize(Seq(Filter("part", "=", 1))))
    val afterRw = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    assert(afterRw == Seq(1L, 2L, 12L, 31L))

    // stats skipping still keys physically after the rewrites
    val s = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("id", ">=", 31L)))))
    assert(s.select("id").as[Long].collect().toSeq == Seq(31L))
  }

  test("mergeDv on a name-mapped table: DV bitmaps + physical new files") {
    val dir = mappedTable()
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableDeletionVectors" -> "true"))
    // routed to mergeDv by the table property
    DeltaWrite.merge(spark, dir, logicalDf(Seq((2L, "B", 21L, 0))), Seq("id"))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.files.exists(_.dv.exists(_.cardinality > 0)),
      "expected a deletion vector on the matched file")
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select(col("id"), col("v"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (11L, "c"), (21L, "d")))
  }

  test("ADD COLUMNS on a mapped table mints fresh ids + physical names; restore works") {
    val dir = mappedTable()
    DeltaDdl.addColumns(spark, dir,
      Seq(StructField("score", DoubleType), StructField("tag", StringType)))
    val snap = DeltaLog.snapshot(spark, dir)
    // fresh ids above the recorded maxColumnId, UUID physical names,
    // and the config advanced in the SAME commit
    val score = snap.metadata.schema("score")
    val tag = snap.metadata.schema("tag")
    assert(score.metadata.getLong("delta.columnMapping.id") == 11L &&
      tag.metadata.getLong("delta.columnMapping.id") == 12L)
    assert(score.metadata.getString(DeltaLog.PhysicalNameKey).startsWith("col-") &&
      score.metadata.getString(DeltaLog.PhysicalNameKey).length > 10)
    assert(snap.metadata.configuration("delta.columnMapping.maxColumnId") == "12")

    // old files read typed nulls; an append carrying the new columns
    // writes them under the fresh PHYSICAL names
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).where(col("score").isNotNull).count() == 0)
    val withNew = Seq((31L, "e", 0.5, "x")).toDF("id", "v", "score", "tag")
      .withColumn("s", lit(null).cast("struct<x:bigint>"))
      .withColumn("part", lit(2))
      .select("id", "v", "s", "part", "score", "tag")
    DeltaWrite.append(spark, withNew, dir)
    val got = t(spark, ReadArgs()).where(col("id") === 31L)
      .select(col("score"), col("tag")).as[(Double, String)].collect().toSeq
    assert(got == Seq((0.5, "x")))
    val newAdd = DeltaLog.snapshot(spark, dir).files
      .filterNot(f => f.path.startsWith("part="))
      .maxBy(_.path)
    val raw = spark.read.parquet(dir + "/" + newAdd.path)
    assert(raw.columns.count(_.startsWith("col-")) == raw.columns.length,
      s"physical names expected, got ${raw.columns.mkString(",")}")

    // RESTORE to the pre-evolution version brings back the old schema
    val preVersion = 0L
    DeltaWrite.restore(spark, dir, preVersion)
    val restored = DeltaLog.snapshot(spark, dir)
    assert(!restored.metadata.schema.fieldNames.contains("score"))
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 11L, 21L))
  }

  test("ADD COLUMNS maxColumnId fallback walks NESTED ids (no duplicate minting)") {
    // a foreign mapped table with NO delta.columnMapping.maxColumnId
    // config key, whose HIGHEST field id sits on a struct-nested
    // field (enableColumnMapping assigns ids in DFS order, so this is
    // the normal upgraded shape) — the fallback must derive the max
    // recursively, or the new column would duplicate id 3
    val dir = tempDir("delta-cm-nested").toString + "/t"
    val nested = StructField("s", StructType(Seq(
      mapped("x", LongType, 3, "col-03"))), nullable = true,
      metadata = new MetadataBuilder()
        .putLong("delta.columnMapping.id", 2L)
        .putString(DeltaLog.PhysicalNameKey, "col-02").build())
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(mapped("id", LongType, 1, "col-01"), nested)),
      configuration = Map("delta.columnMapping.mode" -> "name"))
    DeltaDdl.addColumns(spark, dir, Seq(StructField("z", LongType)))
    val snap = DeltaLog.snapshot(spark, dir, withFiles = false)
    val zId = snap.metadata.schema("z").metadata.getLong("delta.columnMapping.id")
    assert(zId == 4L, s"expected fresh id 4 above the NESTED max 3, got $zId")
    assert(snap.metadata.configuration("delta.columnMapping.maxColumnId") == "4")
  }

  test("UPGRADE: enableColumnMapping on an unmapped table, then the full DML ladder") {
    val dir = tempDir("delta-cmup").toString + "/t"
    // plain unmapped partitioned table with real data files
    DeltaWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (11L, "c", 1)).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))

    DeltaDdl.enableColumnMapping(spark, dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.metadata.columnMappingMode == "name")
    assert(snap.metadata.configuration("delta.columnMapping.maxColumnId") == "3")
    assert(snap.protocol.minReaderVersion >= 2 && snap.protocol.minWriterVersion >= 5)
    // physical names = pre-upgrade logical names: old files + old
    // partitionValues keys keep matching with zero rewrites
    assert(snap.metadata.physicalName("v") == "v")
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 11L))

    // double-upgrade refuses
    intercept[IllegalArgumentException] { DeltaDdl.enableColumnMapping(spark, dir) }

    // the unlock: rename + DML over the renamed name
    DeltaDdl.renameColumn(spark, dir, "v", "label")
    DeltaWrite.updateWhere(spark, dir,
      Filters.normalize(Seq(Filter("id", "=", 2L))), Seq("label" -> "'B'"))
    DeltaWrite.deleteWhereDv(spark, dir,
      Filters.normalize(Seq(Filter("id", "=", 11L))))
    DeltaWrite.append(spark, Seq((21L, "d", 1)).toDF("id", "label", "part"), dir)
    val got = t(spark, ReadArgs()).select("id", "label", "part")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 0), (2L, "B", 0), (21L, "d", 1)))
    // partition pruning still exact post-upgrade (pv keys = physical = old names)
    val pruned = t(spark, ReadArgs(filters =
      Filters.normalize(Seq(Filter("part", "=", 1)))))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(21L))
  }

  test("identity columns mint on a mapped table; HWM reads the PHYSICAL stats key") {
    val dir = tempDir("delta-cmid2").toString + "/t"
    val idMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(DeltaDdl.identityMetadata(start = 10L, step = 2L))
      .putLong("delta.columnMapping.id", 1L)
      .putString(DeltaLog.PhysicalNameKey, "col-01").build()
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        StructField("rid", LongType, nullable = true, idMeta),
        mapped("v", StringType, 2, "col-02"))),
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2"))

    DeltaWrite.append(spark, Seq(Tuple1("a"), Tuple1("b")).toDF("v"), dir)
    DeltaWrite.append(spark, Seq(Tuple1("c")).toDF("v"), dir)
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("rid", "v")
      .as[(Long, String)].collect()
    // unique, start/step honored, SECOND append continues past the
    // first's high-water mark (the bump read the physical stats key —
    // a logical-key lookup would find nothing and re-mint duplicates)
    val ids = got.map(_._1)
    assert(ids.distinct.length == 3, s"duplicate identity values: ${ids.toSeq}")
    assert(ids.forall(i => i >= 10L && (i - 10L) % 2 == 0), ids.toSeq)
    val cId = got.find(_._2 == "c").get._1
    assert(cId > got.filter(_._2 != "c").map(_._1).max,
      s"second append re-minted low ids: ${got.toSeq}")
    // HWM recorded in the schema metadata
    val hwm = DeltaLog.snapshot(spark, dir).metadata.schema("rid")
      .metadata.getLong(DeltaPolicy.IdentityHwmKey)
    assert(hwm == ids.max, s"hwm $hwm != ${ids.max}")
  }

  test("change data feed on a mapped table: cdc files read physically, surface logically") {
    val dir = tempDir("delta-cmcdf").toString + "/t"
    val s0 = putFile(dataDf(Seq((1L, "a", 10L), (2L, "b", 20L))), dir, "part=0/f0.parquet")
    // metaData with mapping mode=name AND the change data feed enabled
    val m = mapper.createObjectNode()
    m.put("id", "11111111-2222-3333-4444-555555555555")
    m.putObject("format").put("provider", "parquet")
    m.put("schemaString", logicalSchema.json)
    m.putArray("partitionColumns").add("part")
    m.putObject("configuration")
      .put("delta.columnMapping.mode", "name")
      .put("delta.columnMapping.maxColumnId", "10")
      .put("delta.enableChangeDataFeed", "true")
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":${mapper.writeValueAsString(m)}}""",
      addJson("part=0/f0.parquet", Map("col-03" -> "0"), s0)))
    // v1: a cdc commit — PHYSICAL-named change file carrying
    // _change_type, partitionValues keyed by the physical name
    val cdcSize = putFile(
      dataDf(Seq((2L, "b", 20L))).withColumn(DeltaChanges.ChangeTypeCol,
        lit("update_preimage"))
        .union(dataDf(Seq((2L, "B", 21L))).withColumn(DeltaChanges.ChangeTypeCol,
          lit("update_postimage"))),
      dir, "_change_data/part=0/c0.parquet")
    val c = mapper.createObjectNode()
    c.put("path", "_change_data/part=0/c0.parquet")
    c.putObject("partitionValues").put("col-03", "0")
    c.put("size", cdcSize)
    c.put("dataChange", false)
    putCommit(dir, 1, Seq(s"""{"cdc":${mapper.writeValueAsString(c)}}"""))

    val rows = DeltaChanges.between(spark, dir, 1, 1)
    assert(rows.columns.take(4).toSeq == Seq("id", "v", "s", "part"))
    val got = rows
      .select(col("id"), col("v"), col("s.x"), col("part"),
        col(DeltaChanges.ChangeTypeCol))
      .as[(Long, String, Long, Int, String)].collect().toSet
    assert(got == Set(
      (2L, "b", 20L, 0, "update_preimage"),
      (2L, "B", 21L, 0, "update_postimage")))
  }
}
