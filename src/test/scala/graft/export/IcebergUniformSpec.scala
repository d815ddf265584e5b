package graft.export

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaLog, DeltaWrite}

/** UniForm-style Iceberg export parity: replaying the emitted
  * metadata (version-hint → metadata JSON → Avro manifest list →
  * Avro manifests) must yield exactly the Delta snapshot's live file
  * set — paths, record counts, and identity-partition values — using
  * only the Iceberg metadata, never the Delta log.
  */
class IcebergUniformSpec extends SparkSpec {
  import spark.implicits._

  private def expectedFiles(dir: String): Set[(String, Long)] = {
    val snap = DeltaLog.snapshot(spark, dir)
    snap.files.map { f =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(f.stats.get).path("numRecords").asLong(-1L)
      (DeltaLog.resolvePath(dir, f.path), n)
    }.toSet
  }

  test("partitioned table round-trips through the Iceberg metadata") {
    val dir = tempDir("uniform").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))
    DeltaWrite.append(spark,
      Seq((4L, "d", 1), (5L, "e", 2)).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))
    // a delete so the live set differs from ever-added
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("part", "=", 0))))

    val out = IcebergUniform.export(spark, dir)
    assert(out.snapshotId == 2L)

    val replayed = IcebergUniform.replay(spark, dir)
    assert(replayed.map(r => (r._1, r._2)).toSet == expectedFiles(dir))
    // identity partition values survive, typed
    val partsByPath = replayed.map(r => r._1 -> r._3("part")).toMap
    val snapParts = DeltaLog.snapshot(spark, dir).files.map(f =>
      DeltaLog.resolvePath(dir, f.path) -> f.partitionValues("part").get.toInt).toMap
    assert(partsByPath == snapParts)
    assert(!partsByPath.values.exists(_ == 0), "deleted partition must be absent")
  }

  test("unpartitioned table + time travel export") {
    val dir = tempDir("uniform-tt").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)

    IcebergUniform.export(spark, dir, versionAsOf = Some(0L))
    val v0 = IcebergUniform.replay(spark, dir)
    assert(v0.map(_._2).sum == 1L) // only version 0's row

    IcebergUniform.export(spark, dir)
    val head = IcebergUniform.replay(spark, dir)
    assert(head.map(_._2).sum == 2L)
    assert(head.map(_._1).toSet ==
      DeltaLog.snapshot(spark, dir).files
        .map(f => DeltaLog.resolvePath(dir, f.path)).toSet)
  }

  test("metadata JSON carries schema field ids and the partition spec") {
    val dir = tempDir("uniform-meta").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", 7)).toDF("id", "v", "part"), dir, partitionBy = Seq("part"))
    val out = IcebergUniform.export(spark, dir)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(out.metadataJson.stripPrefix("file:"))))
    assert(m.path("format-version").asInt() == 2)
    val schema = m.path("schemas").get(0)
    val names = (0 until schema.path("fields").size())
      .map(i => schema.path("fields").get(i).path("name").asText())
    assert(names == Seq("id", "v", "part"))
    val ids = (0 until schema.path("fields").size())
      .map(i => schema.path("fields").get(i).path("id").asInt())
    assert(ids.distinct == ids && ids.forall(_ > 0))
    val spec = m.path("partition-specs").get(0).path("fields").get(0)
    assert(spec.path("transform").asText() == "identity")
    assert(spec.path("source-id").asInt() == ids(names.indexOf("part")))
  }

  test("manifest binds partition values by partition-spec field ids (1000+i)") {
    val dir = tempDir("uniform-ids").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", 3)).toDF("id", "v", "part"), dir, partitionBy = Seq("part"))
    val out = IcebergUniform.export(spark, dir)
    val local = new java.io.File(out.manifest.stripPrefix("file:"))
    val r = new org.apache.avro.file.DataFileReader(local,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      // spec binding metadata Iceberg's ManifestReader requires
      assert(r.getMetaString("partition-spec-id") == "0")
      assert(r.getMetaString("format-version") == "2")
      assert(Option(r.getMetaString("schema")).exists(_.contains("\"fields\"")))
      assert(Option(r.getMetaString("partition-spec")).exists(_.contains("identity")))
      val pSchema = r.getSchema.getField("data_file").schema()
        .getField("partition").schema()
      val fid = pSchema.getFields.get(0).getObjectProp("field-id")
      assert(fid == Integer.valueOf(1000), s"partition field-id was $fid, not the spec id")
    } finally r.close()
  }

  test("column-mapping ids with collection columns export distinct field ids") {
    import org.apache.spark.sql.types._
    val dir = tempDir("uniform-cmap").toString + "/t"
    // Delta ids only STRUCT FIELDS; array elements get implicit ids,
    // which must not collide with a later column's explicit id
    val schema = StructType(Seq(
      StructField("tags", ArrayType(StringType), nullable = true,
        new MetadataBuilder().putLong(DeltaLog.FieldIdKey, 1L).build()),
      StructField("owner", StringType, nullable = true,
        new MetadataBuilder().putLong(DeltaLog.FieldIdKey, 2L).build())))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq("x", "y"), "alice"))
    DeltaWrite.append(spark, spark.createDataFrame(rows, schema), dir)
    val out = IcebergUniform.export(spark, dir)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(out.metadataJson.stripPrefix("file:"))))
    val fields = m.path("schemas").get(0).path("fields")
    assert(fields.get(0).path("id").asInt() == 1)
    assert(fields.get(1).path("id").asInt() == 2)
    val elementId = fields.get(0).path("type").path("element-id").asInt()
    assert(elementId > 2, s"array element-id $elementId collides with explicit column ids")
  }

  test("id-mode column-mapped export reads back through the Iceberg field-id leg") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val dir = tempDir("uniform-idmap").toString + "/t"
    // id-mode mapped table: logical (id, v), physical (col-01, col-02),
    // data files written WITH parquet footer field ids (the id-mode
    // writer contract) — previously the declared out-of-scope shape,
    // now the reader's id leg resolves physical names by id
    def mapped(name: String, dt: DataType, id: Int, phys: String) =
      StructField(name, dt, nullable = true,
        new MetadataBuilder()
          .putLong(DeltaLog.FieldIdKey, id.toLong)
          .putString(DeltaLog.PhysicalNameKey, phys).build())
    val logical = StructType(Seq(
      mapped("id", LongType, 1, "col-01"), mapped("v", StringType, 2, "col-02")))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = m.createObjectNode()
    meta.put("id", java.util.UUID.randomUUID().toString)
    meta.putObject("format").put("provider", "parquet")
    meta.put("schemaString", logical.json)
    meta.putArray("partitionColumns")
    meta.putObject("configuration")
      .put("delta.columnMapping.mode", "id")
      .put("delta.columnMapping.maxColumnId", "2")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val pmd1 = new MetadataBuilder().putLong("parquet.field.id", 1L).build()
    val pmd2 = new MetadataBuilder().putLong("parquet.field.id", 2L).build()
    val data = (1L to 4L).map(i => (i, s"v$i")).toDF("col-01", "col-02")
      .select(col("col-01").as("col-01", pmd1), col("col-02").as("col-02", pmd2))
      .coalesce(1)
    data.write.parquet(dir + "/d0")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir + "/d0"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(file, new org.apache.hadoop.fs.Path(dir + "/f0.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/d0"), true)
    val add = m.createObjectNode()
    add.put("path", "f0.parquet")
    add.putObject("partitionValues")
    add.put("size", fs.getFileStatus(new org.apache.hadoop.fs.Path(dir + "/f0.parquet")).getLen)
    add.put("modificationTime", 0L)
    add.put("dataChange", true)
    add.put("stats", """{"numRecords":4}""")
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    fs.mkdirs(logDir)
    val out0 = fs.create(new org.apache.hadoop.fs.Path(logDir, "00000000000000000000.json"), true)
    try out0.write((Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":${m.writeValueAsString(meta)}}""",
      s"""{"add":${m.writeValueAsString(add)}}""").mkString("\n") + "\n").getBytes("UTF-8"))
    finally out0.close()

    IcebergUniform.export(spark, dir)
    val got = new graft.tables.IcebergTable("t", dir)(spark, graft.tables.ReadArgs())
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      (1L to 4L).map(i => (i, s"v$i")))
  }

  test("column-mapped export REFUSES when data files lack footer field ids") {
    import org.apache.spark.sql.types._
    val dir = tempDir("uniform-namemap").toString + "/t"
    def mapped(name: String, dt: DataType, id: Int, phys: String) =
      StructField(name, dt, nullable = true,
        new MetadataBuilder()
          .putLong(DeltaLog.FieldIdKey, id.toLong)
          .putString(DeltaLog.PhysicalNameKey, phys).build())
    val logical = StructType(Seq(
      mapped("id", LongType, 1, "col-01"), mapped("v", StringType, 2, "col-02")))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = m.createObjectNode()
    meta.put("id", java.util.UUID.randomUUID().toString)
    meta.putObject("format").put("provider", "parquet")
    meta.put("schemaString", logical.json)
    meta.putArray("partitionColumns")
    meta.putObject("configuration")
      .put("delta.columnMapping.mode", "name")
      .put("delta.columnMapping.maxColumnId", "2")
    // id-LESS physical-name file: the unreadable-after-export shape
    val data = (1L to 4L).map(i => (i, s"v$i")).toDF("col-01", "col-02").coalesce(1)
    data.write.parquet(dir + "/d0")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir + "/d0"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(file, new org.apache.hadoop.fs.Path(dir + "/f0.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/d0"), true)
    val add = m.createObjectNode()
    add.put("path", "f0.parquet")
    add.putObject("partitionValues")
    add.put("size", fs.getFileStatus(new org.apache.hadoop.fs.Path(dir + "/f0.parquet")).getLen)
    add.put("modificationTime", 0L)
    add.put("dataChange", true)
    add.put("stats", """{"numRecords":4}""")
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    fs.mkdirs(logDir)
    val out0 = fs.create(new org.apache.hadoop.fs.Path(logDir, "00000000000000000000.json"), true)
    try out0.write((Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":${m.writeValueAsString(meta)}}""",
      s"""{"add":${m.writeValueAsString(add)}}""").mkString("\n") + "\n").getBytes("UTF-8"))
    finally out0.close()
    val e = intercept[IllegalArgumentException](IcebergUniform.export(spark, dir))
    assert(e.getMessage.contains("no") && e.getMessage.contains("field ids"))
  }

  test("deletion-vector tables export position deletes, not a refusal") {
    val dir = tempDir("uniform-dv").toString + "/t"
    DeltaWrite.append(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("id", "<", 3L))))
    val out = IcebergUniform.export(spark, dir)
    // replay (data manifests only) still sees the physical file set
    assert(IcebergUniform.replay(spark, dir).map(_._2).sum == 10L)
    // the manifest list carries a content=deletes manifest with 2 rows
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = graft.tables.IcebergMeta.readAvro(fs,
      new org.apache.hadoop.fs.Path(out.manifestList))
    val del = manifests.find(_.get("content").asInstanceOf[Int] == 1)
    assert(del.isDefined, "missing deletes manifest in the manifest list")
    assert(del.get.get("added_rows_count").asInstanceOf[Long] == 2L)
  }
}
