package graft.streaming

import graft.SparkSpec
import graft.tables.{DeltaDdl, DeltaWrite, HudiWrite, IcebergWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming CDC source over the ChangeFeed triad: the first batch is
  * the full table as inserts, every later micro-batch is the typed
  * change stream (pre-image deletes + post-image inserts for
  * upserts), uniform across Delta/Iceberg/Hudi; checkpoint restarts
  * resume after the committed version.
  */
class ChangeFeedStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[ChangeFeedStreamSourceProvider].getName

  private def collected(name: String): Set[(Long, String, String)] =
    spark.sql(s"SELECT id, v, _change_type FROM $name")
      .as[(Long, String, String)].collect().toSet

  test("iceberg: typed upsert/delete changes stream after the snapshot batch") {
    val dir = tempDir("cdc-ice").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("memory").queryName("cdcice")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(collected("cdcice") == Set(
        (1L, "a", "insert"), (2L, "b", "insert")))
      IcebergWrite.upsertEquality(spark,
        Seq((2L, "B"), (3L, "c")).toDF("id", "v"), dir, Seq("id"))
      IcebergWrite.deleteEquality(spark, dir, Seq(Tuple1(1L)).toDF("id"))
      q.processAllAvailable()
      assert(collected("cdcice") == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (2L, "b", "delete"), (2L, "B", "insert"), (3L, "c", "insert"),
        (1L, "a", "delete")))
      // commit versions rode along, monotone nonzero for the changes
      val vs = spark.sql("SELECT _commit_version FROM cdcice WHERE _change_type = 'delete'")
        .as[Long].collect()
      assert(vs.forall(_ > 0))
    } finally q.stop()
  }

  test("hudi MOR: log upserts and tombstones stream as typed changes") {
    val dir = tempDir("cdc-hudi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("memory").queryName("cdchudi")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(collected("cdchudi") == Set(
        (1L, "a", "insert"), (2L, "b", "insert")))
      HudiWrite.upsert(spark, Seq((2L, "B", 0)).toDF("id", "v", "part"), dir)
      HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
      q.processAllAvailable()
      assert(collected("cdchudi") == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (2L, "b", "delete"), (2L, "B", "insert"),
        (1L, "a", "delete")))
    } finally q.stop()
  }

  test("delta: CDF update pre/post-images stream; checkpoint restart resumes") {
    val dir = tempDir("cdc-delta").toString + "/t"
    val ckpt = tempDir("cdc-delta-c").toString
    val out = tempDir("cdc-delta-o").toString
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)

    def drain(): Unit = {
      val q = spark.readStream.format(fmt).option("path", dir).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    def rows() = spark.read.parquet(out).select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(rows() == Set((1L, "a", "insert"), (2L, "b", "insert")))

    DeltaWrite.updateWhere(spark, dir,
      graft.core.Filters.normalize(Seq(graft.core.Filter("id", "=", 2L))),
      Seq("v" -> "'Z'"))
    drain() // restart resumes from the checkpointed version
    assert(rows() == Set(
      (1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "b", "update_preimage"), (2L, "Z", "update_postimage")))
  }

  test("additiveSchemaTolerance: a mid-stream added column keeps streaming under the start schema") {
    val dir = tempDir("cdc-evo").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val q = spark.readStream.format(fmt).option("path", dir)
      .option("additiveSchemaTolerance", "true").load()
      .writeStream.format("memory").queryName("cdcevo")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // additive evolution mid-stream: column w appears; batches keep
      // flowing under the pinned start schema (w surfaces on restart)
      IcebergWrite.append(spark, Seq((2L, "b", 9L)).toDF("id", "v", "w"), dir)
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      assert(collected("cdcevo") == Set(
        (1L, "a", "insert"), (2L, "b", "insert")))
    } finally q.stop()

    // without the opt-in the same drift still refuses (a fresh table,
    // so the new stream pins the pre-evolution schema)
    val dir2 = tempDir("cdc-evo2").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir2)
    val q2 = spark.readStream.format(fmt).option("path", dir2).load()
      .writeStream.format("memory").queryName("cdcevo2")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      IcebergWrite.append(spark, Seq((2L, "b", 9L)).toDF("id", "v", "w"), dir2)
      intercept[Exception] { q2.processAllAvailable() }
      assert(q2.exception.nonEmpty)
    } finally q2.stop()
  }

  test("iceberg v1 tables refuse loudly (no sequence numbers to token from)") {
    val dir = tempDir("cdc-v1").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    // doctor the metadata to format-version 1 — spec-legal v1 writers
    // omit sequence-number, which parses as 0 for EVERY snapshot:
    // head() would sit at 0 forever and consumers would silently
    // report "no changes" instead of failing
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new org.apache.hadoop.fs.Path(dir, "metadata")
    val latest = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val txt = {
      val in = fs.open(latest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val out = fs.create(latest, true)
    try out.write(txt.replaceAll(
      "\"format-version\"\\s*:\\s*\\d+", "\"format-version\":1").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      graft.tables.ChangeFeed.forPath(spark, dir).head(spark)
    }
    assert(e.getMessage.contains("format-version 1"))
  }

  test("hudi: a stale pending marker below head HOLDS the offset, not fails") {
    val dir = tempDir("cdc-fence").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("memory").queryName("cdcfence")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(collected("cdcfence") == Set((1L, "a", "insert")))
      // a crashed writer's stale marker below every completed instant:
      // nothing is safely consumable — getOffset must hold the last
      // offset (previously: feed.head threw and the query died)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(
        dir, ".hoodie/00000000000000001.commit.requested")
      fs.create(marker, true).close()
      q.processAllAvailable() // must not throw
      assert(collected("cdcfence") == Set((1L, "a", "insert")))
      assert(q.exception.isEmpty)
      // marker cleared → the stream advances again
      fs.delete(marker, false)
      HudiWrite.upsert(spark, Seq((1L, "A", 0)).toDF("id", "v", "part"), dir)
      q.processAllAvailable()
      assert(collected("cdcfence").contains((1L, "A", "insert")))
    } finally q.stop()
  }

  test("delta CDC matrix: row-tracked and column-mapped tables stream through the feed") {
    import graft.tables.DeltaChanges
    // ---- row-tracked + CDF: updates flow as pre/post images ----
    val dir = tempDir("cdc-rt").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir, Map(
      "delta.enableRowTracking" -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("memory").queryName("cdcrt")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(collected("cdcrt") == Set((1L, "a", "insert"), (2L, "b", "insert")))
      DeltaWrite.updateWhere(spark, dir,
        graft.core.Filters.normalize(Seq(graft.core.Filter("id", "=", 2L))),
        Seq("v" -> "'Z'"))
      q.processAllAvailable()
      assert(collected("cdcrt") == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (2L, "b", "update_preimage"), (2L, "Z", "update_postimage")))
    } finally q.stop()

    // ---- column-mapped (mode=name) + CDF: change files read under
    // PHYSICAL names, rows stream under LOGICAL names ----
    val fsys = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def putFile(df: org.apache.spark.sql.DataFrame, tableDir: String, rel: String): Long = {
      val tmp = tempDir("cdccm-f").toString + "/out"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fsys.listStatus(new org.apache.hadoop.fs.Path(tmp)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new org.apache.hadoop.fs.Path(tableDir, rel)
      fsys.mkdirs(dest.getParent)
      fsys.rename(part, dest)
      fsys.getFileStatus(dest).getLen
    }
    def putCommit(tableDir: String, version: Long, lines: Seq[String]): Unit = {
      val log = new org.apache.hadoop.fs.Path(tableDir, "_delta_log")
      fsys.mkdirs(log)
      val out = fsys.create(
        new org.apache.hadoop.fs.Path(log, f"$version%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    val dir2 = tempDir("cdc-cm").toString + "/t"
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-01"}},
        |{"name":"v","type":"string","nullable":true,"metadata":
        |  {"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-02"}}
        |]}""".stripMargin.replaceAll("\n", "")
    val metaJson =
      s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555",
         |"format":{"provider":"parquet","options":{}},
         |"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
           .writeValueAsString(schemaJson)},
         |"partitionColumns":[],"configuration":{
         |"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"10",
         |"delta.enableChangeDataFeed":"true"},"createdTime":1}}""".stripMargin
        .replaceAll("\n", "")
    val s0 = putFile(Seq((1L, "a"), (2L, "b")).toDF("col-01", "col-02"), dir2, "f0.parquet")
    putCommit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaJson,
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":$s0,
         |"modificationTime":1,"dataChange":true}}""".stripMargin.replaceAll("\n", "")))

    val q2 = spark.readStream.format(fmt).option("path", dir2).load()
      .writeStream.format("memory").queryName("cdccm")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      assert(collected("cdccm") == Set((1L, "a", "insert"), (2L, "b", "insert")))
      // a cdc commit lands mid-stream: physical-named change file
      val c0 = putFile(
        Seq((2L, "b", "update_preimage"), (2L, "B", "update_postimage"))
          .toDF("col-01", "col-02", DeltaChanges.ChangeTypeCol),
        dir2, "_change_data/c0.parquet")
      putCommit(dir2, 1, Seq(
        s"""{"cdc":{"path":"_change_data/c0.parquet","partitionValues":{},
           |"size":$c0,"dataChange":false}}""".stripMargin.replaceAll("\n", "")))
      q2.processAllAvailable()
      assert(collected("cdccm") == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (2L, "b", "update_preimage"), (2L, "B", "update_postimage")))
    } finally q2.stop()
  }

  test("maxCommitsPerTrigger bounds catch-up batches by commit") {
    val dir = tempDir("cdc-max").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val q = spark.readStream.format(fmt).option("path", dir)
      .option("maxCommitsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("cdcmax")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)
      IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), dir)
      q.processAllAvailable()
      // both commits eventually arrive (in ≥2 batches), none skipped
      assert(spark.sql("SELECT id FROM cdcmax").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L))
      // and they were delivered under at least two distinct versions
      assert(spark.sql("SELECT DISTINCT _commit_version FROM cdcmax")
        .as[Long].collect().length >= 3)
    } finally q.stop()
  }
}
