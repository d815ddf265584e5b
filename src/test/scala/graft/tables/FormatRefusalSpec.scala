package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Loud refusals for non-PARQUET content files: an Iceberg manifest
  * declaring ORC data files and a Hudi timeline naming an .orc base
  * file must fail at PLAN time with the file and format named —
  * never inside the parquet footer reader with a cryptic error.
  */
class FormatRefusalSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Rewrite every data_file.file_format in the snapshot's first
    * manifest to `fmt` — the shape a foreign ORC/AVRO-writing engine
    * leaves behind.
    */
  private def rewriteManifestFormat(table: String, fmt: String): Unit = {
    val fs = fsOf(table)
    val meta = IcebergMeta.load(fs, table)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    rewriteFormatOf(table, IcebergMeta.manifestInfos(fs, snap).head.path, fmt)
  }

  test("Iceberg: ORC data files refuse at plan time, format and file named") {
    val dir = tempDir("fmt-ice").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    rewriteManifestFormat(dir, "ORC")
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("ORC") && e.getMessage.contains("PARQUET only"),
      e.getMessage)
    assert(e.getMessage.contains("data"), e.getMessage)
  }

  test("Iceberg: AVRO equality-delete files refuse with their role named") {
    val dir = tempDir("fmt-ice-del").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    IcebergWrite.deleteEquality(spark, dir, Seq(Tuple1(1)).toDF("id"))
    // corrupt the DELETE manifest (the second snapshot's new manifest)
    val fs = fsOf(dir)
    val meta = IcebergMeta.load(fs, dir)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val delManifest = IcebergMeta.manifestInfos(fs, snap)
      .find(mi => IcebergMeta.contentFilesOfManifest(fs, mi).exists(_.content == 2))
    assert(delManifest.nonEmpty, "fixture must carry an equality-delete manifest")
    rewriteFormatOf(dir, delManifest.get.path, "AVRO")
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("AVRO") &&
      e.getMessage.contains("equality-delete"), e.getMessage)
  }

  private def rewriteFormatOf(table: String, manifestPath: String, fmt: String): Unit = {
    val fs = fsOf(table)
    val mPath = new Path(manifestPath)
    val local = java.io.File.createTempFile("fmt-c", ".avro")
    val in = fs.open(mPath)
    try java.nio.file.Files.copy(in, local.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    val r = new org.apache.avro.file.DataFileReader(local,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val schema = r.getSchema
    val records = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
    try { while (r.hasNext) records += r.next() } finally r.close()
    val out = java.io.File.createTempFile("fmt-c-out", ".avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    try records.result().foreach { e =>
      val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      df.put("file_format", new org.apache.avro.util.Utf8(fmt))
      w.append(e)
    } finally w.close()
    val os = fs.create(mPath, true)
    try java.nio.file.Files.copy(out.toPath, os) finally os.close()
    local.delete(); out.delete(); ()
  }

  test("Hudi: an .orc base file refuses at plan time, format and group named") {
    val dir = tempDir("fmt-hudi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val fs = fsOf(dir)
    // rename the base file to .orc and patch the commit JSON to match
    // — the layout an ORC-writing Hudi engine produces
    val hoodie = new Path(dir, ".hoodie")
    val commit = fs.listStatus(hoodie).map(_.getPath)
      .find(_.getName.endsWith(".commit")).get
    val inS = fs.open(commit)
    val json = try new String(inS.readAllBytes(), "UTF-8") finally inS.close()
    assert(json.contains(".parquet"), "fixture sanity")
    val it = fs.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && !p.toString.contains("/.hoodie/")) {
        fs.rename(p, new Path(p.getParent,
          p.getName.stripSuffix(".parquet") + ".orc")); ()
      }
    }
    val os = fs.create(commit, true)
    try os.write(json.replace(".parquet", ".orc").getBytes("UTF-8")) finally os.close()
    val e = intercept[UnsupportedOperationException] {
      new HudiTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("ORC") && e.getMessage.contains("PARQUET only"),
      e.getMessage)
  }
}
