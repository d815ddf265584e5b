package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Content-format handling at the read seam: ORC and AVRO content
  * files (all three legal Iceberg formats; common in foreign
  * installs) read NATIVELY through Spark's bundled readers — one
  * extra relation per format, values equal to the parquet path's —
  * for DATA files and position/equality DELETE files alike; formats
  * with no native reader (HFile bases) and shapes that would lose
  * data (position deletes over ORC/Avro, which have no
  * _metadata.row_index) refuse at PLAN time with the file, role and
  * format named — never inside a footer reader with a cryptic error.
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

  /** Swap the snapshot's FIRST manifest's data file for a real ORC
    * encoding of the same rows: writes the ORC file next to the
    * parquet one and rewrites file_path + file_format in the
    * manifest — the layout a foreign ORC-writing engine leaves.
    */
  private def convertFirstFileToOrc(table: String): Unit =
    convertFirstManifest(table, "ORC")

  /** Re-encode every content file of the snapshot's FIRST manifest
    * as `fmt` ("ORC" | "AVRO") and rewrite file_path + file_format —
    * the layout a foreign engine writing that format leaves.
    */
  private def convertFirstManifest(table: String, fmt: String): Unit = {
    val fs = fsOf(table)
    val meta = IcebergMeta.load(fs, table)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    convertManifest(table, IcebergMeta.manifestInfos(fs, snap).head, fmt)
  }

  private def convertManifest(
      table: String, mi: IcebergMeta.ManifestInfo, fmt: String): Unit = {
    val fs = fsOf(table)
    val ext = "." + fmt.toLowerCase
    IcebergMeta.contentFilesOfManifest(fs, mi).foreach { cf =>
      val tmp = tempDir("fmt-conv-out").toString + "/o"
      val src = spark.read.parquet(cf.path).coalesce(1)
      if (fmt == "ORC") src.write.mode("overwrite").orc(tmp)
      else src.write.mode("overwrite")
        .format(IcebergTable.AvroProvider).save(tmp)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.endsWith(ext)).get
      val dest = new Path(cf.path.stripSuffix(".parquet") + ext)
      assert(fs.rename(part, dest), s"rename $part -> $dest failed")
      fs.delete(new Path(cf.path), false); ()
    }
    rewriteFormatOf(table, mi.path, fmt,
      pathMap = p => p.stripSuffix(".parquet") + ext)
  }

  test("Iceberg: ORC data files read natively, mixed with parquet files") {
    val dir = tempDir("fmt-ice").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    IcebergWrite.append(spark, Seq((3, "c"), (4, "d")).toDF("id", "v"), dir)
    convertFirstFileToOrc(dir)
    val got = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // equality deletes still apply across the mixed-format scan
    IcebergWrite.deleteEquality(spark, dir, Seq(Tuple1(1), Tuple1(3)).toDF("id"))
    val after = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Int].collect().sorted.toSeq
    assert(after == Seq(2, 4))
  }

  test("rewrite_data_files migrates an ORC table to parquet, unlocking position deletes") {
    val dir = tempDir("fmt-ice-mig").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), dir)
    convertFirstFileToOrc(dir)
    // the migration the position-delete refusal points at: compaction
    // reads the ORC content natively and rewrites it as parquet
    IcebergMaintenance.rewriteDataFiles(spark, dir)
    val fs = fsOf(dir)
    val meta = IcebergMeta.load(fs, dir)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val files = IcebergMeta.manifestInfos(fs, snap)
      .flatMap(IcebergMeta.contentFilesOfManifest(fs, _)).filter(_.content == 0)
    assert(files.nonEmpty && files.forall(_.fileFormat == "PARQUET"),
      files.map(f => f.fileFormat -> f.path).mkString(", "))
    // position deletes now work
    IcebergWrite.deleteWhere(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "=", 2))))
    assert(new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("Iceberg: position deletes over ORC data files refuse loudly") {
    val dir = tempDir("fmt-ice-pos").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    // position delete FIRST (targets the parquet file), then convert
    // the data file to ORC: applying that delete by row position is
    // impossible without parquet row indexes
    IcebergWrite.deleteWhere(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "=", 1))))
    convertFirstFileToOrc(dir)
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    // the PERMANENT refusal contract (SURVEY §1): format + role named,
    // migration path pointed at — never a silent wrong read
    assert(e.getMessage.contains("ORC") && e.getMessage.contains("position-delete") &&
      e.getMessage.contains("rewrite_data_files"), e.getMessage)
  }

  test("Iceberg: AVRO data files read natively, mixed with parquet files") {
    val dir = tempDir("fmt-ice-av").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    IcebergWrite.append(spark, Seq((3, "c"), (4, "d")).toDF("id", "v"), dir)
    convertFirstManifest(dir, "AVRO")
    val got = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // filters + pruning compose over the mixed-format scan
    val filtered = new IcebergTable("t", dir)(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(graft.core.Filter("id", ">=", 2))),
      columns = Some(Seq("id"))))
      .as[Int].collect().sorted.toSeq
    assert(filtered == Seq(2, 3, 4))
    // equality deletes still apply across the mixed-format scan
    IcebergWrite.deleteEquality(spark, dir, Seq(Tuple1(1), Tuple1(3)).toDF("id"))
    val after = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Int].collect().sorted.toSeq
    assert(after == Seq(2, 4))
  }

  test("Iceberg: AVRO equality-delete files read natively") {
    val dir = tempDir("fmt-ice-del").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    IcebergWrite.deleteEquality(spark, dir, Seq(Tuple1(1)).toDF("id"))
    // re-encode the DELETE manifest's file as real Avro — the shape a
    // foreign Flink-style writer (whose eq-deletes are Avro) leaves
    val fs = fsOf(dir)
    val meta = IcebergMeta.load(fs, dir)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val delManifest = IcebergMeta.manifestInfos(fs, snap)
      .find(mi => IcebergMeta.contentFilesOfManifest(fs, mi).exists(_.content == 2))
    assert(delManifest.nonEmpty, "fixture must carry an equality-delete manifest")
    convertManifest(dir, delManifest.get, "AVRO")
    val after = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Int].collect().sorted.toSeq
    assert(after == Seq(2))
  }

  test("Iceberg: AVRO position-delete files read natively over parquet data") {
    val dir = tempDir("fmt-ice-posav").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), dir)
    IcebergWrite.deleteWhere(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "=", 2))))
    val fs = fsOf(dir)
    val meta = IcebergMeta.load(fs, dir)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val delManifest = IcebergMeta.manifestInfos(fs, snap)
      .find(mi => IcebergMeta.contentFilesOfManifest(fs, mi)
        .exists(f => f.content == 1 && !f.isDeletionVector))
    assert(delManifest.nonEmpty, "fixture must carry a position-delete manifest")
    convertManifest(dir, delManifest.get, "AVRO")
    assert(new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("Iceberg: position deletes over AVRO data files refuse loudly") {
    val dir = tempDir("fmt-ice-posavd").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    IcebergWrite.deleteWhere(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "=", 1))))
    convertFirstManifest(dir, "AVRO")
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("AVRO") && e.getMessage.contains("position-delete") &&
      e.getMessage.contains("rewrite_data_files"), e.getMessage)
  }

  test("Iceberg: deletion vectors over ORC data files refuse loudly (no silent row loss)") {
    val dir = tempDir("fmt-ice-dvorc").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    IcebergWrite.deleteWhereDv(spark, dir, graft.core.Filters.normalize(
      Seq(graft.core.Filter("id", "=", 2L))))
    // convert the DATA manifest (content=0 files) to ORC — the DV now
    // references a file whose scan has no row_index; before the r14
    // guard this silently dropped EVERY ORC row, not just deleted ones
    val fs = fsOf(dir)
    val meta = IcebergMeta.load(fs, dir)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val dataManifest = IcebergMeta.manifestInfos(fs, snap)
      .find(mi => IcebergMeta.contentFilesOfManifest(fs, mi).exists(_.content == 0))
    assert(dataManifest.nonEmpty)
    convertManifest(dir, dataManifest.get, "ORC")
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("ORC") && e.getMessage.contains("deletion vector") &&
      e.getMessage.contains("rewrite_data_files"), e.getMessage)
  }

  test("Iceberg: an unreadable content format (HFILE) refuses with role named") {
    val dir = tempDir("fmt-ice-hf").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    rewriteManifestFormat(dir, "HFILE")
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("HFILE") && e.getMessage.contains("data"),
      e.getMessage)
  }

  private def rewriteFormatOf(table: String, manifestPath: String, fmt: String,
      pathMap: String => String = identity): Unit = {
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
      df.put("file_path", new org.apache.avro.util.Utf8(pathMap(df.get("file_path").toString)))
      w.append(e)
    } finally w.close()
    val os = fs.create(mPath, true)
    try java.nio.file.Files.copy(out.toPath, os) finally os.close()
    local.delete(); out.delete(); ()
  }

  /** Convert every base file of a Hudi table to a REAL ORC encoding
    * of the same rows and patch the commit JSON — the layout an
    * ORC-writing Hudi engine produces.
    */
  private def convertHudiBasesToOrc(dir: String): Unit = {
    val fs = fsOf(dir)
    val hoodie = new Path(dir, ".hoodie")
    val commit = fs.listStatus(hoodie).map(_.getPath)
      .find(_.getName.endsWith(".commit")).get
    val inS = fs.open(commit)
    val json = try new String(inS.readAllBytes(), "UTF-8") finally inS.close()
    assert(json.contains(".parquet"), "fixture sanity")
    val it = fs.listFiles(new Path(dir), true)
    val bases = Seq.newBuilder[Path]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && !p.toString.contains("/.hoodie/"))
        bases += p
    }
    bases.result().foreach { p =>
      val orcTmp = tempDir("fmt-hudi-orc").toString + "/o"
      spark.read.parquet(p.toString).coalesce(1).write.mode("overwrite").orc(orcTmp)
      val orcPart = fs.listStatus(new Path(orcTmp)).map(_.getPath)
        .find(_.getName.endsWith(".orc")).get
      fs.rename(orcPart, new Path(p.getParent,
        p.getName.stripSuffix(".parquet") + ".orc"))
      fs.delete(p, false); ()
    }
    val os = fs.create(commit, true)
    try os.write(json.replace(".parquet", ".orc").getBytes("UTF-8")) finally os.close()
  }

  test("Hudi: ORC base files read natively; MOR logs merge over them") {
    val dir = tempDir("fmt-hudi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    convertHudiBasesToOrc(dir)
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // a MOR upsert logs against the ORC base; the snapshot read
    // merges the log over the ORC scan
    HudiWrite.upsert(spark, Seq((2L, "B", 0), (3L, "c", 0)).toDF("id", "v", "part"), dir)
    assert(t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("Hudi: an HFile base still refuses at plan time, format and group named") {
    val dir = tempDir("fmt-hudi-hf").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val fs = fsOf(dir)
    val hoodie = new Path(dir, ".hoodie")
    val commit = fs.listStatus(hoodie).map(_.getPath)
      .find(_.getName.endsWith(".commit")).get
    val inS = fs.open(commit)
    val json = try new String(inS.readAllBytes(), "UTF-8") finally inS.close()
    val it = fs.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && !p.toString.contains("/.hoodie/")) {
        fs.rename(p, new Path(p.getParent,
          p.getName.stripSuffix(".parquet") + ".hfile")); ()
      }
    }
    val os = fs.create(commit, true)
    try os.write(json.replace(".parquet", ".hfile").getBytes("UTF-8")) finally os.close()
    val e = intercept[UnsupportedOperationException] {
      new HudiTable("t", dir)(spark, ReadArgs.empty).collect()
    }
    assert(e.getMessage.contains("HFILE") && e.getMessage.contains("PARQUET and ORC only"),
      e.getMessage)
  }
}
