package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** r15: field-id column resolution — the lift of the reader's old
  * name-only scope. A column RENAME is metadata-only per the Iceberg
  * spec (the field keeps its id); files written BEFORE the rename
  * still carry the old column name, so a name-resolving reader would
  * silently null-fill them. Here: graft's own writer stamps Iceberg
  * field ids into parquet footers (spec-required of Iceberg writers),
  * the reader matches parquet by footer id and Avro by the writer
  * schema's `field-id` props, and the unresolvable shapes — ORC
  * (name-only Spark reader), id-less imports on renamed tables,
  * Avro-nested renames — refuse loudly, never null-fill.
  */
class IcebergRenameSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshTable(prefix: String): String =
    tempDir(prefix).toString + "/t"

  private def rows(tag: String, from: Int, n: Int) =
    (from until from + n).map(i => (i.toLong, s"$tag-$i", i * 1.5)).toDF("id", "name", "v")

  test("writer stamps Iceberg field ids into parquet footers") {
    val t = freshTable("ice_ids")
    IcebergWrite.append(spark, rows("a", 0, 10), t)
    val fs = fsOf(t)
    val meta = IcebergMeta.load(fs, t)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    val files = IcebergMeta.manifestInfos(fs, snap)
      .flatMap(IcebergMeta.contentFilesOfManifest(fs, _))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f.path), conf))
      try {
        import scala.jdk.CollectionConverters._
        val byName = rd.getFileMetaData.getSchema.getFields.asScala
          .map(t => t.getName -> Option(t.getId).map(_.intValue)).toMap
        // footer ids equal the committed metadata's ids, per field
        meta.schema.fields.foreach { sf =>
          val want = sf.metadata.getLong(DeltaLog.FieldIdKey).toInt
          assert(byName(sf.name).contains(want),
            s"${f.path}: footer id for ${sf.name} = ${byName(sf.name)}, want $want")
        }
      } finally rd.close()
    }
  }

  test("renamed column reads pre-rename parquet data by field id") {
    val t = freshTable("ice_ren")
    IcebergWrite.append(spark, rows("pre", 0, 8), t)
    IcebergWrite.renameColumn(spark, t, "name", "label")
    IcebergWrite.append(spark,
      rows("post", 8, 8).withColumnRenamed("name", "label"), t)

    val table = new IcebergTable("t", t)
    val got = table(spark, ReadArgs())
      .orderBy("id").select("id", "label", "v").collect()
    assert(got.length == 16)
    // pre-rename rows must carry their VALUES under the new name —
    // the exact silent-null-fill shape this round closes
    assert(got.take(8).forall(r => r.getString(1) == s"pre-${r.getLong(0)}"))
    assert(got.drop(8).forall(r => r.getString(1) == s"post-${r.getLong(0)}"))
    // filters and projections bind to the renamed column
    val f = table(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(graft.core.Filter("label", "=", "pre-3"))),
      columns = Some(Seq("id", "label")))).collect()
    assert(f.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("double rename keeps resolving (history accumulates)") {
    val t = freshTable("ice_ren2")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    IcebergWrite.renameColumn(spark, t, "name", "mid")
    IcebergWrite.renameColumn(spark, t, "mid", "fin")
    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq == (0 until 4).map(i => s"a-$i"))
    val meta = IcebergMeta.load(fsOf(t), t)
    val renamed = IcebergTable.renamedFields(meta.fieldNameHistory, meta.schema)
    assert(renamed.map(_._2) == Seq("fin"))
    assert(renamed.head._3 == Set("name", "mid"))
  }

  test("rename refusals: partition source, collision, missing column") {
    val t = freshTable("ice_renref")
    IcebergWrite.append(spark, rows("a", 0, 4), t, Seq("name"))
    val e1 = intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(spark, t, "name", "label"))
    assert(e1.getMessage.contains("partition"))
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(spark, t, "v", "id"))
    assert(e2.getMessage.contains("already exists"))
    val e3 = intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(spark, t, "nope", "x"))
    assert(e3.getMessage.contains("no column"))
  }

  test("pre-rename snapshot time travel still resolves") {
    val t = freshTable("ice_rentt")
    val s1 = IcebergWrite.append(spark, rows("a", 0, 5), t)
    IcebergWrite.renameColumn(spark, t, "name", "label")
    IcebergWrite.append(spark,
      rows("b", 5, 5).withColumnRenamed("name", "label"), t)
    val table = new IcebergTable("t", t)
    val old = table(spark, ReadArgs(extra = Map(table.SnapshotIdKey -> s1)))
      .orderBy("id").collect()
    assert(old.length == 5 && old.forall(r => r.getString(1) == s"a-${r.getLong(0)}"))
  }

  test("ORC content files on a renamed table refuse loudly") {
    val t = freshTable("ice_renorc")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    val orcDir = tempDir("ice_renorc_src").toString + "/orc"
    rows("o", 4, 4).coalesce(1).write.orc(orcDir)
    IcebergWrite.addFiles(spark, orcDir, t, format = "ORC")
    IcebergWrite.renameColumn(spark, t, "name", "label")
    val e = intercept[UnsupportedOperationException](
      new IcebergTable("t", t)(spark, ReadArgs()).collect())
    assert(e.getMessage.contains("ORC") && e.getMessage.contains("formerly name"))
  }

  test("id-less imported parquet on a renamed table refuses loudly") {
    val t = freshTable("ice_renimp")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    val pqDir = tempDir("ice_renimp_src").toString + "/pq"
    rows("i", 4, 4).coalesce(1).write.parquet(pqDir)
    IcebergWrite.addFiles(spark, pqDir, t)
    // before the rename, the id-less import reads fine — VALUES, not
    // just counts: it rides the name-resolving parquet leg while the
    // stamped native files ride the id leg
    val pre = new IcebergTable("t", t)(spark, ReadArgs()).orderBy("id").collect()
    assert(pre.length == 8 &&
      pre.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    IcebergWrite.renameColumn(spark, t, "name", "label")
    val e = intercept[UnsupportedOperationException](
      new IcebergTable("t", t)(spark, ReadArgs()).collect())
    assert(e.getMessage.contains("no footer field ids"))
  }

  /** Write `df` as ONE Avro file under `dir` whose writer schema
    * carries Iceberg `field-id` props (what a real Iceberg Avro
    * writer embeds), via spark-avro's avroSchema pass-through.
    */
  private def writeAvroWithIds(
      df: org.apache.spark.sql.DataFrame, dir: String, ids: Map[String, Int]): Unit = {
    val fields = df.schema.fields.map { f =>
      val t = f.dataType match {
        case org.apache.spark.sql.types.LongType   => "\"long\""
        case org.apache.spark.sql.types.DoubleType => "\"double\""
        case _                                     => "\"string\""
      }
      s"""{"name":"${f.name}","type":$t,"field-id":${ids(f.name)}}"""
    }.mkString(",")
    val schema =
      s"""{"type":"record","name":"r","fields":[$fields]}"""
    df.coalesce(1).write.format(IcebergTable.AvroProvider)
      .option("avroSchema", schema).save(dir)
  }

  test("avro files with field-id props resolve renames by id") {
    val t = freshTable("ice_renavro")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    val meta0 = IcebergMeta.load(fsOf(t), t)
    val ids = meta0.schema.fields.map(f =>
      f.name -> f.metadata.getLong(DeltaLog.FieldIdKey).toInt).toMap
    // pre-rename avro import: writer schema carries the OLD name with
    // the table's field ids, exactly what a foreign Avro writer left
    val avroDir = tempDir("ice_renavro_src").toString + "/avro"
    writeAvroWithIds(rows("av", 4, 4), avroDir, ids)
    IcebergWrite.addFiles(spark, avroDir, t, format = "AVRO")
    IcebergWrite.renameColumn(spark, t, "name", "label")

    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").collect()
    assert(got.length == 8)
    assert(got.take(4).forall(r => r.getString(1) == s"a-${r.getLong(0)}"))
    assert(got.drop(4).forall(r => r.getString(1) == s"av-${r.getLong(0)}"))
  }

  test("id-less avro on a renamed table refuses loudly") {
    val t = freshTable("ice_renavro2")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    val avroDir = tempDir("ice_renavro2_src").toString + "/avro"
    rows("av", 4, 4).coalesce(1).write
      .format(IcebergTable.AvroProvider).save(avroDir)
    IcebergWrite.addFiles(spark, avroDir, t, format = "AVRO")
    IcebergWrite.renameColumn(spark, t, "name", "label")
    val e = intercept[UnsupportedOperationException](
      new IcebergTable("t", t)(spark, ReadArgs()).collect())
    assert(e.getMessage.contains("no field-id props"))
  }

  test("mixed avro writer schemas align per group (column added between imports)") {
    val t = freshTable("ice_avromix")
    // group 1: two columns; group 2: adds v — each group must align
    // against ITS OWN writer schema, not one inferred from one file
    val d1 = tempDir("ice_avromix1").toString + "/a1"
    (0 until 4).map(i => (i.toLong, s"x-$i")).toDF("id", "name")
      .coalesce(1).write.format(IcebergTable.AvroProvider).save(d1)
    IcebergWrite.addFiles(spark, d1, t, format = "AVRO")
    val d2 = tempDir("ice_avromix2").toString + "/a2"
    rows("y", 4, 4).coalesce(1).write.format(IcebergTable.AvroProvider).save(d2)
    IcebergWrite.addFiles(spark, d2, t, format = "AVRO")

    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").collect()
    assert(got.length == 8)
    assert(got.take(4).forall(r => r.getString(1).startsWith("x-") && r.isNullAt(2)))
    assert(got.drop(4).forall(r => r.getString(1).startsWith("y-") && !r.isNullAt(2)))
  }

  test("equality deletes written pre-rename keep deleting post-rename") {
    val t = freshTable("ice_reneq")
    IcebergWrite.append(spark, rows("a", 0, 8), t)
    IcebergWrite.deleteEquality(spark, t, Seq(1L, 3L).toDF("id"))
    IcebergWrite.renameColumn(spark, t, "name", "label")
    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 5L, 6L, 7L))
    assert(got.forall(r => r.getString(1) == s"a-${r.getLong(0)}"))
  }

  test("deleteWhere binds its predicate by field id on renamed tables") {
    val t = freshTable("ice_rendel")
    IcebergWrite.append(spark, rows("a", 0, 8), t)
    IcebergWrite.renameColumn(spark, t, "name", "label")
    // predicate over the RENAMED column must hit pre-rename rows — a
    // name-resolving candidate scan would silently miss all of them
    IcebergWrite.deleteWhere(spark, t,
      graft.core.Filters.normalize(Seq(graft.core.Filter("label", "=", "a-3"))))
    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L))
    // DV flavor too (upgrades the table to v3)
    IcebergWrite.deleteWhereDv(spark, t,
      graft.core.Filters.normalize(Seq(graft.core.Filter("label", "=", "a-5"))))
    val got2 = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").select("id").as[Long].collect()
    assert(got2.toSeq == Seq(0L, 1L, 2L, 4L, 6L, 7L))
  }

  test("deleteWhere refuses on renamed tables with id-less candidates") {
    val t = freshTable("ice_rendel2")
    IcebergWrite.append(spark, rows("a", 0, 4), t)
    val pqDir = tempDir("ice_rendel2_src").toString + "/pq"
    rows("i", 4, 4).coalesce(1).write.parquet(pqDir)
    IcebergWrite.addFiles(spark, pqDir, t)
    IcebergWrite.renameColumn(spark, t, "name", "label")
    val e = intercept[UnsupportedOperationException](
      IcebergWrite.deleteWhere(spark, t,
        graft.core.Filters.normalize(Seq(graft.core.Filter("id", ">=", 0L)))))
    assert(e.getMessage.contains("no footer field ids"), e.getMessage)
  }

  test("scoped rewrite preserves renamed-column values (field-id read)") {
    val t = freshTable("ice_renrw")
    val df = (0 until 8).map(i => (i.toLong, s"a-$i", (i % 2))).toDF("id", "name", "p")
    IcebergWrite.append(spark, df, t, Seq("p"))
    IcebergWrite.renameColumn(spark, t, "name", "label")
    // compact ONE partition: a name-resolving compaction scan would
    // null-fill the renamed column INTO the rewritten files
    IcebergMaintenance.rewriteDataFiles(spark, t,
      graft.core.Filters.normalize(Seq(graft.core.Filter("p", "=", 0))))
    val got = new IcebergTable("t", t)(spark, ReadArgs())
      .orderBy("id").select("id", "label").as[(Long, String)].collect()
    assert(got.toSeq == (0 until 8).map(i => (i.toLong, s"a-$i")), got.toSeq)
  }

  test("many-file tables probe footer ids EXECUTOR-side (zero driver opens); plan width flat") {
    val t = freshTable("ice_probe")
    // 40 files > DriverIdProbeMax(32): the id probe must go executor-side
    IcebergWrite.append(spark,
      (0 until 200).map(i => (i.toLong, s"v-$i", i * 1.0))
        .toDF("id", "name", "v").repartition(40), t)
    val before = IcebergTable.driverIdProbes.get()
    val df = new IcebergTable("t", t)(spark, ReadArgs())
    assert(df.count() == 200)
    assert(IcebergTable.driverIdProbes.get() == before,
      "a >DriverIdProbeMax-file table must probe footer ids executor-side")
    // second read answers from the cache — still zero driver opens
    assert(new IcebergTable("t", t)(spark, ReadArgs()).count() == 200)
    assert(IcebergTable.driverIdProbes.get() == before)
    // uniform id-bearing files = ONE parquet relation (no no-id leg)
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected one scan leg, got ${scans.size}")
  }

  test("mixed id/no-id files split into exactly two parquet legs (flat in file count)") {
    val t = freshTable("ice_mix")
    IcebergWrite.append(spark, rows("a", 0, 4).repartition(3), t)
    val pqDir = tempDir("ice_mix_src").toString + "/pq"
    rows("i", 4, 4).repartition(3).write.parquet(pqDir)
    IcebergWrite.addFiles(spark, pqDir, t)
    val df = new IcebergTable("t", t)(spark, ReadArgs())
    assert(df.count() == 8)
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 2, s"expected two scan legs (id + no-id), got ${scans.size}")
  }

  test("avroProjection: id-less REQUESTED fields match by name in id-bearing files") {
    // the position-delete projection (file_path/pos — spec-fixed
    // names, NO ids in the requested schema) must keep matching Avro
    // delete files that stamp the reserved ids 2147483546/2147483545
    import org.apache.spark.sql.types._
    val writer = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"file_path","type":"string","field-id":2147483546},
        |{"name":"pos","type":"long","field-id":2147483545}]}""".stripMargin)
    val requested = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    val proj = IcebergTable.avroProjection(
      writer, requested, Seq.empty, "t", "f.avro")
    // both columns must project from the writer fields, never null
    assert(!proj.map(_.toString).exists(_.contains("NULL")), proj.mkString(", "))
  }

  test("BoundedCache evicts oldest at the boundary, never wholesale") {
    val c = new IcebergTable.BoundedCache[Int](4)
    (1 to 4).foreach(i => c.put(s"k$i", i))
    assert(c.size == 4)
    c.put("k5", 5)
    assert(c.size == 4)
    assert(c.get("k1").isEmpty)          // oldest evicted
    assert(c.get("k2").contains(2))      // rest intact
    assert(c.get("k5").contains(5))
    c.put("k5", 50)                      // overwrite: no duplicate order entry
    assert(c.size == 4 && c.get("k5").contains(50))
  }
}
