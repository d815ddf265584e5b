package graft.plans

import graft.SparkSpec
import graft.core.Filter
import graft.tables.ReadArgs
import graft.tables.{DeltaTable, DeltaWrite, IcebergWrite, IcebergTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Plan width must be FLAT in partition cardinality (r12 verdict's
  * top finding): a Delta or Iceberg snapshot read assembles AT MOST
  * TWO parquet relations (plain + DV-bearing) no matter how many
  * distinct partition tuples — and no matter how many position-delete
  * FILES — the snapshot holds. Partition values and sequence numbers
  * ride the scan as per-file constants ([[graft.tables.FileConstAttr]]
  * / FileLongAttr keyed on `_metadata.file_path`), not as literal
  * columns on per-partition union branches: on a 100 TB table with
  * thousands of partitions the old shape cost minutes of Catalyst
  * analysis per scan, growing with partition COUNT rather than data
  * read. Values are asserted unchanged against the 1-partition case's
  * semantics (same rows, typed partition columns).
  */
class ScanPlanWidthSpec extends SparkSpec {
  import spark.implicits._

  private def unionBranches(plan: LogicalPlan): Int =
    plan.collect { case u: Union => u.children.size }.sum

  private def relationCount(plan: LogicalPlan): Int =
    plan.collect { case _: LogicalRelation => 1 }.size

  private def width(df: DataFrame): (Int, Int) = {
    val analyzed = df.queryExecution.analyzed
    (unionBranches(analyzed): Int, relationCount(analyzed): Int)
  }

  test("Delta read: union width flat as partitions grow 1 -> 24 (DVs included)") {
    def build(nParts: Int): String = {
      val dir = tempDir(s"width-delta$nParts").toString + "/t"
      val rows = (0 until nParts * 4).map(i => (i.toLong, s"v$i", i % nParts))
      DeltaWrite.append(spark, rows.toDF("id", "v", "p"), dir, partitionBy = Seq("p"))
      // DV DELETE so both scan legs (plain + DV) are present
      DeltaWrite.deleteWhereDv(spark, dir,
        graft.core.Filters.normalize(Seq(Filter("id", "=", 1L))))
      dir
    }
    def widthOf(dir: String) = width(new DeltaTable("t", dir)(spark, ReadArgs.empty))

    val (u1, r1) = widthOf(build(1))
    val (u24, r24) = widthOf(build(24))
    assert(r24 == r1, s"parquet relation count grew with partitions: $r1 -> $r24")
    assert(u24 == u1, s"union width grew with partitions: $u1 -> $u24")
    assert(r24 <= 2 && u24 <= 2)

    // values: typed partition column, DV row gone
    val dir = build(6)
    val got = new DeltaTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "p").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.length == 23 && !got.map(_._1).contains(1L))
    assert(got.forall { case (id, p) => p == id % 6 })
  }

  test("Delta read: partition pruning still reaches the scan (inputFiles)") {
    val dir = tempDir("width-prune").toString + "/t"
    DeltaWrite.append(spark,
      (0 until 40).map(i => (i.toLong, i % 8)).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val t = new DeltaTable("t", dir)
    val pruned = t(spark, ReadArgs(filters =
      graft.core.Filters.normalize(Seq(Filter("p", "=", 3)))))
    assert(pruned.inputFiles.length < t(spark, ReadArgs.empty).inputFiles.length)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      (0 until 40).filter(_ % 8 == 3).map(_.toLong))
  }

  test("Iceberg read: union width flat in partitions AND position-delete files") {
    def build(nParts: Int, nDeletes: Int): String = {
      val dir = tempDir(s"width-ice$nParts-$nDeletes").toString + "/t"
      val rows = (0 until nParts * 4).map(i => (i.toLong, s"v$i", i % nParts))
      IcebergWrite.append(spark, rows.toDF("id", "v", "p"), dir, Seq("p"))
      // each delete commits separately -> its own position-delete file
      (0 until nDeletes).foreach { k =>
        IcebergWrite.deleteWhere(spark, dir,
          graft.core.Filters.normalize(Seq(Filter("id", "=", k.toLong * 2))))
      }
      dir
    }
    def widthOf(dir: String) = {
      val df = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      width(df)
    }

    val (u1, r1) = widthOf(build(1, 1))
    val (uN, rN) = widthOf(build(16, 5))
    assert(rN == r1, s"relation count grew with partitions/delete files: $r1 -> $rN")
    assert(uN == u1, s"union width grew with partitions/delete files: $u1 -> $uN")

    // values: identity partition back-fill + deletes applied
    val dir = build(4, 2)
    val got = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .select("id", "p").as[(Long, Int)].collect().sortBy(_._1)
    assert(!got.map(_._1).exists(Set(0L, 2L)) && got.length == 14)
    assert(got.forall { case (id, p) => p == id % 4 })
  }

  test("Iceberg read: mixed parquet+ORC content stays at one relation PER FORMAT") {
    val dir = tempDir("width-ice-orc").toString + "/t"
    // many parquet appends (files/partitions), then convert ONE
    // manifest's files to real ORC — the width must be exactly 2
    // relations (one per format), not per file or partition
    IcebergWrite.append(spark,
      (0 until 12).map(i => (i.toLong, i % 6)).toDF("id", "p"), dir, Seq("p"))
    IcebergWrite.append(spark,
      (12 until 24).map(i => (i.toLong, i % 6)).toDF("id", "p"), dir, Seq("p"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = graft.tables.IcebergMeta.load(fs, dir)
    val snap = graft.tables.IcebergMeta.selectSnapshot(meta, None, None)
    val mi = graft.tables.IcebergMeta.manifestInfos(fs, snap).head
    graft.tables.IcebergMeta.contentFilesOfManifest(fs, mi)
      .filter(_.content == 0).foreach { cf =>
        val tmp = tempDir("width-orc-out").toString + "/o"
        spark.read.parquet(cf.path).coalesce(1).write.mode("overwrite").orc(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.endsWith(".orc")).get
        assert(fs.rename(part,
          new org.apache.hadoop.fs.Path(cf.path.stripSuffix(".parquet") + ".orc")))
        fs.delete(new org.apache.hadoop.fs.Path(cf.path), false); ()
      }
    rewriteManifestToOrc(dir, mi.path)
    val df = new IcebergTable("t", dir)(spark, ReadArgs.empty)
    val (u, r) = width(df)
    assert(r == 2, s"expected one relation per format, got $r")
    assert(u <= 2, s"union width $u")
    assert(df.select("id").as[Long].collect().sorted.toSeq == (0L until 24L))
  }

  /** Minimal manifest format rewrite (mirrors FormatRefusalSpec's). */
  private def rewriteManifestToOrc(table: String, manifestPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(manifestPath)
    val local = java.io.File.createTempFile("width-c", ".avro")
    val in = fs.open(mPath)
    try java.nio.file.Files.copy(in, local.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    val rd = new org.apache.avro.file.DataFileReader(local,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val schema = rd.getSchema
    val records = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
    try { while (rd.hasNext) records += rd.next() } finally rd.close()
    val out = java.io.File.createTempFile("width-c-out", ".avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    try records.result().foreach { e =>
      val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      df.put("file_format", new org.apache.avro.util.Utf8("ORC"))
      df.put("file_path", new org.apache.avro.util.Utf8(
        df.get("file_path").toString.stripSuffix(".parquet") + ".orc"))
      w.append(e)
    } finally w.close()
    val os = fs.create(mPath, true)
    try java.nio.file.Files.copy(out.toPath, os) finally os.close()
    local.delete(); out.delete(); ()
  }

  test("Delta CDF range read: one cdc relation regardless of partition count") {
    val dir = tempDir("width-cdf").toString + "/t"
    DeltaWrite.append(spark,
      (0 until 24).map(i => (i.toLong, i % 12)).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.updateWhere(spark, dir,
      graft.core.Filters.normalize(Seq(Filter("id", "<", 100L))),
      Seq("id" -> "id + 1000"))
    val changes = graft.tables.DeltaChanges.between(spark, dir, 2)
    val (u, r) = width(changes)
    // update touches all 12 partitions; the cdc leg must still be ONE
    // relation (plus the per-commit frame for the range, bounded by
    // commits, not partitions)
    assert(r <= 2, s"cdc scan relation count $r grew with partitions")
    assert(u <= 2, s"cdc union width $u grew with partitions")
    val post = changes.filter($"_change_type" === "update_postimage")
    assert(post.count() == 24)
    assert(post.select("p").distinct().count() == 12)
  }
}
