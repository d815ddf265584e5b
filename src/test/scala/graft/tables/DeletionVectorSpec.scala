package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._
  import DeletionVectors.Z85

  private val mapper = new ObjectMapper()

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------- codec-level ----------------

  test("Z85 round-trips 4-byte-aligned data; UUIDs encode to 20 chars") {
    val uuid = java.util.UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = Z85.encode(bb.array())
    assert(enc.length == 20)
    assert(Z85.decode(enc).toSeq == bb.array().toSeq)

    val data = Array.tabulate[Byte](64)(i => (i * 7 - 128).toByte)
    assert(Z85.decode(Z85.encode(data)).toSeq == data.toSeq)
    // non-aligned input: padded on encode, truncated by the caller
    val odd = Array[Byte](1, 2, 3, 4, 5)
    assert(Z85.decode(Z85.encode(odd)).take(5).toSeq == odd.toSeq)
  }

  test("RoaringBitmapArray round-trips sparse, dense, multi-key, and >2^32 sets") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L, 1L, 5L, 4095L),
      Array.tabulate(5000)(i => i.toLong * 2), // >4096 per key → bitset container
      Array(3L, 70000L, 140000L, 1000000L),    // several 16-bit keys
      Array(7L, (1L << 32) + 3L, (1L << 33) + 9L) // several 32-bit bitmaps
    )
    cases.foreach { ixs =>
      val bm = RoaringBitmapArray.fromSorted(ixs)
      assert(bm.cardinality == ixs.length)
      val back = RoaringBitmapArray.deserialize(bm.serialize)
      assert(back.toArray.toSeq == ixs.toSeq)
      ixs.foreach(i => assert(back.contains(i), s"missing $i"))
      assert(!back.contains(ixs.lastOption.map(_ + 1).getOrElse(42L)))
    }
  }

  test("reader understands run containers (cookie 12347) from other writers") {
    // hand-serialized: one 32-bit bitmap, one run container [10, 15]
    val bm = ByteBuffer.allocate(4 + 1 + 4 + 2 + 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | (0 << 16)) // run cookie, size-1 = 0
    bm.put(0x01.toByte)          // run flag for container 0
    bm.putShort(0)               // key
    bm.putShort(5)               // cardinality-1 (6 values)
    bm.putShort(1)               // number of runs
    bm.putShort(10)              // run start
    bm.putShort(5)               // run length (start..start+5)
    val arr = ByteBuffer.allocate(12 + bm.position()).order(ByteOrder.LITTLE_ENDIAN)
    arr.putInt(RoaringBitmapArray.Magic).putLong(1L).put(bm.array(), 0, bm.position())
    val parsed = RoaringBitmapArray.deserialize(arr.array())
    (10 to 15).foreach(i => assert(parsed.contains(i.toLong), s"missing $i"))
    assert(!parsed.contains(9L) && !parsed.contains(16L))
    assert(parsed.cardinality == 6)
  }

  test("re-serializing a bitmap with run containers normalizes them safely") {
    // build a run-container bitmap (cookie 12347), then round-trip it
    // through OUR serializer: runs must convert to array/bitset bodies
    val bm = ByteBuffer.allocate(4 + 1 + 4 + 2 + 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347); bm.put(0x01.toByte)
    bm.putShort(0); bm.putShort(5)       // key 0, card-1 = 5
    bm.putShort(1); bm.putShort(10); bm.putShort(5) // one run [10,15]
    val arr = ByteBuffer.allocate(12 + bm.position()).order(ByteOrder.LITTLE_ENDIAN)
    arr.putInt(RoaringBitmapArray.Magic).putLong(1L).put(bm.array(), 0, bm.position())
    val withRuns = RoaringBitmapArray.deserialize(arr.array())
    val roundTripped = RoaringBitmapArray.deserialize(withRuns.serialize)
    assert(roundTripped.toArray.toSeq == (10L to 15L))
  }

  test("uuid DV descriptors with a directory prefix resolve under it") {
    val uuid = java.util.UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val d = DeletionVectors.DvDescriptor(
      "u", "ab/" + Z85.encode(bb.array()), Some(1L), 10, 1L)
    assert(d.filePath("/tbl").get.toString == s"/tbl/ab/deletion_vector_$uuid.bin")
    val bare = DeletionVectors.DvDescriptor(
      "u", Z85.encode(bb.array()), Some(1L), 10, 1L)
    assert(bare.filePath("/tbl").get.toString == s"/tbl/deletion_vector_$uuid.bin")
  }

  test("run cookie with >=4 containers includes an offset header (decode path)") {
    // 4 run containers on keys 0..3, each runs [10,12]; with the
    // SERIAL_COOKIE (12347) and size >= 4 the offset header is present
    // and must be consumed before the container bodies
    val size = 4
    val bm = ByteBuffer.allocate(4 + 1 + size * 4 + size * 4 + size * (2 + 4))
      .order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | ((size - 1) << 16))
    bm.put(0x0f.toByte) // all four are run containers
    (0 until size).foreach { k => bm.putShort(k.toShort); bm.putShort(2) } // card-1 = 2
    val headerLen = 4 + 1 + size * 4 + size * 4
    (0 until size).foreach(i => bm.putInt(headerLen + i * 6)) // offsets
    (0 until size).foreach { _ => bm.putShort(1); bm.putShort(10); bm.putShort(2) }
    val arr = ByteBuffer.allocate(12 + bm.position()).order(ByteOrder.LITTLE_ENDIAN)
    arr.putInt(RoaringBitmapArray.Magic).putLong(1L).put(bm.array(), 0, bm.position())
    val parsed = RoaringBitmapArray.deserialize(arr.array())
    (0 until size).foreach { k =>
      (10 to 12).foreach(v => assert(parsed.contains((k.toLong << 16) + v)))
      assert(!parsed.contains((k.toLong << 16) + 13))
    }
    assert(parsed.cardinality == size * 3)
  }

  // ---------------- hand-authored log (the FORMAT, not our writer) ----------------

  /** 4-row single file table whose add carries an INLINE dv deleting
    * rows 1 and 3 (what a delta-rs writer with inline DVs produces).
    */
  test("inline deletion vector in a hand-authored log hides the right rows") {
    val dir = tempDir("dv-hand").toString + "/t"
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val size = putFile(Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "v"),
      dir, "f0.parquet")

    val bm = RoaringBitmapArray.fromSorted(Array(1L, 3L))
    val data = bm.serialize
    val a = mapper.createObjectNode()
    a.put("path", "f0.parquet")
    a.putObject("partitionValues")
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    val dv = a.putObject("deletionVector")
    dv.put("storageType", "i")
    dv.put("pathOrInlineDv", Z85.encode(data))
    dv.put("sizeInBytes", data.length)
    dv.put("cardinality", 2L)

    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaDataJson(schema, Seq.empty),
      s"""{"add":${mapper.writeValueAsString(a)}}"""))

    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
  }

  test("unknown reader features are refused loudly") {
    val dir = tempDir("dv-refuse").toString + "/t"
    val schema = StructType(Seq(StructField("id", LongType)))
    val size = putFile(Seq(Tuple1(1L)).toDF("id"), dir, "f0.parquet")
    putCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","futureUnknownFeature"],"writerFeatures":[]}}""",
      metaDataJson(schema, Seq.empty),
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("futureUnknownFeature"))
  }

  // ---------------- writer end-to-end ----------------

  private def sampleTable(): (String, DataFrame) = {
    val dir = tempDir("dv-write").toString + "/t"
    val df = (1 to 100).map(i =>
      (i.toLong, s"name_$i", if (i % 3 == 0) -i.toDouble else i.toDouble, s"seg${i % 4}"))
      .toDF("id", "name", "bal", "seg")
    DeltaWrite.append(spark, df, dir, partitionBy = Seq("seg"))
    (dir, df)
  }

  private def dataFiles(dir: String): Set[String] = {
    val it = fs(dir).listFiles(new Path(dir), true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")
          && !s.getPath.toString.contains("_delta_log"))
        out += s.getPath.toString + "@" + s.getModificationTime
    }
    out.result()
  }

  test("DvBitmapAgg folds row indexes into one bitmap row per file, map-side combined") {
    // many rows in, O(files) rows out — the executor-side construction
    // deleteWhereDv collects (driver payload is files × dv bytes, not
    // deleted rows × 8 bytes)
    val pairs = (0L until 10000L).map(i => (s"f${i % 3}", i / 3)).toDF("file", "row")
      .repartition(8)
    val agged = pairs.groupBy(col("file")).agg(DvBitmapAgg.bitmap(col("row")).as("dv"))
      .select(col("file"), col("dv.dv").as("bytes"), col("dv.cardinality"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_graft_dv_bitmap"), s"expected map-side combine:\n$plan")
    val out = agged.collect()
    assert(out.length == 3)
    out.foreach { r =>
      val bm = RoaringBitmapArray.deserialize(r.getAs[Array[Byte]]("bytes"))
      val expect = (0L until 10000L).filter(i => s"f${i % 3}" == r.getString(0)).map(_ / 3).distinct
      assert(bm.toArray.toSeq == expect.sorted)
      assert(r.getAs[Long]("cardinality") == expect.size.toLong)
      assert(bm.cardinality == expect.size.toLong)
    }
  }

  test("deleteWhereDv deletes rows without touching any data file") {
    val (dir, df) = sampleTable()
    val before = dataFiles(dir)
    val res = DeltaWrite.deleteWhereDv(spark, dir,
      Filters.normalize(Seq(Filter("bal", "<", 0.0))))
    assert(res.filesAdded > 0 && res.filesAdded == res.filesRemoved)
    assert(dataFiles(dir) == before, "a data file was rewritten or added")
    assert(fs(dir).listStatus(new Path(dir)).exists(_.getPath.getName.endsWith(".bin")),
      "no DV file written")

    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    val expected = df.where("bal >= 0").select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)

    // time travel to before the DV commit sees all rows
    val all = t(spark, ReadArgs(extra = Map(t.VersionKey -> 0L)))
      .count()
    assert(all == 100)

    // partition pruning still composes with DVs
    val pruned = t(spark, ReadArgs(filters = Filters.normalize(Seq(Filter("seg", "=", "seg1")))))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      df.where("seg = 'seg1' and bal >= 0").select("id").as[Long].collect().sorted.toSeq)
  }

  test("second deleteWhereDv unions with the existing DV") {
    val (dir, df) = sampleTable()
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("bal", "<", 0.0))))
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("id", "<=", 10L))))
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    val expected = df.where("bal >= 0 and id > 10").select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("copy-on-write deleteWhere on a DV-bearing table keeps DV rows deleted") {
    val (dir, df) = sampleTable()
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("bal", "<", 0.0))))
    // rewrite path: this delete rewrites files and must NOT resurrect
    // the DV-deleted rows of those files
    DeltaWrite.deleteWhere(spark, dir, Filters.normalize(Seq(Filter("id", ">", 90L))))
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    val expected = df.where("bal >= 0 and id <= 90").select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("checkpoint preserves DVs and the feature protocol") {
    val (dir, df) = sampleTable()
    DeltaWrite.deleteWhereDv(spark, dir, Filters.normalize(Seq(Filter("bal", "<", 0.0))))
    val cpVersion = DeltaWrite.checkpoint(spark, dir)
    // age out the replayed JSON prefix — replay must now come from the
    // checkpoint alone
    val logDir = DeltaLog.logDir(dir)
    (0L to cpVersion).foreach { v =>
      fs(dir).delete(new Path(logDir, f"$v%020d.json"), false)
    }
    val t = new DeltaTable("t", dir)
    val got = t(spark, ReadArgs()).select("id").as[Long].collect().sorted.toSeq
    val expected = df.where("bal >= 0").select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  // ---------------- helpers shared with DeltaSpec conventions ----------------

  private def putFile(df: DataFrame, tableDir: String, relPath: String): Long = {
    val tmp = tempDir("dvfile").toString + "/out"
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

  private def metaDataJson(schema: StructType, partitionColumns: Seq[String]): String = {
    val m = mapper.createObjectNode()
    m.put("id", "11111111-2222-3333-4444-555555555555")
    m.putObject("format").put("provider", "parquet")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    m.putObject("configuration")
    s"""{"metaData":${mapper.writeValueAsString(m)}}"""
  }
}
