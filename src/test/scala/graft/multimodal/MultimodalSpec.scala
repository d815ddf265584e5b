package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("binary payload plumbing: schema and byte stats") {
    val df = Multimodal.payloadStats(Multimodal.asBinaryPayload(docs, "text"))
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Multimodal.MediaMetaType.fieldNames.toSeq)
    val stats = df.select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(stats == Map(1L -> 11L, 2L -> 0L))
  }

  test("frame sampling slices the payload into n windows") {
    val df = Multimodal.frameSample(
      Multimodal.asBinaryPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"), "text"),
      "payload", n = 5)
    val frames = df.select("frames").head().getAs[scala.collection.Seq[Array[Byte]]](0)
    assert(frames.size == 5)
    assert(frames.map(new String(_, "UTF-8")).mkString == "abcdefghij")
  }

  test("resize stub truncates to the byte budget") {
    val df = Multimodal.resizeStub(
      Multimodal.asBinaryPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"), "text"),
      "payload", targetBytes = 4)
    assert(new String(df.select("payload").head().getAs[Array[Byte]](0), "UTF-8") == "abcd")
  }

  test("stubbed decode runs batched per partition with a stable feature") {
    val df = Multimodal.decodeFeatures(
      Multimodal.asBinaryPayload(docs, "text"), "payload", dim = 4)
    val row = df.where(col("doc_id") === 1).select("decoded.*").head()
    assert(row.getAs[Long]("n_bytes") == 11L)
    assert(row.getAs[String]("digest") == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    val feature = row.getAs[scala.collection.Seq[Float]]("feature").toSeq
    assert(feature.size == 4)
    // determinism across runs
    val again = Multimodal.decodeFeatures(
      Multimodal.asBinaryPayload(docs, "text"), "payload", dim = 4)
      .where(col("doc_id") === 1).select("decoded.feature").head()
      .getAs[scala.collection.Seq[Float]](0).toSeq
    assert(again == feature)
  }

  // ---- real header parsing (no codec library involved) ----

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    b.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64)
    bb.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
    bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16)       // APP0, len 16
    bb.put(new Array[Byte](14))                             // APP0 body
    bb.put(0xFF.toByte).put(0xC0.toByte).putShort(11)       // SOF0, len 11
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    bb.put(3.toByte).put(new Array[Byte](3))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
    bb.array()
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).put(new Array[Byte](16)).putInt(w).putInt(-h)
    bb.array()
  }

  test("image headers parse format and dimensions from real byte layouts") {
    val rows = Seq(
      (1L, pngBytes(640, 480)),
      (2L, jpegBytes(1920, 1080)),
      (3L, gifBytes(12, 34)),
      (4L, bmpBytes(300, 200)),      // top-down BMP: negative stored height
      (5L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
      .withColumn("meta", ImageHeader.imageMeta(col("payload")))
      .select(col("id"), col("meta.format"), col("meta.width"), col("meta.height"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.get(2), r.get(3))).toMap
    assert(rows(1L) == (("png", 640, 480)))
    assert(rows(2L) == (("jpeg", 1920, 1080)))
    assert(rows(3L) == (("gif", 12, 34)))
    assert(rows(4L) == (("bmp", 300, 200)))
    assert(rows(5L) == ((null, null, null))) // unrecognized → null, never guessed
  }

  test("JPEG fill bytes and truncation edges parse per the spec") {
    // fill byte before the SOF marker: FF FF C0 is legal padding
    val withFill = {
      val bb = java.nio.ByteBuffer.allocate(32)
      bb.put(0xFF.toByte).put(0xD8.toByte)
      bb.put(0xFF.toByte) // fill
      bb.put(0xFF.toByte).put(0xC0.toByte).putShort(11)
      bb.put(8.toByte).putShort(480.toShort).putShort(640.toShort)
      bb.put(3.toByte).put(new Array[Byte](3))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    assert(ImageHeader.parse(withFill).contains(("jpeg", 640, 480)))
    // payload ending exactly after the dimension bytes still parses
    val exact = jpegBytes(100, 50)
    val sofEnd = exact.length - 4 // strip the component bytes after dims
    assert(ImageHeader.parse(exact.take(sofEnd)).contains(("jpeg", 100, 50)))
    // EOI before any SOF refuses
    assert(ImageHeader.parse(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }

  test("truncated or desynchronized headers return null, not garbage") {
    val bad = Seq(
      pngBytes(640, 480).take(20),                  // truncated IHDR
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x01), // JPEG desync
      Array.empty[Byte])
    bad.zipWithIndex.foreach { case (b, i) =>
      assert(ImageHeader.parse(b).isEmpty, s"case $i should refuse")
    }
  }

  private def webpBytes(chunk: String, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(32)
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put(chunk.getBytes("US-ASCII")).putInt(20)
    chunk match {
      case "VP8 " => // 3-byte frame tag, sync code, 14-bit LE dims
        bb.put(new Array[Byte](3))
        bb.put(0x9D.toByte).put(0x01.toByte).put(0x2A.toByte)
        bb.putShort((w & 0x3FFF).toShort).putShort((h & 0x3FFF).toShort)
      case "VP8L" => // signature, then w-1 | (h-1)<<14 packed LE
        bb.put(0x2F.toByte)
        bb.putInt((w - 1) | ((h - 1) << 14))
      case "VP8X" => // flags+reserved, then 24-bit minus-one dims
        bb.putInt(0)
        val cw = w - 1; val ch = h - 1
        bb.put((cw & 0xFF).toByte).put(((cw >> 8) & 0xFF).toByte).put(((cw >> 16) & 0xFF).toByte)
        bb.put((ch & 0xFF).toByte).put(((ch >> 8) & 0xFF).toByte).put(((ch >> 16) & 0xFF).toByte)
    }
    bb.array()
  }

  private def tiffBytes(le: Boolean, w: Int, h: Int, shortType: Boolean): Array[Byte] = {
    val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.allocate(64).order(order)
    if (le) bb.put('I'.toByte).put('I'.toByte).put(0x2A.toByte).put(0x00.toByte)
    else bb.put('M'.toByte).put('M'.toByte).put(0x00.toByte).put(0x2A.toByte)
    bb.putInt(8) // IFD0 at byte 8
    bb.putShort(2)
    def entry(tag: Int, v: Int): Unit = {
      bb.putShort(tag.toShort)
      bb.putShort(if (shortType) 3.toShort else 4.toShort)
      bb.putInt(1)
      // SHORT occupies the FIRST two bytes of the value field under
      // either byte order; LONG fills it
      if (shortType) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v)
    }
    entry(256, w); entry(257, h)
    bb.putInt(0) // next-IFD terminator
    bb.array()
  }

  test("WebP lossy/lossless/extended and TIFF both byte orders parse") {
    assert(ImageHeader.parse(webpBytes("VP8 ", 640, 480)).contains(("webp", 640, 480)))
    assert(ImageHeader.parse(webpBytes("VP8L", 123, 45)).contains(("webp", 123, 45)))
    assert(ImageHeader.parse(webpBytes("VP8X", 4000, 3000)).contains(("webp", 4000, 3000)))
    assert(ImageHeader.parse(tiffBytes(le = true, 800, 600, shortType = true))
      .contains(("tiff", 800, 600)))
    assert(ImageHeader.parse(tiffBytes(le = false, 800, 600, shortType = true))
      .contains(("tiff", 800, 600)))
    assert(ImageHeader.parse(tiffBytes(le = true, 70000, 50000, shortType = false))
      .contains(("tiff", 70000, 50000)))
    assert(ImageHeader.parse(tiffBytes(le = false, 70000, 50000, shortType = false))
      .contains(("tiff", 70000, 50000)))
    // corrupted variants refuse
    assert(ImageHeader.parse(webpBytes("VP8 ", 640, 480).take(25)).isEmpty)
    val badSync = webpBytes("VP8 ", 640, 480); badSync(23) = 0x00
    assert(ImageHeader.parse(badSync).isEmpty)
    val farIfd = tiffBytes(le = true, 800, 600, shortType = true)
    farIfd(4) = 0x7F.toByte; farIfd(7) = 0x7F.toByte // IFD offset past payload
    assert(ImageHeader.parse(farIfd).isEmpty)
  }
}
