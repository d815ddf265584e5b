package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VideoHeader: MP4 box walk (mvhd v0/v1, tkhd 16.16 frame size),
  * AVI LIST/hdrl/avih, Matroska EBML varint walk — via the SynthVideo
  * builders plus hand-built adversarial layouts, and the expression
  * plumbing in a distributed plan.
  */
class VideoHeaderSpec extends SparkSpec {
  import spark.implicits._

  test("MP4: box walk finds mvhd timescale/duration + tkhd frame size") {
    // timescale 1000, 2500 ticks -> 2500 ms; free box interposed
    assert(VideoHeader.parse(SynthVideo.mp4(1280, 720, 1000, 2500L)) ==
      Some(("mp4", 1280, 720, 2500L)))
    // non-millisecond timescale: 90000 Hz, 45000 ticks -> 500 ms
    assert(VideoHeader.parse(SynthVideo.mp4(320, 240, 90000, 45000L)) ==
      Some(("mp4", 320, 240, 500L)))
  }

  test("MP4: 64-bit mvhd v1 duration parses") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, b: Array[Byte]): Array[Byte] =
      be32(8L + b.length) ++ t.getBytes ++ b
    // v1: verflags, creation(8), modification(8), timescale(4), duration(8)
    val mvhd = box("mvhd",
      be32(0x01000000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(600) ++ be32(1) ++ be32(200) ++ Array.fill[Byte](80)(0))
    // duration = (1 << 32) + 200 ticks at 600 Hz
    val tkhd = box("tkhd",
      be32(0x01000007L) ++ Array.fill[Byte](28)(0) ++ be32(0) ++ be32(300) ++
        Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++
        Array.fill[Byte](36)(0) ++ be32(640L << 16) ++ be32(480L << 16))
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200))
    val bytes = ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    val expectMs = (((1L << 32) + 200L) * 1000L) / 600L
    assert(VideoHeader.parse(bytes) == Some(("mp4", 640, 480, expectMs)))
  }

  test("AVI: LIST/hdrl/avih main header") {
    // 25 fps (40000 us/frame), 100 frames -> 4000 ms
    assert(VideoHeader.parse(SynthVideo.avi(720, 576, 40000, 100)) ==
      Some(("avi", 720, 576, 4000L)))
  }

  test("MKV: EBML walk reads TimestampScale/Duration and pixel size") {
    assert(VideoHeader.parse(SynthVideo.mkv(1920, 1080, 1234L)) ==
      Some(("mkv", 1920, 1080, 1234L)))
    assert(VideoHeader.parse(SynthVideo.mkv(640, 360, 500L)) ==
      Some(("mkv", 640, 360, 500L)))
  }

  test("malformed inputs refuse instead of misparsing") {
    assert(VideoHeader.parse(null).isEmpty)
    assert(VideoHeader.parse(Array.empty[Byte]).isEmpty)
    assert(VideoHeader.parse("RIFFxxxxWAVE".getBytes).isEmpty) // audio, not AVI
    // truncated mid-moov
    val full = SynthVideo.mp4(320, 240, 1000, 1000L)
    assert(VideoHeader.parse(full.take(full.length - 10)).isEmpty)
    // mkv with truncated segment body
    val mkv = SynthVideo.mkv(640, 360, 100L)
    assert(VideoHeader.parse(mkv.take(mkv.length - 3)).isEmpty)
    // ftyp only — no moov
    assert(VideoHeader.parse(full.take(24)).isEmpty)
  }

  test("MKV: corruption INSIDE the Segment refuses (nested walk result honored)") {
    def ebml(id: Long, body: Array[Byte]): Array[Byte] = {
      var n = 1; while (n < 8 && (id >> (8 * n)) != 0) n += 1
      val idBytes = (0 until n).reverseIterator
        .map(k => ((id >> (8 * k)) & 0xFF).toByte).toArray
      idBytes ++ Array((0x80 | body.length).toByte) ++ body
    }
    val header = ebml(0x1A45DFA3L, ebml(0x4282L, "matroska".getBytes("US-ASCII")))
    val durBits = java.lang.Double.doubleToLongBits(1234.0)
    val info = ebml(0x1549A966L,
      ebml(0x2AD7B1L, Array(0x0F.toByte, 0x42.toByte, 0x40.toByte)) ++
        ebml(0x4489L, (0 until 8).reverseIterator
          .map(k => ((durBits >> (8 * k)) & 0xFF).toByte).toArray))
    val video = ebml(0xE0L, ebml(0xB0L, Array(0x02.toByte, 0x80.toByte)) ++
      ebml(0xBAL, Array(0x01.toByte, 0x68.toByte)))
    val tracks = ebml(0x1654AE6BL, ebml(0xAEL, video))
    // sanity: the uncorrupted layout parses
    val good = header ++ ebml(0x18538067L, info ++ tracks)
    assert(VideoHeader.parse(good) == Some(("mkv", 640, 360, 1234L)))
    // a trailing element inside Segment claims a 16-byte body but only
    // 1 byte follows: the Segment's own bounds are consistent, so only
    // the NESTED walk sees the overrun — the parse must still refuse
    val corrupt = Array(0xEC.toByte, 0x90.toByte, 0x00.toByte)
    val evil = header ++ ebml(0x18538067L, info ++ tracks ++ corrupt)
    assert(VideoHeader.parse(evil).isEmpty)
    // corruption one level deeper (inside Tracks) also refuses
    val tracksEvil = ebml(0x1654AE6BL, ebml(0xAEL, video) ++ corrupt)
    assert(VideoHeader.parse(header ++ ebml(0x18538067L, info ++ tracksEvil)).isEmpty)
  }

  test("adversarial box sizes terminate (no infinite walk)") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // top-level box declaring size 4 (< header size): no forward progress
    val evil = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      be32(4) ++ "moov".getBytes ++ new Array[Byte](32)
    assert(VideoHeader.parse(evil).isEmpty)
    // 64-bit size overflowing the buffer
    val evil2 = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      be32(1) ++ "moov".getBytes ++ be32(0x7FFFFFFFL) ++ be32(0xFFFFFFF0L) ++
      new Array[Byte](32)
    assert(VideoHeader.parse(evil2).isEmpty)
    // EBML size vint all-ones ("unknown size") refuses
    val evilMkv = Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte,
      0xFF.toByte) ++ new Array[Byte](16)
    assert(VideoHeader.parse(evilMkv).isEmpty)
  }

  test("videoMeta expression extracts the struct in a distributed plan") {
    val rows = Seq(
      (1L, SynthVideo.mp4(1280, 720, 1000, 2500L)),
      (2L, SynthVideo.avi(720, 576, 40000, 100)),
      (3L, SynthVideo.mkv(1920, 1080, 1234L)),
      (4L, Array[Byte](9, 9, 9)))
    val got = rows.toDF("id", "payload").repartition(3)
      .select(col("id"), VideoHeader.videoMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"),
        col("m.duration_ms"))
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, Some("mp4"), Some(1280), Some(720), Some(2500L)),
      (2L, Some("avi"), Some(720), Some(576), Some(4000L)),
      (3L, Some("mkv"), Some(1920), Some(1080), Some(1234L)),
      (4L, None, None, None, None)))
  }
}
