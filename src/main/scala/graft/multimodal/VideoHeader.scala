package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video container header parsing from the public byte layouts — the
  * video analog of [[ImageHeader]]/[[AudioHeader]], completing the
  * image/audio/video multimodal triad: metadata (format, frame
  * dimensions, duration) extracted from the payload's leading bytes
  * with NO codec library, as a native expression usable in any scan.
  *
  *  - MP4 / ISO BMFF (ISO/IEC 14496-12): big-endian size+fourcc box
  *    walk; `moov/mvhd` carries timescale+duration (v0 32-bit or v1
  *    64-bit), the first `moov/trak/tkhd` with a nonzero width gives
  *    the 16.16 fixed-point frame size. Walk, not fixed offsets —
  *    writers interpose `free`/`udta` boxes and order varies.
  *  - AVI: RIFF container, "AVI " form; `LIST hdrl` holds the `avih`
  *    main header (µs-per-frame, total frames, width, height —
  *    little-endian, like WAV).
  *  - Matroska/WebM: EBML varint element walk; `Segment > Info`
  *    carries TimestampScale (ns/tick) + Duration (float ticks),
  *    `Segment > Tracks > TrackEntry > Video` carries
  *    PixelWidth/PixelHeight.
  *
  * Malformed input refuses (null), never throws: sizes are validated
  * against the buffer before every advance, and a non-advancing walk
  * aborts — the same adversarial-byte discipline the WAV chunk walk
  * got in r6.
  *
  * Reference surface: datarepo treats media as opaque blobs; header
  * metadata extraction is this engine's multimodal extension (SURVEY
  * §2 P13/P47, here widened to video).
  */
object VideoHeader {

  val HeaderType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  def videoMeta(payload: Column): Column =
    Bridge.column(VideoMeta(Bridge.expression(payload)))

  /** Driver-side parser (shared with the expression; exposed for
    * tests and local tooling). Returns
    * (format, width, height, durationMs).
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (b == null || b.length < 12) return None
    def u8(i: Int): Int = b(i) & 0xFF
    if (u8(4) == 'f' && u8(5) == 't' && u8(6) == 'y' && u8(7) == 'p') parseMp4(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') parseAvi(b)
    else if (u8(0) == 0x1A && u8(1) == 0x45 && u8(2) == 0xDF && u8(3) == 0xA3)
      parseMkv(b)
    else None
  }

  // ---------- MP4 / ISO base media file format ----------

  private def be32(b: Array[Byte], i: Int): Long =
    (((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)) & 0xFFFFFFFFL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** Walk the boxes in [start, end); `f` gets (fourcc, bodyStart,
    * bodyEnd) and returns true to keep walking. Returns false on a
    * corrupt layout (non-advancing or overflowing box).
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var i = start
    while (i + 8 <= end) {
      val size32 = be32(b, i)
      val tpe = new String(b, i + 4, 4, "US-ASCII")
      var bodyStart = i + 8
      val boxEnd: Long =
        if (size32 == 0) end.toLong // box extends to the end
        else if (size32 == 1) {
          if (i + 16 > end) return false
          bodyStart = i + 16
          i + be64(b, i + 8)
        } else i + size32
      if (boxEnd < bodyStart || boxEnd > end) return false
      if (!f(tpe, bodyStart, boxEnd.toInt)) return true // caller is done
      if (boxEnd.toInt <= i) return false // no forward progress
      i = boxEnd.toInt
    }
    true
  }

  private def parseMp4(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    var durationMs = -1L
    var width = -1
    var height = -1
    walkBoxes(b, 0, b.length) { (tpe, s, e) =>
      if (tpe == "moov") {
        walkBoxes(b, s, e) { (t2, s2, e2) =>
          if (t2 == "mvhd" && e2 - s2 >= 20) {
            val version = b(s2) & 0xFF
            if (version == 1 && e2 - s2 >= 32) {
              val timescale = be32(b, s2 + 20)
              val duration = be64(b, s2 + 24)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            } else if (version == 0) {
              val timescale = be32(b, s2 + 12)
              val duration = be32(b, s2 + 16)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            }
          } else if (t2 == "trak" && width < 0) {
            walkBoxes(b, s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd") {
                val version = b(s3) & 0xFF
                // width/height are the last 8 bytes of the tkhd body,
                // 16.16 fixed point (body is 84 bytes v0, 96 v1)
                val need = if (version == 1) 96 else 84
                if (e3 - s3 >= need) {
                  val w = (be32(b, e3 - 8) >> 16).toInt
                  val h = (be32(b, e3 - 4) >> 16).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                }
              }
              true
            }
          }
          true
        }
      }
      true
    }
    if (durationMs >= 0 && width > 0) Some(("mp4", width, height, durationMs))
    else None
  }

  // ---------- AVI (RIFF) ----------

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF).toLong << 24)) & 0xFFFFFFFFL

  private def parseAvi(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    // walk RIFF chunks from offset 12 looking for LIST/hdrl → avih
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4)
      if (size > (b.length - i - 8).toLong) return None
      if (id == "LIST" && size >= 4 &&
        new String(b, i + 8, 4, "US-ASCII") == "hdrl") {
        // sub-chunks of the list body, after the 4-byte list type
        var j = i + 12
        val end = i + 8 + size.toInt
        while (j + 8 <= end) {
          val subId = new String(b, j, 4, "US-ASCII")
          val subSize = le32(b, j + 4)
          if (subSize > (end - j - 8).toLong) return None
          if (subId == "avih" && subSize >= 40) {
            val usPerFrame = le32(b, j + 8)
            val totalFrames = le32(b, j + 8 + 16)
            val width = le32(b, j + 8 + 32).toInt
            val height = le32(b, j + 8 + 36).toInt
            if (width <= 0 || height <= 0) return None
            return Some(("avi", width, height, usPerFrame * totalFrames / 1000L))
          }
          val next = j + 8 + subSize.toInt + (subSize.toInt & 1)
          if (next <= j) return None
          j = next
        }
        return None
      }
      val next = i + 8 + size.toInt + (size.toInt & 1)
      if (next <= i) return None
      i = next
    }
    None
  }

  // ---------- Matroska / WebM (EBML) ----------

  /** EBML varint at `i`: returns (value, nBytes), with the length
    * marker stripped when `stripMarker`; (−1, 0) on overflow/invalid.
    * All-ones ("unknown size") yields −1 → treated as corrupt here.
    */
  private def readVint(b: Array[Byte], i: Int, stripMarker: Boolean): (Long, Int) = {
    if (i >= b.length) return (-1L, 0)
    val first = b(i) & 0xFF
    if (first == 0) return (-1L, 0)
    val n = Integer.numberOfLeadingZeros(first) - 24 + 1 // 1..8
    if (i + n > b.length) return (-1L, 0)
    var v: Long = if (stripMarker) (first & (0xFF >> n)).toLong else first.toLong
    var k = 1
    while (k < n) { v = (v << 8) | (b(i + k) & 0xFF); k += 1 }
    if (stripMarker) {
      // all value bits set = reserved "unknown" size
      val valueBits = 7 * n
      val allOnes = if (valueBits >= 63) Long.MaxValue else (1L << valueBits) - 1
      if (v == allOnes) return (-1L, 0)
    }
    (v, n)
  }

  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    if (e - s > 8) return -1L
    while (i < e) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(be32(b, s).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(be64(b, s))
    case _ => Double.NaN
  }

  /** Walk EBML elements in [start, end); f(id, bodyStart, bodyEnd). */
  private def walkEbml(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Boolean = {
    var i = start
    while (i < end) {
      val (id, idLen) = readVint(b, i, stripMarker = false)
      if (idLen == 0) return false
      val (size, szLen) = readVint(b, i + idLen, stripMarker = true)
      if (szLen == 0 || size < 0) return false
      val bodyStart = i + idLen + szLen
      val bodyEnd = bodyStart + size
      if (bodyEnd > end || bodyEnd <= i) return false
      f(id, bodyStart, bodyEnd.toInt)
      i = bodyEnd.toInt
    }
    true
  }

  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL

  private def parseMkv(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    var scaleNs = 1000000L // spec default: 1 ms ticks
    var durationTicks = Double.NaN
    var width = -1
    var height = -1
    // Nested walks must also refuse on corruption — a bad element
    // INSIDE Segment/Info/Tracks is just as malformed as one at the
    // top level, so every walk's result folds into `bad`.
    var bad = false
    def walk(s: Int, e: Int)(f: (Long, Int, Int) => Unit): Unit =
      if (!walkEbml(b, s, e)(f)) bad = true
    walk(0, b.length) { (id, s, e) =>
      if (id == IdSegment) {
        walk(s, e) { (id2, s2, e2) =>
          if (id2 == IdInfo) {
            walk(s2, e2) { (id3, s3, e3) =>
              if (id3 == IdTimestampScale) scaleNs = ebmlUint(b, s3, e3)
              else if (id3 == IdDuration) durationTicks = ebmlFloat(b, s3, e3)
            }
          } else if (id2 == IdTracks) {
            walk(s2, e2) { (id3, s3, e3) =>
              if (id3 == IdTrackEntry) {
                walk(s3, e3) { (id4, s4, e4) =>
                  if (id4 == IdVideo && width < 0) {
                    walk(s4, e4) { (id5, s5, e5) =>
                      if (id5 == IdPixelWidth) width = ebmlUint(b, s5, e5).toInt
                      else if (id5 == IdPixelHeight) height = ebmlUint(b, s5, e5).toInt
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
    if (bad || width <= 0 || height <= 0 || scaleNs <= 0 ||
      durationTicks.isNaN || durationTicks < 0) None
    else Some(("mkv", width, height, (durationTicks * scaleNs / 1000000.0).toLong))
  }
}

/** Native header-parse expression: binary → struct(format, width,
  * height, duration_ms) | null.
  */
case class VideoMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = VideoHeader.HeaderType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override def nullSafeEval(v: Any): Any =
    VideoHeader.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some((fmt, w, h, ms)) =>
        InternalRow(UTF8String.fromString(fmt), w, h, ms)
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): VideoMeta =
    copy(child = c)
}
