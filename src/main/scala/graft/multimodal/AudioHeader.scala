package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio container header parsing from the public byte layouts — the
  * audio analog of [[ImageHeader]]: metadata (format, sample rate,
  * channels, duration) extracted from the payload's leading bytes
  * with NO codec library, as a native expression usable in any scan.
  *
  *  - WAV: RIFF container, "WAVE" form; `fmt ` chunk carries
  *    channels/sampleRate/byteRate, `data` chunk size / byteRate
  *    gives duration. Chunk walk, not fixed offsets — writers may
  *    interpose LIST/fact chunks.
  *  - FLAC: "fLaC" then the mandatory first STREAMINFO metadata
  *    block: sample rate (20 bits), channels-1 (3 bits),
  *    total samples (36 bits) at bit offsets 80/100/108 of the
  *    34-byte block.
  *  - MP3: first MPEG audio frame header (11-bit sync): version +
  *    layer + bitrate/samplerate table indexes; duration is the
  *    stream-length estimate bytes·8/bitrate (exact for CBR).
  *
  * Reference surface: datarepo treats media as opaque blobs; header
  * metadata extraction is this engine's multimodal extension (SURVEY
  * §2 P13), here widened to audio.
  */
object AudioHeader {

  val HeaderType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  def audioMeta(payload: Column): Column =
    Bridge.column(AudioMeta(Bridge.expression(payload)))

  /** MPEG-1 Layer III bitrate table (kbps, index 1-14). */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  /** MPEG-1 sample-rate table (index 0-2). */
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  /** Driver-side parser (shared with the expression; exposed for
    * tests and local tooling). Returns
    * (format, sampleRate, channels, durationMs).
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
    def be24(i: Int): Int = (u8(i) << 16) | (u8(i + 1) << 8) | u8(i + 2)

    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // chunk walk: collect fmt (channels/sampleRate/byteRate) and
      // data (size); either may come after LIST/fact chunks
      var i = 12
      var channels = -1; var rate = -1; var byteRate = -1L; var dataSize = -1L
      while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val size = le32(i + 4)
        if (id == "fmt " && i + 24 <= b.length) {
          channels = le16(i + 10)
          rate = le32(i + 12).toInt
          byteRate = le32(i + 16)
        } else if (id == "data") {
          dataSize = size
        }
        // a body extending past the buffer (truncated prefix OR a
        // corrupt/adversarial size, incl. ones whose Int truncation is
        // negative) makes every later chunk unreachable — stop walking
        // and let the field validation below decide
        if (size > (b.length - i - 8).toLong) i = b.length
        else {
          // chunks are word-aligned: odd sizes carry a pad byte
          val next = i + 8 + size.toInt + (size.toInt & 1)
          if (next <= i) return None // no forward progress — corrupt
          i = next
        }
      }
      if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataSize < 0) None
      else Some(("wav", rate, channels, dataSize * 1000L / byteRate))
    } else if (b.length >= 4 + 4 + 34 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C' && (u8(4) & 0x7F) == 0) { // first block must be STREAMINFO
      val blockLen = be24(5)
      if (blockLen < 34) None
      else {
        val s = 8 // STREAMINFO start
        // bytes 10-12 of STREAMINFO: 20-bit sample rate, 3-bit
        // channels-1, then the 36-bit total-samples count whose top
        // 4 bits share byte 13
        val rate = (u8(s + 10) << 12) | (u8(s + 11) << 4) | (u8(s + 12) >> 4)
        val channels = ((u8(s + 12) >> 1) & 0x07) + 1
        val totalSamples =
          ((u8(s + 13) & 0x0F).toLong << 32) | (u8(s + 14).toLong << 24) |
            (u8(s + 15).toLong << 16) | (u8(s + 16).toLong << 8) | u8(s + 17).toLong
        if (rate <= 0) None
        else Some(("flac", rate, channels, totalSamples * 1000L / rate))
      }
    } else if (b.length >= 4 && u8(0) == 0xFF && (u8(1) & 0xE0) == 0xE0) {
      // MPEG-1 Layer III CBR frame header
      val versionBits = (u8(1) >> 3) & 0x03
      val layerBits = (u8(1) >> 1) & 0x03
      if (versionBits != 3 || layerBits != 1) None // MPEG-1 Layer III only
      else {
        val bitrateKbps = Mp3Bitrates((u8(2) >> 4) & 0x0F)
        val rate = Mp3Rates((u8(2) >> 2) & 0x03)
        if (bitrateKbps == 0 || rate == 0) None
        else {
          val channels = if (((u8(3) >> 6) & 0x03) == 3) 1 else 2
          Some(("mp3", rate, channels, b.length.toLong * 8L / bitrateKbps))
        }
      }
    } else None
  }
}

/** Native header-parse expression: binary → struct(format,
  * sample_rate, channels, duration_ms) | null.
  */
case class AudioMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AudioHeader.HeaderType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_meta"

  override def nullSafeEval(v: Any): Any =
    AudioHeader.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some((fmt, rate, ch, ms)) =>
        InternalRow(UTF8String.fromString(fmt), rate, ch, ms)
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): AudioMeta =
    copy(child = c)
}
