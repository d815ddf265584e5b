package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AudioHeader: WAV chunk walk, FLAC STREAMINFO bit unpack, MP3 frame
  * header tables — hand-built byte arrays with known answers, plus
  * malformed-input refusals and the expression plumbing.
  */
class AudioHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Minimal WAV: RIFF + fmt + data chunks (header only — the parser
    * trusts the declared data size, as streaming metadata extraction
    * must).
    */
  private def wav(channels: Int, rate: Int, dataSize: Long,
      extraChunk: Boolean = false): Array[Byte] = {
    val byteRate = rate.toLong * channels * 2
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16)
    val list = if (!extraChunk) Array.empty[Byte]
      else "LIST".getBytes ++ le32(4) ++ "INFO".getBytes
    val data = "data".getBytes ++ le32(dataSize)
    "RIFF".getBytes ++ le32(4 + fmt.length + list.length + data.length) ++
      "WAVE".getBytes ++ list ++ fmt ++ data
  }

  /** Minimal FLAC: "fLaC" + STREAMINFO block with the 20/3/36-bit
    * packed fields.
    */
  private def flac(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = ((rate >> 12) & 0xFF).toByte
    si(11) = ((rate >> 4) & 0xFF).toByte
    val bpsM1 = 16 - 1 // 5-bit field split across bytes 12/13
    si(12) = (((rate & 0x0F) << 4) | (((channels - 1) & 0x07) << 1) |
      ((bpsM1 >> 4) & 1)).toByte
    si(13) = (((bpsM1 & 0x0F) << 4) | ((totalSamples >> 32) & 0x0F).toInt).toByte
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    "fLaC".getBytes ++ Array(0x00.toByte, 0x00.toByte, 0x00.toByte, 34.toByte) ++ si
  }

  /** MP3: MPEG-1 Layer III header (bitrate index, samplerate index,
    * mono flag) padded to `size` bytes.
    */
  private def mp3(bitrateIdx: Int, rateIdx: Int, mono: Boolean, size: Int): Array[Byte] = {
    val h = Array(0xFF.toByte, 0xFB.toByte,
      ((bitrateIdx << 4) | (rateIdx << 2)).toByte,
      (if (mono) 0xC0 else 0x00).toByte)
    h ++ new Array[Byte](size - 4)
  }

  test("WAV: chunk walk finds fmt/data, duration from byteRate") {
    // 44100 Hz stereo 16-bit: byteRate 176400; 1s of data
    assert(AudioHeader.parse(wav(2, 44100, 176400L)) ==
      Some(("wav", 44100, 2, 1000L)))
    // interposed LIST chunk before fmt — the walk skips it
    assert(AudioHeader.parse(wav(1, 8000, 1600L, extraChunk = true)) ==
      Some(("wav", 8000, 1, 100L)))
  }

  test("FLAC: STREAMINFO bit unpacking") {
    assert(AudioHeader.parse(flac(48000, 2, 48000L * 2)) ==
      Some(("flac", 48000, 2, 2000L)))
    assert(AudioHeader.parse(flac(96000, 8, 9600L)) ==
      Some(("flac", 96000, 8, 100L)))
  }

  test("MP3: frame-header tables + CBR length estimate") {
    // 128 kbps (idx 9), 44100 Hz (idx 0), stereo, 16000 bytes -> 1000 ms
    assert(AudioHeader.parse(mp3(9, 0, mono = false, 16000)) ==
      Some(("mp3", 44100, 2, 1000L)))
    // 320 kbps (idx 14), 32000 Hz (idx 2), mono
    assert(AudioHeader.parse(mp3(14, 2, mono = true, 40000)) ==
      Some(("mp3", 32000, 1, 1000L)))
  }

  test("malformed inputs refuse instead of misparsing") {
    assert(AudioHeader.parse(Array.empty[Byte]).isEmpty)
    assert(AudioHeader.parse("RIFFxxxxAVI ".getBytes).isEmpty) // not WAVE
    assert(AudioHeader.parse(wav(2, 44100, 176400L).take(20)).isEmpty) // truncated
    assert(AudioHeader.parse("fLaC".getBytes).isEmpty) // no STREAMINFO
    // free-format bitrate (idx 0) refuses
    assert(AudioHeader.parse(mp3(0, 0, mono = false, 4000)).isEmpty)
    // reserved samplerate index refuses
    assert(AudioHeader.parse(mp3(9, 3, mono = false, 4000)).isEmpty)
  }

  test("adversarial WAV chunk sizes terminate (no infinite walk)") {
    // a chunk declaring size 0xFFFFFFF8 (Int truncation -8 would
    // advance the walk by 0 bytes — the old hang) before fmt/data
    val evil = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFF8L) ++ new Array[Byte](64)
    assert(AudioHeader.parse(evil).isEmpty)
    // size 0xFFFFFFFF (Int truncation -1, would advance by 8-1+1=8
    // but skip no body) mid-stream, also unreachable-body → refuse
    val evil2 = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(0xFFFFFFFFL) ++ new Array[Byte](64)
    assert(AudioHeader.parse(evil2).isEmpty)
    // an in-range but oversized chunk body (claims more bytes than
    // remain) makes later chunks unreachable → refuse, don't misparse
    val evil3 = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(1 << 20) ++ new Array[Byte](16)
    assert(AudioHeader.parse(evil3).isEmpty)
  }

  test("audioMeta expression extracts the struct in a distributed plan") {
    val rows = Seq(
      (1L, wav(2, 44100, 176400L)),
      (2L, flac(48000, 2, 96000L)),
      (3L, mp3(9, 0, mono = false, 16000)),
      (4L, Array[Byte](1, 2, 3)))
    val got = rows.toDF("id", "payload").repartition(3)
      .select(col("id"), AudioHeader.audioMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.channels"), col("m.duration_ms"))
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, Some("wav"), Some(44100), Some(2), Some(1000L)),
      (2L, Some("flac"), Some(48000), Some(2), Some(2000L)),
      (3L, Some("mp3"), Some(44100), Some(2), Some(1000L)),
      (4L, None, None, None, None)))
  }
}
