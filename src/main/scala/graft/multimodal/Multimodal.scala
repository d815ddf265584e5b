package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns plus a typed metadata struct.
  * The *decode* step is environment-dependent (codec libraries are
  * not present in this container) and is stubbed behind
  * [[StubDecoders]] with a deterministic fake, but the Spark-side
  * plumbing — schema, batched per-partition execution, feature
  * schema — is real: swap the stub for a JNI/codec call and nothing
  * else changes.
  */
object Multimodal {

  /** Canonical metadata struct carried beside a binary payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // "png", "wav", ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  val FeatureType: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("digest", StringType),
    StructField("feature", ArrayType(FloatType))
  ))

  /** Wrap a string column as a binary payload (UTF-8) with metadata —
    * lets the full pipeline be exercised on the text corpus.
    */
  def asBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta",
        struct(
          lit("image").as("media_type"),
          lit("raw").as("format"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(LongType).as("duration_ms")))

  /** Columnar (codegen'd) feature extraction over the payload —
    * byte length and md5 digest are real; suitable as the oracle-
    * checkable part of the pipeline.
    */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)).cast(LongType))
      .withColumn("digest", md5(hex(col(payloadCol)))) // hex is uppercase in Spark and DuckDB alike

  /** Frame sampling: slice the payload into `n` evenly-spaced byte
    * windows (array of binary "frames"). Pure columnar arithmetic —
    * with a real container format the slicing offsets would come from
    * the codec, but the schema/fan-out shape (one row → n frames) is
    * exactly what a video pipeline needs and is what's exercised here.
    */
  def frameSample(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = octet_length(col(payloadCol))
    val step = greatest(len.divide(n).cast(IntegerType), lit(1))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)), i =>
        col(payloadCol).substr(i * step + 1, step)))
  }

  /** "Resize" stub: truncate/pad the payload to a fixed byte budget —
    * stands in for image resizing (deterministic; the real operation
    * swaps in at the same column-in/column-out seam).
    */
  def resizeStub(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame =
    df.withColumn(payloadCol, col(payloadCol).substr(lit(1), lit(targetBytes)))

  /** Batched per-partition "decode + featurize" — the seam where a
    * real decoder plugs in. Runs as `mapPartitions` so a native codec
    * can amortize initialization per batch, mirroring the
    * mapInPandas batching pattern.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val outSchema = StructType(inSchema.fields :+ StructField("decoded", FeatureType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      // per-partition decoder init happens here (stub: none needed)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (nBytes, digest, feat) = StubDecoders.decode(bytes, dim)
        Row.fromSeq(r.toSeq :+ Row(nBytes, digest, feat))
      }
    }(enc)
    out
  }
}

/** Deterministic audio-container payload builders — the stand-in for
  * real media columns in this codec-less container (same policy as
  * [[StubDecoders]]): the headers are REAL (byte-exact WAV/FLAC/MP3
  * layouts that any external parser reads), only the sample data is
  * absent/zeroed. Lets [[AudioHeader]] be exercised end-to-end in an
  * oracle-checked distributed query.
  */
object SynthAudio {
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Header-only WAV (PCM16) declaring `secs` seconds of data. */
  def wav(channels: Int, rate: Int, secs: Int): Array[Byte] = {
    val byteRate = rate.toLong * channels * 2
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16)
    val data = "data".getBytes ++ le32(byteRate * secs)
    "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++ "WAVE".getBytes ++
      fmt ++ data
  }

  /** fLaC + STREAMINFO for `secs` seconds at `rate`. */
  def flac(rate: Int, channels: Int, secs: Int): Array[Byte] = {
    val totalSamples = rate.toLong * secs
    val si = new Array[Byte](34)
    si(10) = ((rate >> 12) & 0xFF).toByte
    si(11) = ((rate >> 4) & 0xFF).toByte
    si(12) = (((rate & 0x0F) << 4) | (((channels - 1) & 0x07) << 1)).toByte
    si(13) = ((0x0F << 4) | ((totalSamples >> 32) & 0x0F).toInt).toByte // 16-bit bps
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ si
  }

  /** 128 kbps / 44100 Hz MPEG-1 Layer III stream of `secs` seconds
    * (zero-padded to the exact CBR length: 16000 bytes/s).
    */
  def mp3(mono: Boolean, secs: Int): Array[Byte] = {
    val h = Array(0xFF.toByte, 0xFB.toByte,
      ((9 << 4) | (0 << 2)).toByte, (if (mono) 0xC0 else 0x00).toByte)
    h ++ new Array[Byte](16000 * secs - 4)
  }
}

/** Deterministic video-container payload builders (same policy as
  * [[SynthAudio]]): REAL byte-exact MP4/AVI/MKV header layouts that
  * any external parser reads; only the media data is absent. Lets
  * [[VideoHeader]] be exercised end-to-end in an oracle-checked
  * distributed query.
  */
object SynthVideo {
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body

  /** ftyp + free + moov(mvhd v0 + trak(tkhd v0)) — the `free` box
    * interposed so parsers must walk, not assume offsets.
    */
  def mp4(width: Int, height: Int, timescale: Int, durationTicks: Long): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isomiso2".getBytes)
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durationTicks) ++
        be32(0x00010000L) ++ Array.fill[Byte](76)(0))
    // tkhd body: verflags + 5×u32 + reserved(8) + layer/alt/vol/res +
    // 36-byte matrix + 16.16 width/height = 84 bytes
    val tkhd = box("tkhd",
      be32(0x00000007L) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(durationTicks) ++ Array.fill[Byte](8)(0) ++
        le16(0) ++ le16(0) ++ le16(0) ++ le16(0) ++
        Array.fill[Byte](36)(0) ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ box("free", Array.fill[Byte](12)(0)) ++ moov
  }

  /** RIFF/AVI with a LIST hdrl carrying the avih main header. */
  def avi(width: Int, height: Int, usPerFrame: Int, totalFrames: Int): Array[Byte] = {
    val avih = "avih".getBytes ++ le32(56) ++
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(totalFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill[Byte](16)(0)
    val hdrl = "LIST".getBytes ++ le32(4L + avih.length) ++ "hdrl".getBytes ++ avih
    val movi = "LIST".getBytes ++ le32(4) ++ "movi".getBytes
    "RIFF".getBytes ++ le32(4L + hdrl.length + movi.length) ++ "AVI ".getBytes ++
      hdrl ++ movi
  }

  private def ebml(id: Long, body: Array[Byte]): Array[Byte] = {
    // IDs are stored with their marker bits; emit minimal big-endian
    val idBytes = {
      var n = 1; while (n < 8 && (id >> (8 * n)) != 0) n += 1
      (0 until n).reverseIterator.map(k => ((id >> (8 * k)) & 0xFF).toByte).toArray
    }
    require(body.length < 0x7F, "synth builder: 1-byte sizes only")
    idBytes ++ Array((0x80 | body.length).toByte) ++ body
  }
  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1; while (n < 8 && (v >> (8 * n)) != 0) n += 1
    (0 until n).reverseIterator.map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray
  }

  /** Minimal Matroska: EBML header + Segment(Info(TimestampScale,
    * Duration f64), Tracks(TrackEntry(Video(PixelWidth, PixelHeight)))).
    */
  def mkv(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    val header = ebml(0x1A45DFA3L, ebml(0x4282L, "matroska".getBytes("US-ASCII")))
    val durBits = java.lang.Double.doubleToLongBits(durationMs.toDouble)
    val info = ebml(0x1549A966L,
      ebml(0x2AD7B1L, ebmlUint(1000000L)) ++
        ebml(0x4489L, (0 until 8).reverseIterator
          .map(k => ((durBits >> (8 * k)) & 0xFF).toByte).toArray))
    val video = ebml(0xE0L, ebml(0xB0L, ebmlUint(width)) ++ ebml(0xBAL, ebmlUint(height)))
    val tracks = ebml(0x1654AE6BL, ebml(0xAEL, ebml(0xD7L, ebmlUint(1)) ++ video))
    header ++ ebml(0x18538067L, info ++ tracks)
  }
}

/** Deterministic fake decoders standing in for image/audio codecs
  * (STUB — the container has no codec libraries; see Multimodal doc).
  */
object StubDecoders {
  /** "Decode" = byte stats + a deterministic pseudo-feature vector
    * derived from byte content (stable across runs/engines).
    */
  def decode(bytes: Array[Byte], dim: Int): (Long, String, Seq[Float]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
    val hexStr = digest.map("%02x".format(_)).mkString
    val feat = (0 until dim).map { i =>
      // bytes of the digest, scaled to [0,1) — a stand-in embedding
      ((digest(i % digest.length) & 0xff).toFloat / 256.0f)
    }
    (if (bytes == null) 0L else bytes.length.toLong, hexStr, feat)
  }
}
