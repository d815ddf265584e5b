package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL (not stubbed) image metadata extraction: container formats
  * put dimensions in fixed-layout headers, so format/width/height
  * parse from the first bytes with no codec library — the metadata
  * pass a multimodal pipeline runs before any decode, implemented
  * from the public format specs:
  *  - PNG: 8-byte signature, IHDR width/height big-endian at 16/20
  *  - JPEG: FF D8 then marker scan; SOFn segment carries height/width
  *  - GIF: "GIF87a"/"GIF89a", width/height little-endian at 6/8
  *  - BMP: "BM", width/height little-endian at 18/22 (BITMAPINFOHEADER)
  *  - WebP: RIFF container, "WEBP" form; VP8 (lossy frame tag + sync
  *    code, 14-bit dims), VP8L (lossless signature, packed 14-bit
  *    dims), VP8X (extended: 24-bit canvas minus-one dims)
  *  - TIFF: "II*\0" / "MM\0*", IFD0 walk for tags 256/257 (SHORT or
  *    LONG values) — also the byte layout inside JPEG EXIF APP1
  *
  * Returns struct(format, width, height); null for unrecognized
  * payloads — loud-by-absence, never a guessed size.
  */
object ImageHeader {

  val HeaderType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def imageMeta(payload: Column): Column =
    Bridge.column(ImageMeta(Bridge.expression(payload)))

  /** Driver-side parser (shared with the expression; exposed for
    * tests and local tooling).
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (b.length >= 24 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // marker scan for the first SOFn frame header
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xFF) return None // desynchronized — refuse
        val marker = u8(i + 1)
        if (marker == 0xFF) {
          i += 1 // fill byte: the next 0xFF starts the real marker
        } else if (marker == 0xD9) {
          return None // EOI before any SOF — no dimensions in stream
        } else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
          i += 2 // standalone markers carry no length
        } else {
          if (i + 3 >= b.length) return None
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            // dimensions live at bytes i+5..i+8
            if (i + 9 > b.length) return None
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          }
          i += 2 + len
        }
      }
      None
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(18), math.abs(le32(22)))) // height may be negative (top-down)
    else if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      val chunk = new String(b.slice(12, 16), "US-ASCII")
      chunk match {
        case "VP8 " =>
          // lossy: 3-byte frame tag then sync 9D 01 2A, 14-bit dims
          if (u8(23) == 0x9D && u8(24) == 0x01 && u8(25) == 0x2A)
            Some(("webp", le16(26) & 0x3FFF, le16(28) & 0x3FFF))
          else None
        case "VP8L" =>
          // lossless: signature 2F, then width-1 in bits 0..13,
          // height-1 in bits 14..27 of the next 4 LE bytes
          if (u8(20) == 0x2F) {
            val v = le32(21)
            Some(("webp", (v & 0x3FFF) + 1, ((v >>> 14) & 0x3FFF) + 1))
          } else None
        case "VP8X" =>
          // extended: canvas dims as 24-bit minus-one at payload +4/+7
          Some(("webp", le24(24) + 1, le24(27) + 1))
        case _ => None
      }
    } else if (b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && u8(2) == 0x2A && u8(3) == 0x00) ||
        (b(0) == 'M' && b(1) == 'M' && u8(2) == 0x00 && u8(3) == 0x2A))) {
      // TIFF: walk IFD0 for ImageWidth(256)/ImageLength(257); values
      // are SHORT(3) or LONG(4), count 1, inlined in the value field
      val le = b(0) == 'I'
      def u16(i: Int): Int = if (le) le16(i) else be16(i)
      def u32(i: Int): Int = if (le) le32(i) else be32(i)
      val ifd = u32(4)
      if (ifd < 0 || ifd + 2 > b.length) None
      else {
        val n = u16(ifd)
        var w = -1; var h = -1
        var e = 0
        while (e < n && ifd + 2 + 12 * (e + 1) <= b.length) {
          val off = ifd + 2 + 12 * e
          val tag = u16(off)
          if (tag == 256 || tag == 257) {
            val typ = u16(off + 2)
            // SHORT sits in the first two bytes of the value field
            // under either byte order; LONG fills it
            val v = typ match {
              case 3 => u16(off + 8)
              case 4 => u32(off + 8)
              case _ => -1
            }
            if (tag == 256) w = v else h = v
          }
          e += 1
        }
        if (w > 0 && h > 0) Some(("tiff", w, h)) else None
      }
    } else None
  }
}

/** Native header-parse expression: binary → struct(format, width,
  * height) | null.
  */
case class ImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageHeader.HeaderType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_meta"

  override def nullSafeEval(v: Any): Any =
    ImageHeader.parse(v.asInstanceOf[Array[Byte]]) match {
      case Some((fmt, w, h)) =>
        InternalRow(UTF8String.fromString(fmt), w, h)
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): ImageMeta =
    copy(child = c)
}
