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
    else None
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
