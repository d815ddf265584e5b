package graft.tables

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Iceberg v3 Puffin deletion vectors (public Puffin format spec +
  * the v3 `deletion-vector-v1` blob type): position deletes stored
  * as ONE portable 64-bit roaring bitmap per data file inside a
  * Puffin container, addressed directly by the manifest's
  * `content_offset`/`content_size_in_bytes` (fields 144/145) — a
  * reader never parses the Puffin footer on the scan path.
  *
  * Blob layout (spec): 4-byte big-endian length of (magic + vector),
  * the 4-byte magic `D1 D3 39 64`, the bitmap in the same "portable"
  * RoaringBitmapArray serialization Delta DVs use
  * ([[RoaringBitmapArray]] — magic 1681511377 LE, 64-bit keys split
  * into per-high-word 32-bit roaring bitmaps), then a big-endian
  * CRC-32 of (magic + vector).
  *
  * Scale shape: bitmaps are per-file METADATA (KBs), loaded
  * driver-side for the pruned files only and shipped inside the
  * [[DvDeleted]] filter expression — no join, no shuffle, the same
  * application path as Delta DVs.
  */
object IcebergPuffin {

  /** The spec's 4-byte blob magic for `deletion-vector-v1`. */
  val BlobMagic: Array[Byte] =
    Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  private val FileMagic: Array[Byte] = "PFA1".getBytes("UTF-8")

  /** Read one deletion-vector-v1 blob at (offset, size); returns the
    * portable-serialized bitmap bytes (the [[DvDeleted]] payload).
    * Structural mismatches refuse LOUDLY with the file named — a
    * corrupt or non-DV blob must never silently delete wrong rows.
    */
  def readDvBlob(fs: FileSystem, path: Path, offset: Long, size: Long): Array[Byte] = {
    require(size >= 12 && size <= Int.MaxValue,
      s"implausible deletion-vector-v1 blob size $size in $path")
    val buf = new Array[Byte](size.toInt)
    val in = fs.open(path)
    try { in.seek(offset); in.readFully(buf) } finally in.close()
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == size - 8,
      s"deletion-vector-v1 blob at $path:$offset declares length $len but " +
        s"content_size_in_bytes $size implies ${size - 8}")
    require(buf.slice(4, 8).sameElements(BlobMagic),
      s"deletion-vector-v1 blob at $path:$offset carries magic " +
        s"${buf.slice(4, 8).map(b => f"$b%02X").mkString(" ")} (expected D1 D3 39 64)")
    val crc = new java.util.zip.CRC32()
    crc.update(buf, 4, len)
    val stored = ByteBuffer.wrap(buf, 4 + len, 4).order(ByteOrder.BIG_ENDIAN).getInt
    require(crc.getValue.toInt == stored,
      s"deletion-vector-v1 blob at $path:$offset fails its CRC-32")
    java.util.Arrays.copyOfRange(buf, 8, 4 + len)
  }

  /** Serialize one deletion-vector-v1 blob (length + magic + vector +
    * CRC) — the write half [[writeDvPuffin]] and fixtures share.
    */
  def dvBlobBytes(bitmap: RoaringBitmapArray): Array[Byte] = {
    val vector = bitmap.serialize
    val len = 4 + vector.length
    val out = ByteBuffer.allocate(4 + len + 4).order(ByteOrder.BIG_ENDIAN)
    out.putInt(len)
    out.put(BlobMagic)
    out.put(vector)
    val crc = new java.util.zip.CRC32()
    crc.update(out.array(), 4, len)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Write a minimal spec-conformant Puffin file holding ONE
    * deletion-vector-v1 blob: file magic, the blob, and a footer
    * whose JSON payload records the blob's type/offset/length +
    * referenced-data-file and cardinality properties (so foreign
    * footer-reading consumers resolve it too). Returns the blob's
    * (content_offset, content_size_in_bytes) for the manifest entry.
    */
  def writeDvPuffin(
      fs: FileSystem,
      path: Path,
      bitmap: RoaringBitmapArray,
      referencedDataFile: String,
      snapshotId: Long = 1L,
      sequenceNumber: Long = 1L
  ): (Long, Long) =
    writeDvPuffinMulti(fs, path,
      Seq(referencedDataFile -> bitmap), snapshotId, sequenceNumber)(referencedDataFile)

  /** Write a Puffin container with one deletion-vector-v1 blob PER
    * referenced data file — a DV delete commit packs every affected
    * file's bitmap into ONE container ([[IcebergWrite.deleteWhereDv]]).
    * Returns each data file's (content_offset, content_size_in_bytes)
    * for its manifest entry. Blobs stream out back to back; the
    * footer payload lists all of them for foreign footer readers.
    */
  def writeDvPuffinMulti(
      fs: FileSystem,
      path: Path,
      dvs: Seq[(String, RoaringBitmapArray)],
      snapshotId: Long = 1L,
      sequenceNumber: Long = 1L
  ): Map[String, (Long, Long)] = {
    require(dvs.nonEmpty, "writeDvPuffinMulti requires at least one bitmap")
    val out = fs.create(path, true)
    val offsets = Map.newBuilder[String, (Long, Long)]
    try {
      out.write(FileMagic)
      var offset = FileMagic.length.toLong
      val blobJsons = Seq.newBuilder[String]
      dvs.foreach { case (ref, bm) =>
        val blob = dvBlobBytes(bm)
        out.write(blob)
        blobJsons += (s"""{"type":"deletion-vector-v1","fields":[],""" +
          s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
          s""""offset":$offset,"length":${blob.length},""" +
          s""""properties":{"referenced-data-file":${jsonStr(ref)},""" +
          s""""cardinality":"${bm.cardinality}"}}""")
        offsets += ref -> (offset, blob.length.toLong)
        offset += blob.length
      }
      val payload =
        s"""{"blobs":[${blobJsons.result().mkString(",")}]}""".getBytes("UTF-8")
      out.write(FileMagic) // footer opens with the magic
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: payload not compressed
      out.write(tail.array())
      out.write(FileMagic)
    } finally out.close()
    offsets.result()
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
