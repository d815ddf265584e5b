package graft.tables

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Upstream Apache Hudi log-file format (the `.log` files a
  * MERGE_ON_READ deltacommit appends to a file group's latest slice;
  * public spec: hudi.apache.org/tech-specs#log-file-format, upstream
  * `HoodieLogFormat`/`HoodieLogBlock`/`HoodieAvroDataBlock`).
  *
  * A log file is a sequence of blocks, each:
  * {{{
  *   #HUDI#                      6-byte magic
  *   long   block size           (everything after the magic)
  *   int    log format version   (1)
  *   int    block type ordinal   (3 = AVRO_DATA_BLOCK)
  *   header map                  int count, then per entry:
  *                               int key ordinal, int len, UTF-8 bytes
  *   long   content length
  *   content bytes
  *   footer map                  (same encoding, usually empty)
  *   long   total block length   (including magic — reverse pointer)
  * }}}
  *
  * AVRO_DATA_BLOCK content (its version 3 layout): int content
  * version, int record count, then per record an int length + Avro
  * binary bytes of the writer schema carried in the `SCHEMA` header.
  *
  * DELETE_BLOCKs read and write as tombstones via the public
  * HoodieDeleteRecordList avro model (same framing, content type 1).
  * Blocks this reader does NOT merge — COMMAND (rollback) blocks,
  * CORRUPT blocks, pre-v2 content layouts — REFUSE loudly instead of
  * silently dropping changes; a table carrying them must be
  * compacted by its writer first. Everything else (records wider
  * than the table schema, e.g. upstream's five `_hoodie_*` meta
  * columns where graft materializes two) reads by field name.
  */
object HudiLog {

  import scala.jdk.CollectionConverters._

  val Magic: Array[Byte] = "#HUDI#".getBytes(UTF_8)
  val FormatVersion = 1

  // HoodieLogBlockType ordinals (upstream enum order)
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptBlock = 2
  val AvroDataBlock = 3

  // HeaderMetadataType ordinals (upstream enum order)
  val InstantTimeKey = 0
  val TargetInstantTimeKey = 1
  val SchemaKey = 2

  /** Content-format version this writer emits; readers accept >= 2
    * (the first length-prefixed layout).
    */
  val AvroContentVersion = 3

  final case class LogBlock(
      blockType: Int, header: Map[Int, String], content: Array[Byte])

  // ------------------------------------------------------- block I/O

  private def metadataBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeInt(k)
      val b = v.getBytes(UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  private def readMetadata(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      k -> new String(b, UTF_8)
    }.toMap
  }

  /** Streaming block writer: one NEW file per (file group,
    * deltacommit) — upstream appends to an existing log file where
    * the FS supports it, but create-only works on every object store
    * and the slice association comes from the timeline metadata
    * either way. Blocks stream out one at a time, so a task's memory
    * is O(one block), not O(log file).
    */
  final class Writer(fs: FileSystem, path: Path) {
    private val out = fs.create(path, false)

    def append(b: LogBlock): Unit = {
      val headerBytes = metadataBytes(b.header)
      val footerBytes = metadataBytes(Map.empty)
      // size of everything after the magic, reverse pointer included
      val blockSize = 4 + 4 + headerBytes.length + 8 + b.content.length +
        footerBytes.length + 8
      val start = out.getPos
      out.write(Magic)
      out.writeLong(blockSize.toLong)
      out.writeInt(FormatVersion)
      out.writeInt(b.blockType)
      out.write(headerBytes)
      out.writeLong(b.content.length.toLong)
      out.write(b.content)
      out.write(footerBytes)
      out.writeLong(out.getPos + 8 - start)
    }

    /** Returns the file length. */
    def close(): Long = {
      val len = out.getPos
      out.close()
      len
    }
  }

  def write(fs: FileSystem, path: Path, blocks: Seq[LogBlock]): Long = {
    val w = new Writer(fs, path)
    try blocks.foreach(w.append) finally w.close()
    fs.getFileStatus(path).getLen
  }

  /** Parse every block of one log file. */
  def readBlocks(fs: FileSystem, path: Path): Seq[LogBlock] = {
    val len = fs.getFileStatus(path).getLen
    val in = new DataInputStream(new java.io.BufferedInputStream(fs.open(path)))
    try {
      val blocks = Seq.newBuilder[LogBlock]
      var pos = 0L
      while (pos < len) {
        val magic = new Array[Byte](Magic.length)
        in.readFully(magic)
        if (!java.util.Arrays.equals(magic, Magic))
          throw new java.io.IOException(
            s"corrupt Hudi log block in $path at offset $pos: bad magic")
        val blockSize = in.readLong()
        val version = in.readInt()
        if (version != FormatVersion)
          throw new UnsupportedOperationException(
            s"Hudi log format version $version in $path is unsupported (expected $FormatVersion)")
        val blockType = in.readInt()
        val header = readMetadata(in)
        val contentLen = in.readLong()
        require(contentLen >= 0 && contentLen <= blockSize,
          s"corrupt Hudi log block in $path at offset $pos: content length $contentLen")
        val content = new Array[Byte](contentLen.toInt)
        in.readFully(content)
        readMetadata(in) // footer
        in.readLong() // reverse pointer
        blocks += LogBlock(blockType, header, content)
        pos += Magic.length + 8 + blockSize
      }
      blocks.result()
    } finally in.close()
  }

  // ------------------------------------------- avro data block codec

  /** Serialize `rows` (shaped by `schema`) into AVRO_DATA_BLOCK
    * content bytes, writer schema = `avroSchema(schema)`.
    */
  def avroContent(rows: Iterator[Row], schema: StructType, avro: Schema): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val writer = new GenericDatumWriter[GenericRecord](avro)
    val recs = rows.map(r => toAvro(r, schema, avro)).toSeq
    out.writeInt(AvroContentVersion)
    out.writeInt(recs.size)
    recs.foreach { rec =>
      val rb = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(rb, null)
      writer.write(rec, enc)
      enc.flush()
      out.writeInt(rb.size())
      rb.writeTo(out)
    }
    out.flush()
    bos.toByteArray
  }

  /** Decode AVRO_DATA_BLOCK content into rows of `target` (fields
    * matched by NAME in the writer schema; missing → null, extras —
    * e.g. upstream meta columns — ignored).
    */
  def avroRows(content: Array[Byte], writerSchemaJson: String, target: StructType): Seq[Row] = {
    val writerSchema = new Schema.Parser().parse(writerSchemaJson)
    val reader = new GenericDatumReader[GenericRecord](writerSchema)
    val in = new DataInputStream(new ByteArrayInputStream(content))
    val version = in.readInt()
    if (version < 2)
      throw new UnsupportedOperationException(
        s"Hudi avro data block content version $version is unsupported (expected >= 2)")
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val dec = DecoderFactory.get().binaryDecoder(b, null)
      fromAvro(reader.read(null, dec), target)
    }
  }

  /** One parsed log entry: a full data row, or a delete tombstone
    * for a record key.
    */
  sealed trait LogEntry
  final case class DataEntry(row: Row) extends LogEntry
  final case class DeleteEntry(key: String) extends LogEntry

  /** One log file → entries of `target`, refusing block kinds whose
    * silent omission would be a wrong answer (rollback command
    * blocks, corrupt blocks, unknown types).
    */
  def readEntries(conf: Configuration, path: String, target: StructType): Seq[LogEntry] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    readBlocks(fs, p).flatMap { b =>
      b.blockType match {
        case AvroDataBlock =>
          val writerSchema = b.header.getOrElse(SchemaKey,
            throw new java.io.IOException(
              s"Hudi avro data block in $path carries no SCHEMA header"))
          avroRows(b.content, writerSchema, target).map(DataEntry)
        case DeleteBlock =>
          deleteKeys(b.content, path).map(DeleteEntry)
        case CommandBlock =>
          throw new UnsupportedOperationException(
            s"Hudi command (rollback) log block in $path is unsupported — " +
              "compact the table with its writer before reading it here")
        case CorruptBlock =>
          throw new java.io.IOException(s"corrupt Hudi log block in $path")
        case other =>
          throw new UnsupportedOperationException(
            s"unknown Hudi log block type $other in $path")
      }
    }
  }

  // ------------------------------------------------ delete blocks

  /** The public HoodieDeleteRecordList avro model (upstream
    * hudi-common `HoodieDeleteRecordList.avsc`): a DELETE_BLOCK's
    * content is `[int content-version][int length][avro binary]` of
    * this record, mirroring the AVRO_DATA_BLOCK framing.
    */
  private val DeleteListSchemaJson =
    """{"type":"record","name":"HoodieDeleteRecordList",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |{"name":"deleteRecordList","type":{"type":"array","items":
      |{"type":"record","name":"HoodieDeleteRecord","fields":[
      |{"name":"recordKey","type":["null","string"],"default":null},
      |{"name":"partitionPath","type":["null","string"],"default":null},
      |{"name":"orderingVal","type":["null","string","int","long","float","double","bytes"],"default":null}
      |]}}}]}""".stripMargin.replace("\n", "")

  @transient private lazy val deleteListSchema: Schema =
    new Schema.Parser().parse(DeleteListSchemaJson)

  /** Serialize delete tombstones for `keys` (in `partition`) into
    * DELETE_BLOCK content bytes.
    */
  def deleteContent(keys: Seq[String], partition: String): Array[Byte] = {
    val itemSchema = deleteListSchema.getField("deleteRecordList")
      .schema().getElementType
    val list = new java.util.ArrayList[GenericRecord](keys.size)
    keys.foreach { k =>
      val r = new GenericData.Record(itemSchema)
      r.put("recordKey", k)
      r.put("partitionPath", partition)
      list.add(r)
    }
    val rec = new GenericData.Record(deleteListSchema)
    rec.put("deleteRecordList", list)
    val rb = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(rb, null)
    new GenericDatumWriter[GenericRecord](deleteListSchema).write(rec, enc)
    enc.flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(AvroContentVersion)
    out.writeInt(rb.size())
    rb.writeTo(out)
    out.flush()
    bos.toByteArray
  }

  /** Decode DELETE_BLOCK content into record keys. */
  def deleteKeys(content: Array[Byte], path: String): Seq[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(content))
    val version = in.readInt()
    if (version < 2)
      throw new UnsupportedOperationException(
        s"Hudi delete block content version $version in $path is unsupported " +
          "(pre-avro kryo layouts) — compact the table with its writer first")
    val len = in.readInt()
    val b = new Array[Byte](len)
    in.readFully(b)
    val dec = DecoderFactory.get().binaryDecoder(b, null)
    val rec = new GenericDatumReader[GenericRecord](deleteListSchema).read(null, dec)
    rec.get("deleteRecordList").asInstanceOf[java.util.Collection[AnyRef]]
      .asScala.toSeq
      .map { r =>
        Option(r.asInstanceOf[GenericRecord].get("recordKey"))
          .map(_.toString)
          .getOrElse(throw new java.io.IOException(
            s"Hudi delete record without a recordKey in $path"))
      }
  }

  // -------------------------------------------- spark <-> avro types

  /** Avro schema for a Spark struct (nullable fields become
    * `union[null, T]`), the subset Hudi tables here can hold:
    * primitives, date/timestamp/decimal logical types, and nested
    * array/map/struct. Unsupported types refuse at WRITE time, so a
    * table never holds a log we cannot read back.
    */
  def avroSchema(schema: StructType, name: String = "graft_hudi_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val t = avroType(f.dataType, s"${name}_${f.name}")
      val ft = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), t) else t
      fields.add(new Schema.Field(f.name, ft, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null))
    }
    Schema.createRecord(name, null, "graft.hudi", false, fields)
  }

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val e = avroType(et, s"${name}_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = avroType(vt, s"${name}_value")
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), v) else v)
    case st: StructType => avroSchema(st, name)
    case other => throw new UnsupportedOperationException(
      s"column type ${other.simpleString} is unsupported in Hudi log files")
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** Inverse of [[avroSchema]]: the Spark schema an Avro record
    * schema describes — the shape commit metadata records under its
    * `schema` key (this engine's and upstream Hudi's). Unions with
    * null map to nullable fields; logical date / timestamp-micros /
    * local-timestamp-micros / decimal types round-trip; Avro has no
    * 8/16-bit integers, so byte/short columns surface as int (the
    * declared round-trip loss, noted where the schema is recorded).
    */
  def structType(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"expected an Avro record schema, got ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val nullable = f.schema().getType == Schema.Type.UNION &&
        f.schema().getTypes.asScala.exists(_.getType == Schema.Type.NULL)
      StructField(f.name(), sparkType(nonNull(f.schema())), nullable)
    }.toSeq)
  }

  private def sparkType(s: Schema): DataType = {
    val logical = Option(s.getLogicalType)
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (logical.exists(_.getName == "date")) DateType else IntegerType
      case Schema.Type.LONG => logical.map(_.getName) match {
        case Some("timestamp-micros")       => TimestampType
        case Some("local-timestamp-micros") => TimestampNTZType
        case Some("timestamp-millis")       => TimestampType
        case _                              => LongType
      }
      case Schema.Type.FLOAT  => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        logical match {
          case Some(d: org.apache.avro.LogicalTypes.Decimal) =>
            DecimalType(d.getPrecision, d.getScale)
          case _ => BinaryType
        }
      case Schema.Type.ARRAY =>
        val e = s.getElementType
        ArrayType(sparkType(nonNull(e)),
          containsNull = e.getType == Schema.Type.UNION)
      case Schema.Type.MAP =>
        val v = s.getValueType
        MapType(StringType, sparkType(nonNull(v)),
          valueContainsNull = v.getType == Schema.Type.UNION)
      case Schema.Type.RECORD => structType(s)
      case other => throw new UnsupportedOperationException(
        s"Avro type $other in a recorded Hudi schema is unsupported")
    }
  }

  private def toAvro(row: Row, schema: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null
      else toAvroValue(row.get(i), f.dataType, nonNull(avro.getField(f.name).schema()))
      rec.put(f.name, v)
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, s: Schema): Any = (dt, v) match {
    case (_, null) => null
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
    case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
    case (TimestampType, t: java.sql.Timestamp) =>
      // floorDiv, not '/': pre-1970 sub-second timestamps truncate
      // toward zero under '/' and come back one second late
      Math.addExact(
        Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
        (t.getNanos / 1000).toLong)
    case (TimestampType, t: java.time.Instant) =>
      Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      Math.addExact(Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        t.getNano / 1000L)
    case (d: DecimalType, x: java.math.BigDecimal) =>
      java.nio.ByteBuffer.wrap(x.setScale(d.scale).unscaledValue().toByteArray)
    case (d: DecimalType, x: BigDecimal) =>
      java.nio.ByteBuffer.wrap(x.underlying().setScale(d.scale).unscaledValue().toByteArray)
    case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
    case (ShortType, x: Short) => x.toInt
    case (ByteType, x: Byte) => x.toInt
    case (ArrayType(et, _), xs: scala.collection.Seq[_]) =>
      val es = nonNull(s.getElementType)
      new java.util.ArrayList[Any](xs.map(x => toAvroValue(x, et, es)).asJava)
    case (MapType(_, vt, _), m: scala.collection.Map[_, _]) =>
      val vs = nonNull(s.getValueType)
      val jm = new java.util.HashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(String.valueOf(k), toAvroValue(x, vt, vs)) }
      jm
    case (st: StructType, r: Row) => toAvro(r, st, s)
    case (_, other) => other // int/long/float/double/boolean/string pass through
  }

  private def fromAvro(rec: GenericRecord, target: StructType): Row = {
    val vals = target.fields.map { f =>
      val af = rec.getSchema.getField(f.name)
      if (af == null) null
      else fromAvroValue(rec.get(af.pos()), f.dataType)
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (dt, v) match {
    case (_, null) => null
    case (StringType, s) => s.toString // Utf8 → String
    case (DateType, d: Integer) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong))
    case (TimestampType, m: java.lang.Long) =>
      val t = new java.sql.Timestamp(Math.floorDiv(m, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
      t
    case (TimestampNTZType, m: java.lang.Long) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(m, 1000000L), (Math.floorMod(m, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (d: DecimalType, b: java.nio.ByteBuffer) =>
      val bytes = new Array[Byte](b.remaining())
      b.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (d: DecimalType, f: org.apache.avro.generic.GenericFixed) =>
      new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), d.scale)
    case (BinaryType, b: java.nio.ByteBuffer) =>
      val bytes = new Array[Byte](b.remaining())
      b.duplicate().get(bytes)
      bytes
    case (ShortType, i: Integer) => i.toShort
    case (ByteType, i: Integer) => i.toByte
    case (LongType, i: Integer) => i.toLong // int-written column since widened
    case (DoubleType, f: java.lang.Float) => f.toDouble
    case (ArrayType(et, _), xs: java.util.Collection[_]) =>
      xs.asScala.map(x => fromAvroValue(x, et)).toSeq
    case (MapType(_, vt, _), m: java.util.Map[_, _]) =>
      m.asScala.map { case (k, x) => k.toString -> fromAvroValue(x, vt) }.toMap
    case (st: StructType, r: GenericRecord) => fromAvro(r, st)
    case (_, other) => other
  }
}
