package graft.spark

import graft.core.{Filter => GFilter, Filters => GFilters}
import graft.tables.{ChangeFeed, DeltaTable, HudiTable, IcebergTable, ReadArgs}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Spark DataSource integration: ANY Spark SQL query can read graft's
  * native Delta/Iceberg/Hudi tables as first-class relations —
  *
  * {{{
  * spark.read.format("graft").load("/p")                  // auto-detect
  * spark.read.format("graft").option("format", "iceberg")
  *   .option("snapshotId", "3").load("/p")                // time travel
  * spark.sql("CREATE TEMPORARY VIEW t USING graft OPTIONS (path '/p')")
  * }}}
  *
  * (Direct `FROM graft.\u0060/p\u0060` path SQL needs a FileFormat/DSv2
  * source per Spark's direct-query-on-files rule — use the USING view
  * form, or `LakehouseSql.exec` whose grammar prunes identically.)
  *
  * Pushdown is the point: Spark's data-source filters translate into
  * the graft [[GFilter]] algebra and ride `ReadArgs.filters`, so a SQL
  * WHERE prunes Delta file stats, Iceberg manifests (partition
  * transforms + column bounds) and Hudi partitions/slices exactly
  * like the native API call — and column pruning rides
  * `ReadArgs.columns` into the parquet ReadSchema. Translated filters
  * are applied EXACTLY by the graft readers (pruning + residual), so
  * they are declared handled; untranslatable shapes stay with Spark.
  *
  * Time-travel options per format: `versionAsOf`/`timestampAsOf`
  * (delta), `snapshotId`/`ref`/`asOfTimestampMs` (iceberg),
  * `asOfInstant` (hudi).
  */
class GraftSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  /** Streaming WRITES under the same format name —
    * `df.writeStream.format("graft").option("path", p)
    * .option("txnAppId", id).start()` — delegate to the exactly-once
    * lakehouse sink triad (E56): `format` picks the leg for a NEW
    * table (an existing one auto-detects and refuses a mismatch), and
    * the sink options pass through (`txnAppId` required; `mode` =
    * append | merge/upsert with `keyCols` on the Delta/Iceberg legs).
    */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
  : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft sink requires a 'path' option"))
    val detected = ChangeFeed.detectFormat(sqlContext.sparkSession, path)
    val format = parameters.get("format").map(_.toLowerCase).orElse(detected)
      .getOrElse(throw new IllegalArgumentException(
        s"streaming into a NEW table at $path needs an explicit 'format' option " +
          "(delta | iceberg | hudi)"))
    require(Set("delta", "iceberg", "hudi")(format),
      s"unknown format '$format' (delta | iceberg | hudi)")
    detected.foreach(d => require(d == format,
      s"$path is a $d table, not the requested $format"))
    val delegate: org.apache.spark.sql.sources.StreamSinkProvider = format match {
      case "delta"   => new graft.streaming.DeltaStreamSinkProvider
      case "iceberg" => new graft.streaming.IcebergStreamSinkProvider
      case _         => new graft.streaming.HudiStreamSinkProvider
    }
    delegate.createSink(sqlContext, parameters, partitionColumns, outputMode)
  }

  /** Streaming reads under the same format name:
    * `spark.readStream.format("graft").load(p)` tails NET ROWS
    * through the format's own incremental source (Delta commit-log
    * tail incl. `readChangeFeed`, Iceberg snapshot diffs incl.
    * `upsertChanges`, pending-instant-fenced Hudi increments — each
    * source's own options pass through); `.option("cdc", "true")`
    * tails the TYPED change stream (the E63 uniform cdc schema)
    * instead, for any of the three formats.
    */
  private def streamDelegate(
      spark: SparkSession,
      parameters: Map[String, String]): org.apache.spark.sql.sources.StreamSourceProvider = {
    if (parameters.get("cdc").exists(_.toBoolean))
      new graft.streaming.ChangeFeedStreamSourceProvider
    else {
      val path = parameters.getOrElse("path", throw new IllegalArgumentException(
        "the graft source requires a 'path' option"))
      val format = parameters.get("format").map(_.toLowerCase)
        .orElse(ChangeFeed.detectFormat(spark, path))
        .getOrElse(throw new IllegalArgumentException(
          s"$path is not a Delta, Iceberg or Hudi table"))
      format match {
        case "delta"   => new graft.streaming.DeltaStreamSourceProvider
        case "iceberg" => new graft.streaming.IcebergStreamSourceProvider
        case "hudi"    => new graft.streaming.HudiStreamSourceProvider
        case other => throw new IllegalArgumentException(
          s"unknown format '$other' (delta | iceberg | hudi)")
      }
    }
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    streamDelegate(sqlContext.sparkSession, parameters)
      .sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
  : org.apache.spark.sql.execution.streaming.Source =
    streamDelegate(sqlContext.sparkSession, parameters)
      .createSource(sqlContext, metadataPath, schema, providerName, parameters)

  /** Write side: `df.write.format("graft").option("format", f)
    * .save(path)` — Append appends (additively evolving where the
    * format's writer does; a Hudi "append" is the format's own
    * KEY-MERGED upsert — Hudi forbids duplicate record keys, so rows
    * whose keys exist REPLACE the old versions rather than
    * duplicating them), Overwrite replaces contents,
    * ErrorIfExists/Ignore follow their SaveMode contracts. A NEW
    * table needs an explicit `format` (plus `recordKey` for hudi,
    * optional comma-separated `partitionBy`); an existing table
    * auto-detects and refuses a mismatched label.
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft source requires a 'path' option"))
    val spark = sqlContext.sparkSession
    val detected = ChangeFeed.detectFormat(spark, path)
    val format = parameters.get("format").map(_.toLowerCase).orElse(detected)
      .getOrElse(throw new IllegalArgumentException(
        s"writing a NEW table at $path needs an explicit 'format' option " +
          "(delta | iceberg | hudi)"))
    require(Set("delta", "iceberg", "hudi")(format),
      s"unknown format '$format' (delta | iceberg | hudi)")
    detected.foreach(d => require(d == format,
      s"$path is a $d table, not the requested $format"))
    val partitionBy = parameters.get("partitionBy").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val exists = detected.isDefined
    val write = mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"$path already exists (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => false
      case _                         => true
    }
    if (write) {
      val overwrite = mode == org.apache.spark.sql.SaveMode.Overwrite
      format match {
        case "delta" =>
          if (overwrite) graft.tables.DeltaWrite.overwrite(spark, data, path, partitionBy)
          else graft.tables.DeltaWrite.append(spark, data, path, partitionBy)
        case "iceberg" =>
          if (overwrite && exists)
            graft.tables.IcebergWrite.overwrite(spark, data, path)
          else graft.tables.IcebergWrite.append(spark, data, path, partitionBy)
        case "hudi" =>
          require(!overwrite || !exists,
            "Overwrite of an existing Hudi table is not supported; " +
              "delete + bulkInsert, or use upsert semantics via HudiWrite")
          if (exists) graft.tables.HudiWrite.upsert(spark, data, path)
          else {
            val key = parameters.getOrElse("recordKey",
              throw new IllegalArgumentException(
                "creating a Hudi table needs a 'recordKey' option"))
            graft.tables.HudiWrite.bulkInsert(spark, data, path, key, partitionBy,
              parameters.getOrElse("tableType", "COPY_ON_WRITE"))
          }
      }
    }
    createRelation(sqlContext, parameters + ("format" -> format))
  }

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft source requires a 'path' option (or USING graft OPTIONS (path ...))"))
    val spark = sqlContext.sparkSession
    val format = parameters.get("format").map(_.toLowerCase)
      .orElse(ChangeFeed.detectFormat(spark, path))
      .getOrElse(throw new IllegalArgumentException(
        s"$path is not a Delta, Iceberg or Hudi table " +
          "(no _delta_log, metadata/v*.metadata.json or .hoodie)"))
    require(Set("delta", "iceberg", "hudi")(format),
      s"unknown format '$format' (delta | iceberg | hudi)")
    ChangeFeed.detectFormat(spark, path).foreach(d => require(d == format,
      s"$path is a $d table, not the requested $format"))
    new GraftRelation(spark, path, format, parameters, sqlContext)
  }
}

class GraftRelation(
    spark: SparkSession,
    path: String,
    format: String,
    parameters: Map[String, String],
    override val sqlContext: SQLContext
) extends BaseRelation with PrunedFilteredScan {

  private def name = path.split('/').lastOption.filter(_.nonEmpty).getOrElse("table")

  /** Time-travel options forwarded to the table's own extra keys
    * (exposed for the DSv2 VERSION/TIMESTAMP AS OF bridge).
    */
  private[spark] def travelExtra: Map[String, Any] = extra

  private val extra: Map[String, Any] = format match {
    case "delta" =>
      val t = new DeltaTable(name, path)
      parameters.get("versionAsOf").map(v => t.VersionKey -> (v.toLong: Any)).toMap ++
        parameters.get("timestampAsOf").map(v => t.TimestampKey -> (v: Any))
    case "iceberg" =>
      val t = new IcebergTable(name, path)
      parameters.get("snapshotId").map(v => t.SnapshotIdKey -> (v.toLong: Any)).toMap ++
        parameters.get("ref").map(v => t.RefKey -> (v: Any)) ++
        parameters.get("asOfTimestampMs").map(v => t.TimestampKey -> (v.toLong: Any))
    case _ =>
      val t = new HudiTable(name, path)
      parameters.get("asOfInstant").map(v => t.AsOfInstantKey -> (v: Any)).toMap
  }

  private[spark] def frame(args: ReadArgs): DataFrame = format match {
    case "delta"   => new DeltaTable(name, path)(spark, args)
    case "iceberg" => new IcebergTable(name, path)(spark, args)
    case _         => new HudiTable(name, path)(spark, args)
  }

  // metadata-only schema resolution when no time travel is requested
  // (a full frame would plan the whole scan — snapshot file state,
  // manifests, slices — just to read column names; Hudi has no
  // metadata-only schema, its declared-schema read IS the cheap
  // path); time-traveled relations derive the schema from the
  // versioned frame, which may legitimately differ from the current
  // one. Direct per-format resolution, NOT ChangeFeed.tableSchema —
  // the Iceberg feed refuses v1 tables (its changelog needs sequence
  // numbers) while batch reads serve them fine.
  override val schema: StructType =
    if (extra.nonEmpty) frame(ReadArgs(extra = extra)).schema
    else format match {
      case "delta" =>
        graft.tables.DeltaLog.snapshot(spark, path, withFiles = false).schema
      case "iceberg" =>
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.tables.IcebergMeta.load(fs, path).schema
      case _ => frame(ReadArgs.empty).schema
    }

  // buildScan returns the DataFrame's InternalRow RDD directly — the
  // standard no-copy seam (Spark skips the Row re-encoding)
  override def needConversion: Boolean = false

  override def unhandledFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
  : Array[org.apache.spark.sql.sources.Filter] =
    filters.filter(f => GraftRelation.translate(f).isEmpty)

  override def buildScan(
      requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter]): RDD[Row] = {
    val translated = filters.flatMap(GraftRelation.translate).toSeq
    val args = ReadArgs(
      filters = GFilters.normalize(translated),
      columns = if (requiredColumns.nonEmpty) Some(requiredColumns.toSeq) else None,
      extra = extra)
    val df0 = frame(args)
    // exact required order; zero columns (count(*)) yields arity-0 rows
    val df = df0.select(requiredColumns.map(c =>
      org.apache.spark.sql.functions.col(c)).toIndexedSeq: _*)
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftRelation {
  /** Spark filter → graft algebra; None = Spark keeps it. Shared by
    * the DSv1 relation and the DSv2 catalog's scan builder
    * ([[GraftScanBuilder]]) so both entries prune identically.
    */
  private[spark] def translate(
      f: org.apache.spark.sql.sources.Filter): Option[GFilter] = f match {
    case EqualTo(c, v)            => Some(GFilter(c, "=", v))
    case Not(EqualTo(c, v))       => Some(GFilter(c, "!=", v))
    case GreaterThan(c, v)        => Some(GFilter(c, ">", v))
    case GreaterThanOrEqual(c, v) => Some(GFilter(c, ">=", v))
    case LessThan(c, v)           => Some(GFilter(c, "<", v))
    case LessThanOrEqual(c, v)    => Some(GFilter(c, "<=", v))
    case In(c, vs)                => Some(GFilter(c, "in", vs.toSeq))
    case Not(In(c, vs))           => Some(GFilter(c, "not in", vs.toSeq))
    case StringContains(c, v)     => Some(GFilter(c, "contains", v))
    case _                        => None
  }
}
