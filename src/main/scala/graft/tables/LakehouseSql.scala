package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** SQL front door for the NATIVE Iceberg and Hudi layers — the
  * `delta.`path`` pattern of [[DeltaSql]] extended to the other two
  * formats, so the whole lakehouse triad is drivable from SQL
  * strings:
  *
  * {{{
  * SELECT a, b FROM iceberg.`/p` WHERE a = 1 AND d >= '2024-01-01'
  * SELECT * FROM iceberg.`/p` SNAPSHOT AS OF 3 [WHERE ...]
  * SELECT * FROM iceberg.`/p` REF AS OF 'audit' [WHERE ...]
  * SELECT * FROM hudi.`/p` AS OF '20260101000000000' [WHERE ...]
  * SELECT * FROM hudi.`/p` WHERE part in (1, 2)
  * INSERT INTO iceberg.`/p` SELECT ...         -- native append
  * INSERT INTO hudi.`/p` SELECT ...            -- bulk insert
  * UPSERT INTO iceberg.`/p` USING view ON k1, k2 -- atomic equality upsert
  * MERGE INTO iceberg.`/p` USING view ON k1    -- same (delta-SQL spelling)
  * UPSERT INTO hudi.`/p` USING view            -- key-merged upsert
  * MERGE INTO hudi.`/p` USING view             -- same
  * DELETE FROM iceberg.`/p` WHERE a = 1        -- position deletes
  * DELETE FROM hudi.`/p` WHERE a = 1           -- key-indexed delete
  * DESCRIBE SNAPSHOTS|HISTORY|REFS|FILES iceberg.`/p`
  * DESCRIBE TIMELINE|SLICES|STATS hudi.`/p`
  * DESCRIBE CHANGES delta|iceberg|hudi.`/p` AFTER 3 [TO 7]
  *                                               -- the typed change
  *                                               -- stream (R61/R62 +
  *                                               -- Delta CDF) under
  *                                               -- the uniform cdc
  *                                               -- schema; AFTER is
  *                                               -- EXCLUSIVE (the
  *                                               -- ChangeFeed
  *                                               -- watermark shape),
  *                                               -- TO defaults to head
  * EXPIRE SNAPSHOTS iceberg.`/p` KEEP 3
  * CLEAN hudi.`/p` KEEP 3
  * CREATE REPLICA iceberg.`/t` FROM delta.`/s` ON (k1, k2)
  *                                             -- snapshot + watermark
  * SYNC REPLICA iceberg.`/t` FROM delta.`/s` ON (k1, k2)
  *                                             -- fold changes since
  *                                             -- the watermark
  * DESCRIBE REPLICA iceberg.`/t`               -- format + watermark
  * }}}
  *
  * The WHERE clause parses through Spark's SQL parser into the
  * PRUNING-CAPABLE Filter algebra ([[DeltaSql.parseWhere]]) and rides
  * `ReadArgs.filters`, so a SQL SELECT prunes Iceberg manifests
  * (transforms included) and Hudi partitions/slices exactly like the
  * API call — unlike a registered temp view, which can only push
  * row-group filters. Shapes outside the algebra refuse loudly.
  * A Hudi DELETE resolves matching record keys with one pruned
  * snapshot read, then routes through the key-indexed delete.
  */
object LakehouseSql {

  private val Ice = """iceberg\.`([^`]+)`"""
  private val Hud = """hudi\.`([^`]+)`"""

  private val selIce = s"""(?is)^SELECT\\s+(.+?)\\s+FROM\\s+$Ice(?:\\s+(?:SNAPSHOT|VERSION)\\s+AS\\s+OF\\s+(\\d+)|\\s+REF\\s+AS\\s+OF\\s+'([^']+)')?(?:\\s+WHERE\\s+(.+))?$$""".r
  private val selHud = s"""(?is)^SELECT\\s+(.+?)\\s+FROM\\s+$Hud(?:\\s+AS\\s+OF\\s+'(\\d+)')?(?:\\s+WHERE\\s+(.+))?$$""".r
  private val insIce = s"""(?is)^INSERT\\s+INTO\\s+$Ice\\s+(SELECT\\s.+)$$""".r
  private val insHud = s"""(?is)^INSERT\\s+INTO\\s+$Hud\\s+(SELECT\\s.+)$$""".r
  private val upsIce =
    s"""(?is)^(?:UPSERT|MERGE)\\s+INTO\\s+$Ice\\s+USING\\s+(\\w+)\\s+ON\\s+([\\w\\s,]+)$$""".r
  private val upsHud = s"""(?is)^(?:UPSERT|MERGE)\\s+INTO\\s+$Hud\\s+USING\\s+(\\w+)$$""".r
  private val delIce = s"""(?is)^DELETE\\s+FROM\\s+$Ice\\s+WHERE\\s+(.+)$$""".r
  private val delHud = s"""(?is)^DELETE\\s+FROM\\s+$Hud\\s+WHERE\\s+(.+)$$""".r
  private val chgAny =
    """(?is)^DESCRIBE\s+CHANGES\s+(delta|iceberg|hudi)\.`([^`]+)`\s+AFTER\s+(\d+)(?:\s+TO\s+(\d+))?$""".r
  private val descIce = s"""(?is)^DESCRIBE\\s+(SNAPSHOTS|HISTORY|REFS|FILES)\\s+$Ice$$""".r
  private val descHud = s"""(?is)^DESCRIBE\\s+(TIMELINE|SLICES|STATS)\\s+$Hud$$""".r
  private val expire = s"""(?is)^EXPIRE\\s+SNAPSHOTS\\s+$Ice\\s+KEEP\\s+(\\d+)$$""".r
  private val clean = s"""(?is)^CLEAN\\s+$Hud\\s+KEEP\\s+(\\d+)$$""".r
  private val optIce = (s"""(?is)^OPTIMIZE\\s+$Ice(?:\\s+WHERE\\s+(.+?))?""" +
    s"""(?:\\s+ZORDER\\s+BY\\s+\\(([^)]+)\\))?$$""").r
  private val compHud =
    s"""(?is)^COMPACT\\s+$Hud(?:\\s+PARTITIONS\\s+\\(([^)]+)\\))?$$""".r
  private val cluHud =
    s"""(?is)^CLUSTER\\s+$Hud\\s+BY\\s+\\(([^)]+)\\)(?:\\s+PARTITIONS\\s+\\(([^)]+)\\))?$$""".r
  private val AnyTbl = """(delta|iceberg|hudi)\.`([^`]+)`"""
  private val createRepl =
    s"""(?is)^CREATE\\s+REPLICA\\s+$AnyTbl\\s+FROM\\s+$AnyTbl\\s+ON\\s+\\(([^)]+)\\)$$""".r
  private val syncRepl =
    s"""(?is)^SYNC\\s+REPLICA\\s+$AnyTbl\\s+FROM\\s+$AnyTbl\\s+ON\\s+\\(([^)]+)\\)$$""".r
  private val descRepl = s"""(?is)^DESCRIBE\\s+REPLICA\\s+$AnyTbl$$""".r
  private val sumIce = s"""(?is)^SUMMARIZE\\s+$Ice$$""".r
  private val sumHud = s"""(?is)^SUMMARIZE\\s+$Hud$$""".r
  private val sumDelta = """(?is)^SUMMARIZE\s+delta\.`([^`]+)`$""".r
  private val conv = """(?is)^CONVERT\s+TO\s+DELTA\s+.+$""".r

  def exec(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val s = sql.trim.stripSuffix(";").trim


    def args(cols: String, where: String): ReadArgs = ReadArgs(
      filters = Option(where).map(w => DeltaSql.parseWhere(spark, w))
        .getOrElse(Seq.empty),
      columns = parseCols(cols))

    s match {
      case chgAny(fmt, path, after, to) =>
        val feed = ChangeFeed.forPath(spark, path)
        val ok = fmt.toLowerCase match {
          case "delta"   => feed.isInstanceOf[DeltaFeed]
          case "iceberg" => feed.isInstanceOf[IcebergFeed]
          case _         => feed.isInstanceOf[HudiFeed]
        }
        require(ok, s"$path is not a ${fmt.toLowerCase} table")
        feed.changesUniform(spark, after.toLong,
          Option(to).map(_.toLong).getOrElse(feed.head(spark)))
      case selIce(cols, path, snap, ref, where) =>
        val t = new IcebergTable(name(path), path)
        val extra: Map[String, Any] =
          Option(snap).map(v => t.SnapshotIdKey -> (v.toLong: Any)).toMap ++
            Option(ref).map(r => t.RefKey -> (r: Any)).toMap
        t(spark, args(cols, where).copy(extra = extra))
      case selHud(cols, path, asOf, where) =>
        val t = new HudiTable(name(path), path)
        val extra: Map[String, Any] =
          Option(asOf).map(i => t.AsOfInstantKey -> (i: Any)).toMap
        t(spark, args(cols, where).copy(extra = extra))
      case insIce(path, select) =>
        // the source is ANY Spark SQL SELECT (inner joins, functions,
        // registered views all fine — it never needs the Filter
        // algebra: pruning disciplines apply to reads of the TARGET)
        val snap = IcebergWrite.append(spark, spark.sql(select), path)
        Seq(snap).toDF("snapshot_id")
      case insHud(path, select) =>
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val props = HudiWrite.readProps(fs, path)
        val key = props.getOrElse("hoodie.table.recordkey.fields",
          throw new IllegalArgumentException(
            s"INSERT INTO hudi needs an existing table at $path " +
              "(create one with HudiWrite.bulkInsert — the record key " +
              "is a table-creation decision, not an insert's)"))
        require(!key.contains(","), s"composite record keys unsupported: $key")
        val partCols = props.get("hoodie.table.partition.fields").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val instant = HudiWrite.bulkInsert(spark, spark.sql(select), path, key,
          partCols, props.getOrElse("hoodie.table.type", "COPY_ON_WRITE"))
        Seq(instant).toDF("instant")
      case upsIce(path, view, keys) =>
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val snap = IcebergWrite.upsertEquality(spark, spark.table(view), path, keyCols)
        Seq(snap).toDF("snapshot_id")
      case upsHud(path, view) =>
        val instant = HudiWrite.upsert(spark, spark.table(view), path)
        Seq(instant).toDF("instant")
      case delIce(path, where) =>
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val (f, residual) = DeltaSql.parseWhereSplit(spark, where,
          IcebergMeta.load(fs, path).schema)
        val snap = IcebergWrite.deleteWhere(spark, path, f, residual)
        Seq(snap).toDF("snapshot_id")
      case delHud(path, where) =>
        val (f, residual) = DeltaSql.parseWhereSplit(spark, where,
          new HudiTable(name(path), path)(spark, ReadArgs()).schema)
        val instant = HudiWrite.deleteMatching(spark, path, f, residual)
        Seq(instant).toDF("instant")
      case descIce(what, path) => what.toUpperCase match {
        case "SNAPSHOTS" => IcebergMetaTables.snapshots(spark, path)
        case "HISTORY"   => IcebergMetaTables.history(spark, path)
        case "REFS"      => IcebergMetaTables.refs(spark, path)
        case _           => IcebergMetaTables.files(spark, path)
      }
      case descHud(what, path) =>
        if (what.equalsIgnoreCase("TIMELINE")) HudiMetaTables.timeline(spark, path)
        else if (what.equalsIgnoreCase("STATS")) HudiMetaTables.colStats(spark, path)
        else HudiMetaTables.fileSlices(spark, path)
      case optIce(path, wherePred, zcols) =>
        val scoped = Option(wherePred)
          .map(DeltaSql.parseWhere(spark, _)).getOrElse(Seq.empty)
        val z = Option(zcols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        // a present-but-empty ZORDER BY must not silently bin-pack
        z.foreach(cols => require(cols.nonEmpty,
          "OPTIMIZE ... ZORDER BY needs at least one column"))
        val sid = IcebergMaintenance.rewriteDataFiles(spark, path, scoped,
          zorderBy = z.getOrElse(Seq.empty))
        Seq(sid).toDF("snapshot_id")
      case compHud(path, parts) =>
        val instant = HudiWrite.compact(spark, path,
          partitions = Option(parts).map(parsePartitions))
        Seq(instant.getOrElse("")).toDF("instant") // empty = nothing logged
      case cluHud(path, cols, parts) =>
        val sortCols = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val instant = HudiWrite.cluster(spark, path, sortCols,
          partitions = Option(parts).map(parsePartitions))
        Seq(instant).toDF("instant")
      case createRepl(tfmt, tpath, sfmt, spath, keys) =>
        requireFormat(spark, spath, sfmt)
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val wm = graft.operators.Replicate.initialize(
          spark, spath, tpath, keyCols, tfmt.toLowerCase)
        Seq(wm).toDF("watermark")
      case syncRepl(tfmt, tpath, sfmt, spath, keys) =>
        requireFormat(spark, spath, sfmt)
        requireFormat(spark, tpath, tfmt)
        val keyCols = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val wm = graft.operators.Replicate.sync(spark, spath, tpath, keyCols)
        Seq(wm).toDF("watermark")
      case descRepl(fmt, path) =>
        requireFormat(spark, path, fmt)
        graft.operators.Replicate.watermark(spark, path) match {
          case Some(wm) => Seq((fmt.toLowerCase, wm)).toDF("format", "watermark")
          case None => throw new IllegalArgumentException(
            s"$path carries no replication watermark — not a replica " +
              "this pipeline created")
        }
      case sumIce(path) =>
        summarizeAll(new IcebergTable(name(path), path)(spark, ReadArgs.empty))
      case sumHud(path) =>
        summarizeAll(new HudiTable(name(path), path)(spark, ReadArgs.empty))
      case sumDelta(path) =>
        summarizeAll(new DeltaTable(name(path), path)(spark, ReadArgs.empty))
      case expire(path, keep) =>
        val expired = IcebergMaintenance.expireSnapshots(spark, path, keep.toInt)
        expired.toDF("expired_snapshot_id")
      case clean(path, keep) =>
        val removed = graft.tables.HudiMaintenance.clean(spark, path, keep.toInt)
        Seq(removed.size.toLong).toDF("files_removed")
      case conv() =>
        // the operand formats live here, the converter in DeltaSql —
        // delegate so both front doors accept the statement
        DeltaSql.exec(spark, s)
      case _ =>
        throw new IllegalArgumentException(
          s"unsupported lakehouse SQL statement: $s (Delta DML belongs to DeltaSql.exec)")
    }
  }

  /** SUMMARIZE: profile every column with the HLL distinct (no
    * expand — the table may be huge; exact profiles go through
    * [[graft.catalog.Profile.summarize]] directly).
    */
  private def summarizeAll(df: DataFrame): DataFrame = {
    // atomic columns only: maps aren't orderable, and min/max of an
    // array/struct isn't a useful profile stat
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType, NullType, VariantType}
    val cols = df.schema.fields.collect {
      case f if (f.dataType match {
            // variant is atomic but not orderable: min/max would throw
            case _: ArrayType | _: MapType | _: StructType | NullType |
                _: VariantType => false
            case _ => true
          }) => f.name
    }.toSeq
    require(cols.nonEmpty, "SUMMARIZE: table has no atomic columns")
    graft.catalog.Profile.summarize(df, cols, exact = false)
  }

  /** Quoted partition-path list: `'p=0', 'p=1'` (shared by CLUSTER
    * and COMPACT so the literal grammar can't drift between them).
    */
  private def parsePartitions(parts: String): Seq[String] =
    parts.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
      .filter(_.nonEmpty).toSeq

  private def name(path: String): String =
    path.split('/').lastOption.filter(_.nonEmpty).getOrElse("table")

  /** The REPLICA verbs name formats explicitly (`delta.`p``); the
    * on-disk layout must agree — a mislabeled statement refuses
    * instead of dispatching to the wrong engine.
    */
  private def requireFormat(spark: SparkSession, path: String, fmt: String): Unit = {
    val detected = ChangeFeed.detectFormat(spark, path)
    require(detected.contains(fmt.toLowerCase),
      s"$path is ${detected.getOrElse("not a lakehouse table")}, " +
        s"not ${fmt.toLowerCase}")
  }

  /** `*` → all columns; else a comma list of bare identifiers (no
    * expressions — SELECT-list computation belongs to the DataFrame
    * that a projection feeds, and silently accepting expressions
    * would skip the pruning contract this front door exists for).
    */
  private def parseCols(cols: String): Option[Seq[String]] = {
    val t = cols.trim
    if (t == "*") None
    else {
      val names = t.split(",").map(_.trim)
      names.foreach(n => require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"only bare column names are supported in the select list, got '$n'"))
      Some(names.toSeq)
    }
  }
}
