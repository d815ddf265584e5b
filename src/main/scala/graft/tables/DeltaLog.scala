package graft.tables

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

import scala.collection.mutable

/** Delta Lake transaction-log replay — the format layer under the
  * reference's DeltalakeTable (deltalake_table.py:286-300 exposes
  * `DeltaTable(table_uri, version=...)`; delta-rs does exactly this
  * replay natively). Implemented from the public Delta protocol spec
  * (github.com/delta-io/delta PROTOCOL.md):
  *
  *  - `_delta_log/%020d.json` — one JSON action per line
  *    (`protocol`, `metaData`, `add`, `remove`, `commitInfo`, `txn`);
  *  - `_delta_log/%020d.checkpoint.parquet` — the same actions
  *    columnarized, one action per row, replacing the JSON prefix;
  *  - snapshot state at version V = latest checkpoint ≤ V, then the
  *    JSON commits (cp, V] replayed in order: `add` inserts a file
  *    into the active set (keyed by path), `remove` deletes it,
  *    `metaData` swaps the schema (schema evolution).
  *
  * Scale notes: the log is small relative to the data (one action per
  * file operation) and is replayed driver-side — the same thing every
  * Delta reader does. File skipping happens on the replayed `add`
  * list BEFORE any data is opened: partition pruning on
  * `partitionValues` and min/max skipping on the per-file `stats`
  * JSON, so a 100 TB table with a selective predicate opens only the
  * surviving files. Checkpoints keep replay O(commits since last
  * checkpoint) instead of O(table history).
  */
object DeltaLog {

  /** An active data file from the replayed log. `partitionValues` maps
    * partition column → string value (None encodes a null partition
    * value, per the protocol). `dv` is the file's deletion vector, if
    * any ([[DeletionVectors]]).
    */
  final case class AddFile(
      path: String,
      partitionValues: Map[String, Option[String]],
      size: Long,
      stats: Option[String],
      dv: Option[DeletionVectors.DvDescriptor] = None,
      /** Protocol-optional per-file tags. Used by incremental ZORDER
        * to mark which clustering spec wrote a file.
        */
      tags: Map[String, String] = Map.empty,
      /** Row tracking (`rowTracking` writer feature): the fresh row id
        * of row i of this file is `baseRowId + i`; files written
        * before the feature was enabled have none (their row ids read
        * as null).
        */
      baseRowId: Option[Long] = None,
      /** The commit version stamped on this file's rows when the file
        * was added (row tracking's `row_commit_version`).
        */
      defaultRowCommitVersion: Option[Long] = None
  )

  /** Reader-protocol table features this implementation supports
    * (minReaderVersion 3 gates on them). columnMapping covers both
    * "name" mode (physical-name matching) and "id" mode (parquet
    * field-id matching via Spark's `parquet.field.id` reader).
    * timestampNtz maps directly onto Spark's native TimestampNTZType
    * (schemaString `timestamp_ntz` parses through DataType.fromJson).
    */
  val SupportedReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "timestampNtz", "v2Checkpoints",
      // scan-time widening of narrower physical types is native to
      // the parquet reader (see DeltaDdl.widens)
      "typeWidening",
      // VARIANT columns map onto Spark's native VariantType (binary
      // metadata+value encoding handled by the parquet reader)
      "variantType")

  /** The table's `protocol` action (latest wins during replay). The
    * checkpoint writer preserves this verbatim instead of
    * reconstructing it, so external readers see the table's true
    * requirements (column mapping, timestampNtz, DVs) after replaying
    * from a checkpoint.
    */
  final case class Protocol(
      minReaderVersion: Int,
      minWriterVersion: Int,
      readerFeatures: Option[Seq[String]],
      writerFeatures: Option[Seq[String]])

  object Protocol {
    val Base: Protocol = Protocol(1, 2, None, None)
  }

  final case class Metadata(
      schemaString: String,
      partitionColumns: Seq[String],
      configuration: Map[String, String] = Map.empty,
      id: String = "",
      createdTime: Option[Long] = None
  ) {
    lazy val schema: StructType = DataType.fromJson(schemaString).asInstanceOf[StructType]

    /** `delta.columnMapping.mode`: "none" (physical = logical),
      * "name" (parquet files + partitionValues + stats use per-field
      * physical names from the schema metadata) or "id" (same
      * physical-name keying for partitionValues/stats, but parquet
      * COLUMN matching is by field id — the per-field
      * `delta.columnMapping.id`, which the protocol requires id-mode
      * readers to honor because file column names are not guaranteed
      * stable).
      */
    def columnMappingMode: String =
      configuration.getOrElse("delta.columnMapping.mode", "none") match {
        case "" => "none"
        case m  => m
      }
    def isColumnMapped: Boolean = columnMappingMode != "none"

    /** Physical name of a top-level logical column (identity without
      * column mapping).
      */
    def physicalName(logical: String): String =
      if (!isColumnMapped) logical
      else schema.fields.find(_.name == logical) match {
        case Some(f) if f.metadata.contains(PhysicalNameKey) =>
          f.metadata.getString(PhysicalNameKey)
        case _ => logical
      }

    /** The schema as stored in the parquet files: every (nested) field
      * renamed to its physical name; under id mode each field also
      * carries `parquet.field.id` metadata so Spark's parquet reader
      * matches columns by field id instead of name.
      */
    lazy val physicalSchema: StructType =
      if (!isColumnMapped) schema
      else toPhysical(schema).asInstanceOf[StructType]

    private def toPhysical(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val name =
          if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
          else f.name
        val md =
          if (columnMappingMode == "id" && f.metadata.contains(FieldIdKey))
            new org.apache.spark.sql.types.MetadataBuilder().withMetadata(f.metadata)
              .putLong(ParquetFieldIdKey, f.metadata.getLong(FieldIdKey)).build()
          else f.metadata
        f.copy(name = name, dataType = toPhysical(f.dataType), metadata = md)
      })
      case a: ArrayType => a.copy(elementType = toPhysical(a.elementType))
      case m: MapType =>
        m.copy(keyType = toPhysical(m.keyType), valueType = toPhysical(m.valueType))
      case other => other
    }
  }

  /** An action's `path` is table-relative OR absolute (the protocol
    * allows both; shallow clones reference source files absolutely).
    */
  def resolvePath(base: String, p: String): String =
    if (p.startsWith("/") || p.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*")) p
    else s"$base/$p"

  val PhysicalNameKey = "delta.columnMapping.physicalName"
  /** Per-field column id assigned by id-mode column mapping. */
  val FieldIdKey = "delta.columnMapping.id"
  /** Spark's parquet field-id metadata key (ParquetUtils). */
  val ParquetFieldIdKey = "parquet.field.id"

  final case class Snapshot(
      version: Long,
      metadata: Metadata,
      files: Seq[AddFile],
      protocol: Protocol = Protocol.Base,
      /** `txn` (SetTransaction) high-water marks: appId → last
        * committed transaction version — the protocol's idempotent-
        * writer mechanism (a streaming sink skips batches it already
        * committed).
        */
      txns: Map[String, Long] = Map.empty,
      /** `domainMetadata` actions (writer feature): domain →
        * configuration JSON, latest per domain wins, `removed`
        * tombstones drop the domain. System domains (`delta.`-prefixed,
        * e.g. `delta.rowTracking`'s row-id high-water mark) and user
        * domains replay identically.
        */
      domains: Map[String, String] = Map.empty) {
    def schema: StructType = metadata.schema

    /** Row-id high-water mark from the `delta.rowTracking` domain
      * (-1 when absent: the next fresh row id is always hwm + 1).
      */
    def rowIdHighWaterMark: Long =
      domains.get(RowTrackingDomain)
        .map(c => mapper.readTree(c).path("rowIdHighWaterMark").asLong(-1L))
        .getOrElse(-1L)
  }

  val RowTrackingDomain = "delta.rowTracking"

  /** A vacuum tombstone: a `remove` action surviving in the log (JSON
    * commits or checkpoint tombstone rows). `deletionTimestamp` is
    * when the file stopped being part of the table — the clock the
    * retention window runs on (NOT the data file's own mtime: a file
    * written long ago but removed a second ago must survive vacuum for
    * the full retention so concurrent readers and recent time travel
    * keep working). `dv` is the deletion vector the removed entry
    * carried, so the DV file gets the same retention protection.
    */
  final case class Tombstone(
      path: String,
      deletionTimestamp: Long,
      dv: Option[DeletionVectors.DvDescriptor])

  private val mapper = new ObjectMapper()

  private val JsonCommit = raw"(\d{20})\.json".r
  private val CheckpointFile = raw"(\d{20})\.checkpoint\.parquet".r
  private val MultiPartCheckpointFile = raw"(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet".r
  // v2 checkpoint manifest: UUID-named, parquet or JSON-lines, file
  // actions inline or deferred to `_delta_log/_sidecars/*.parquet`
  // (the `v2Checkpoints` table feature). The unique-string segment has
  // no dots, so it cannot collide with the multi-part pattern.
  private val V2CheckpointFile = raw"(\d{20})\.checkpoint\.([^.]+)\.(json|parquet)".r

  def logDir(tablePath: String): Path = new Path(tablePath, "_delta_log")

  /** Directory for v2-checkpoint sidecar files. */
  def sidecarDir(tablePath: String): Path = new Path(logDir(tablePath), "_sidecars")

  /** All file paths of a checkpoint at `version` with `parts` parts
    * (classic single-file name for parts=1, `%020d.checkpoint.%010d.
    * %010d.parquet` otherwise, per the protocol).
    */
  def checkpointPaths(tablePath: String, version: Long, parts: Int): Seq[Path] =
    if (parts <= 1) Seq(new Path(logDir(tablePath), f"$version%020d.checkpoint.parquet"))
    else (1 to parts).map(i =>
      new Path(logDir(tablePath), f"$version%020d.checkpoint.$i%010d.$parts%010d.parquet"))

  /** `_last_checkpoint` hint: (version, parts). Invalid/corrupt files
    * degrade to a directory listing, never to an error.
    */
  private def readLastCheckpoint(fs: FileSystem, tablePath: String): Option[(Long, Int)] = {
    val p = new Path(logDir(tablePath), "_last_checkpoint")
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val node = mapper.readTree(text)
        Some((node.get("version").asLong(),
          Option(node.get("parts")).filterNot(_.isNull).map(_.asInt()).getOrElse(1)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Cheap UPPER-BOUND estimate of the live file count at `versionAsOf`
    * (default latest), readable WITHOUT materializing any add rows:
    * the newest usable checkpoint's `_last_checkpoint` `size` (its
    * total action count bounds its adds) plus the JSON tail's byte
    * length divided by a conservative floor bytes-per-add-action.
    * One log-dir listing + one tiny file read — O(commits) driver
    * work, never O(files). Overestimating is safe: it switches a read
    * to distributed planning early, never keeps a 10⁷-file table on
    * the driver path.
    */
  def estimateFileCount(
      spark: SparkSession,
      tablePath: String,
      versionAsOf: Option[Long] = None
  ): Long = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0L
    val statuses = fs.listStatus(dir).filter(_.isFile)
    val jsonSizes: Map[Long, Long] = statuses.flatMap(s => s.getPath.getName match {
      case JsonCommit(v) => Some(v.toLong -> s.getLen)
      case _             => None
    }).toMap
    val cpVersions = statuses.flatMap(_.getPath.getName match {
      case CheckpointFile(v)                => Some(v.toLong)
      case MultiPartCheckpointFile(v, _, _) => Some(v.toLong)
      case V2CheckpointFile(v, _, _)        => Some(v.toLong)
      case _                                => None
    })
    val known = jsonSizes.keySet ++ cpVersions
    if (known.isEmpty) return 0L
    val target = versionAsOf.getOrElse(known.max)
    val cpV = cpVersions.filter(_ <= target).maxOption
    // `_last_checkpoint` carries the action count when it matches the
    // chosen checkpoint version; otherwise fall back to 0 and let the
    // tail term dominate (a checkpoint without a readable size means
    // the estimate is weaker, not wrong — the JSON tail since the
    // checkpoint still bounds post-checkpoint adds)
    val cpActions: Long = cpV.map { v =>
      readLastCheckpointSize(fs, tablePath).filter(_._1 == v).map(_._2).getOrElse(0L)
    }.getOrElse(0L)
    val tailFrom = cpV.map(_ + 1L).getOrElse(0L)
    val tailBytes = jsonSizes.collect {
      case (v, len) if v >= tailFrom && v <= target => len
    }.sum
    // an add action with stats serializes to well over 150 bytes; the
    // floor makes the division an over-count (the safe direction)
    cpActions + tailBytes / 150
  }

  private def readLastCheckpointSize(
      fs: FileSystem, tablePath: String): Option[(Long, Long)] = {
    val p = new Path(logDir(tablePath), "_last_checkpoint")
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val node = mapper.readTree(text)
        Some((node.get("version").asLong(),
          Option(node.get("size")).filterNot(_.isNull).map(_.asLong()).getOrElse(0L)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def isDeltaTable(spark: SparkSession, tablePath: String): Boolean = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(dir) && fs.listStatus(dir).exists(s => s.getPath.getName match {
      case JsonCommit(_) | CheckpointFile(_) | MultiPartCheckpointFile(_, _, _) |
          V2CheckpointFile(_, _, _) => true
      case _ => false
    })
  }

  /** Latest committed version, or None for a non-delta directory. */
  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val (jsons, cps) = listLog(spark, tablePath)
    (jsons.keySet ++ cps.keySet).maxOption
  }

  /** `commitInfo.inCommitTimestamp` of a commit JSON, when the commit
    * carries one (tables with `delta.enableInCommitTimestamps`).
    */
  def inCommitTimestampOf(fs: FileSystem, jsonPath: Path): Option[Long] = {
    val in = fs.open(jsonPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.flatMap { line =>
      val node = mapper.readTree(line)
      Option(node.get("commitInfo"))
        .flatMap(ci => Option(ci.get("inCommitTimestamp")))
        .map(_.asLong())
    }.nextOption()
  }

  /** The next monotonic in-commit timestamp for a commit at
    * `prevVersion + 1`: wall clock, but never ≤ the previous commit's
    * ICT (the protocol requires strictly increasing values).
    */
  def nextInCommitTimestamp(
      spark: SparkSession, tablePath: String, prevVersion: Option[Long]): Long = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = prevVersion.flatMap { v =>
      val p = new Path(dir, f"$v%020d.json")
      if (fs.exists(p)) inCommitTimestampOf(fs, p) else None
    }
    math.max(System.currentTimeMillis(), prev.map(_ + 1).getOrElse(Long.MinValue))
  }

  /** Version active at `tsMillis`: the greatest version whose commit
    * happened at or before it. Per the protocol, a commit's timestamp
    * is the modification time of its JSON file (in-commit timestamps
    * aside). Only versions whose JSON still exists are resolvable —
    * a timestamp older than the surviving log refuses rather than
    * guessing.
    */
  def versionAtTimestamp(spark: SparkSession, tablePath: String, tsMillis: Long): Long = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (jsons, _) = listLog(spark, tablePath)
    require(jsons.nonEmpty, s"$tablePath has no JSON commits to resolve a timestamp against")
    // a commit carrying commitInfo.inCommitTimestamp (the
    // `inCommitTimestamp` writer feature) is timestamped by that value;
    // otherwise by its file's modification time, per the protocol
    val timed = jsons.toSeq.map { case (v, p) =>
      (v, inCommitTimestampOf(fs, p).getOrElse(fs.getFileStatus(p).getModificationTime))
    }
    val atOrBefore = timed.filter(_._2 <= tsMillis)
    require(atOrBefore.nonEmpty,
      s"no commit in $tablePath at or before timestamp $tsMillis " +
        s"(earliest surviving commit: ${timed.minBy(_._2)._2})")
    atOrBefore.maxBy(_._1)._1
  }

  /** Replay the log to the requested version (default: latest).
    * Fails loudly on unsupported reader features (deletion vectors,
    * column mapping) rather than returning wrong rows.
    *
    * `withFiles = false` is the METADATA-ONLY replay: add/remove
    * actions are skipped entirely — checkpoint parquet reads prune to
    * the metaData/protocol/txn columns and sidecars (which carry only
    * file actions per the protocol) are never opened — so driver
    * memory and collect volume are O(commits + txns), independent of
    * the table's file count. The scale entry point for 10⁷-file
    * tables, paired with [[DeltaFilesDataset]] for the file state.
    */
  /** Test observability: counts driver-side FULL file-list replays
    * (`snapshot(withFiles = true)`). Specs assert the auto-gated
    * distributed read path never bumps it.
    */
  private[graft] val driverFileReplays = new java.util.concurrent.atomic.AtomicLong

  /** Test observability: counts single-job checkpoint metadata folds
    * (one bump per checkpoint/sidecar dataframe whose metadata columns
    * were aggregated). Specs assert the metadata-only snapshot does
    * exactly one fold per checkpoint df and collects exactly one row.
    */
  private[graft] val checkpointMetaJobs = new java.util.concurrent.atomic.AtomicLong

  def snapshot(
      spark: SparkSession,
      tablePath: String,
      versionAsOf: Option[Long] = None,
      withFiles: Boolean = true
  ): Snapshot = {
    if (withFiles) driverFileReplays.incrementAndGet()
    val fs = logDir(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (jsons, cps) = listLog(spark, tablePath)
    val known = jsons.keySet ++ cps.keySet
    if (known.isEmpty) {
      // distinguish "nothing here" from "the only checkpoint is
      // unusable" (e.g. a multi-part set missing parts after the JSON
      // prefix was aged out)
      readLastCheckpoint(fs, tablePath) match {
        case Some((v, parts)) => throw new IllegalArgumentException(
          s"$tablePath: _last_checkpoint names checkpoint version $v ($parts part(s)) " +
            "but its files are missing or incomplete, and no JSON commits remain")
        case None => throw new IllegalArgumentException(s"$tablePath has no Delta log")
      }
    }
    val target = versionAsOf.getOrElse(known.max)
    require(known.exists(_ <= target), s"version $target predates the log in $tablePath")

    val active = mutable.LinkedHashMap.empty[String, AddFile]
    val txns = mutable.Map.empty[String, Long]
    val domains = mutable.Map.empty[String, String]
    var meta: Option[Metadata] = None
    var protocol: Protocol = Protocol.Base

    // checkpoint base: the `_last_checkpoint` hint names the newest
    // checkpoint without a listing scan (and is how aged-out logs are
    // meant to be entered); take the newer of the hint and the listing,
    // capped at the target version
    val cpChoice: Option[(Long, Seq[Path])] =
      checkpointChoice(fs, tablePath, cps, target)

    val cpVersion = cpChoice.map(_._1)
    // one JSON action (commit line or v2 JSON-manifest line)
    def applyJsonAction(node: JsonNode): Unit = {
      if (node.has("protocol")) {
        val pr = node.get("protocol")
        val minReader = pr.path("minReaderVersion").asInt(1)
        // reader versions 1-2 are plain parquet + log; version 3
        // gates on explicit table features — read only when every
        // listed feature is implemented, refuse otherwise rather
        // than silently return wrong rows.
        def featureSeq(field: String): Option[Seq[String]] =
          Option(pr.get(field)).filterNot(_.isNull)
            .map(_.elements().asScala.map(_.asText()).toSeq)
        if (minReader >= 3) {
          require(minReader == 3,
            s"unsupported Delta reader protocol version $minReader in $tablePath: $pr")
          val features = featureSeq("readerFeatures").map(_.toSet).getOrElse(Set.empty)
          val unsupported = features -- SupportedReaderFeatures
          require(unsupported.isEmpty,
            s"unsupported Delta reader features $unsupported in $tablePath")
        }
        protocol = Protocol(
          minReader, pr.path("minWriterVersion").asInt(2),
          featureSeq("readerFeatures"), featureSeq("writerFeatures"))
      }
      if (node.has("metaData")) {
        val m = node.get("metaData")
        val conf = Option(m.get("configuration")).map { o =>
          o.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
        }.getOrElse(Map.empty[String, String])
        val parts = Option(m.get("partitionColumns"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
        val md = Metadata(
          m.get("schemaString").asText(), parts, conf,
          id = Option(m.get("id")).filterNot(_.isNull).map(_.asText()).getOrElse(""),
          createdTime =
            Option(m.get("createdTime")).filterNot(_.isNull).map(_.asLong()))
        require(Seq("none", "name", "id").contains(md.columnMappingMode),
          s"Delta column mapping mode '${md.columnMappingMode}' is not supported in $tablePath")
        meta = Some(md)
      }
      if (withFiles && node.has("add")) {
        val a = node.get("add")
        val pv = Option(a.get("partitionValues")).map { o =>
          o.fields().asScala.map { e =>
            e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
          }.toMap
        }.getOrElse(Map.empty[String, Option[String]])
        val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
          .map(DeletionVectors.parseDescriptor)
        val tags = Option(a.get("tags")).filterNot(_.isNull).map { o =>
          o.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
        }.getOrElse(Map.empty[String, String])
        val add = AddFile(
          decodePath(a.get("path").asText()), pv,
          Option(a.get("size")).map(_.asLong()).getOrElse(0L),
          Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
          dv, tags,
          baseRowId = Option(a.get("baseRowId")).filterNot(_.isNull).map(_.asLong()),
          defaultRowCommitVersion =
            Option(a.get("defaultRowCommitVersion")).filterNot(_.isNull).map(_.asLong()))
        active += add.path -> add
      }
      if (withFiles && node.has("remove")) {
        active -= decodePath(node.get("remove").get("path").asText())
      }
      if (node.has("txn")) {
        val t = node.get("txn")
        val appId = t.get("appId").asText()
        val v = t.get("version").asLong()
        txns(appId) = math.max(txns.getOrElse(appId, Long.MinValue), v)
      }
      if (node.has("domainMetadata")) {
        val d = node.get("domainMetadata")
        val domain = d.get("domain").asText()
        if (d.path("removed").asBoolean(false)) domains -= domain
        else domains(domain) = d.path("configuration").asText("")
      }
    }

    def applyProtocolRow(p: org.apache.spark.sql.Row): Unit = {
      val names = p.schema.fieldNames
      def featureSeq(field: String): Option[Seq[String]] =
        if (!names.contains(field)) None
        else Option(p.getAs[scala.collection.Seq[String]](field)).map(_.toSeq)
      val minReader = p.getAs[Int]("minReaderVersion")
      if (minReader >= 3) {
        require(minReader == 3,
          s"unsupported Delta reader protocol version $minReader in $tablePath checkpoint")
        val features = featureSeq("readerFeatures").map(_.toSet).getOrElse(Set.empty)
        val unsupported = features -- SupportedReaderFeatures
        require(unsupported.isEmpty,
          s"unsupported Delta reader features $unsupported in $tablePath checkpoint")
      }
      protocol = Protocol(
        minReader,
        if (names.contains("minWriterVersion")) p.getAs[Int]("minWriterVersion") else 2,
        featureSeq("readerFeatures"), featureSeq("writerFeatures"))
    }

    def applyMetadataRow(m: org.apache.spark.sql.Row): Unit = {
      val names = m.schema.fieldNames
      val conf =
        if (!names.contains("configuration")) Map.empty[String, String]
        else Option(m.getAs[scala.collection.Map[String, String]]("configuration"))
          .map(_.toMap).getOrElse(Map.empty[String, String])
      val md = Metadata(
        m.getAs[String]("schemaString"),
        Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
          .map(_.toSeq).getOrElse(Seq.empty),
        conf,
        id = if (names.contains("id")) Option(m.getAs[String]("id")).getOrElse("") else "",
        createdTime =
          if (!names.contains("createdTime")) None
          else Option(m.getAs[Any]("createdTime")).map {
            case l: Long => l
            case i: Int  => i.toLong
          })
      require(Seq("none", "name", "id").contains(md.columnMappingMode),
        s"Delta column mapping mode '${md.columnMappingMode}' is not supported in $tablePath")
      meta = Some(md)
    }

    // apply the protocol/metaData/add columns of a checkpoint (or
    // sidecar) dataframe; returns sidecar file names a v2 manifest
    // defers its file actions to.
    //
    // Metadata is folded in ONE aggregation job: `collect_list` (which
    // skips null rows) gathers the ≤1-per-checkpoint protocol /
    // metaData / checkpointMetadata rows and the bounded txn /
    // domainMetadata / sidecar sets executor-side, and the driver
    // collects a single row — it never iterates checkpoint rows for
    // metadata, so the metadata-only replay's driver cost is O(appIds
    // + domains + sidecars) regardless of table file count or commit
    // count (this was the last per-action driver loop on the
    // checkpoint path).
    def applyCheckpointDf(cp: org.apache.spark.sql.DataFrame, cpV: Long): Seq[String] = {
      import org.apache.spark.sql.functions.{col => fcol, collect_list}
      val cols = cp.columns.toSet
      val metaCols = Seq("protocol", "metaData", "txn", "domainMetadata",
        "checkpointMetadata", "sidecar").filter(cols.contains)
      val folded: Map[String, Seq[org.apache.spark.sql.Row]] =
        if (metaCols.isEmpty) Map.empty
        else {
          checkpointMetaJobs.incrementAndGet()
          val aggs = metaCols.map(n => collect_list(fcol(n)).as(n))
          val row = cp.agg(aggs.head, aggs.tail: _*).collect()(0)
          metaCols.map(n =>
            n -> row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](n).toSeq).toMap
        }
      def rowsOf(n: String): Seq[org.apache.spark.sql.Row] =
        folded.getOrElse(n, Seq.empty)

      rowsOf("protocol").foreach(applyProtocolRow)
      rowsOf("metaData").foreach(applyMetadataRow)
      if (withFiles && cols.contains("add")) {
        cp.select("add").where("add IS NOT NULL").collect().foreach { r =>
          val a = r.getStruct(0)
          val pv = Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
            .map(_.toMap.map { case (k, v) => k -> Option(v) }).getOrElse(Map.empty[String, Option[String]])
          val dv =
            if (!a.schema.fieldNames.contains("deletionVector")) None
            else Option(a.getAs[org.apache.spark.sql.Row]("deletionVector")).map(dvFromRow)
          val tags =
            if (!a.schema.fieldNames.contains("tags")) Map.empty[String, String]
            else Option(a.getAs[scala.collection.Map[String, String]]("tags"))
              .map(_.toMap).getOrElse(Map.empty[String, String])
          def optLong(field: String): Option[Long] =
            if (!a.schema.fieldNames.contains(field)) None
            else Option(a.getAs[Any](field)).map {
              case l: Long => l
              case i: Int  => i.toLong
            }
          val add = AddFile(
            decodePath(a.getAs[String]("path")), pv, a.getAs[Long]("size"),
            if (a.schema.fieldNames.contains("stats")) Option(a.getAs[String]("stats")) else None,
            dv, tags,
            baseRowId = optLong("baseRowId"),
            defaultRowCommitVersion = optLong("defaultRowCommitVersion"))
          active += add.path -> add
        }
      }
      rowsOf("domainMetadata").foreach { d =>
        // checkpoints only carry live domains (removed ones are
        // dropped at write, like expired tombstones) but tolerate
        // a `removed` column written by other engines
        val removed = d.schema.fieldNames.contains("removed") &&
          Option(d.getAs[Any]("removed")).exists(_ == true)
        if (!removed)
          domains(d.getAs[String]("domain")) =
            Option(d.getAs[String]("configuration")).getOrElse("")
      }
      // removes in a checkpoint are vacuum tombstones — not active state
      rowsOf("txn").foreach { t =>
        val appId = t.getAs[String]("appId")
        val v = t.getAs[Long]("version")
        txns(appId) = math.max(txns.getOrElse(appId, Long.MinValue), v)
      }
      rowsOf("checkpointMetadata").foreach { m =>
        val v = m.getAs[Long]("version")
        require(v == cpV,
          s"v2 checkpoint in $tablePath declares version $v, expected $cpV")
      }
      rowsOf("sidecar").map(_.getAs[String]("path"))
    }

    cpChoice.foreach { case (cpV, paths) =>
      val sidecarNames: Seq[String] =
        if (paths.size == 1 && paths.head.getName.endsWith(".json")) {
          // v2 JSON-lines manifest (UUID-named); file actions may be
          // inline or deferred to sidecars
          val in = fs.open(paths.head)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
            finally in.close()
          val sc = Seq.newBuilder[String]
          lines.filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            if (node.has("checkpointMetadata")) {
              val v = node.get("checkpointMetadata").path("version").asLong(-1L)
              require(v == cpV,
                s"v2 checkpoint in $tablePath declares version $v, expected $cpV")
            }
            if (node.has("sidecar")) sc += node.get("sidecar").get("path").asText()
            applyJsonAction(node)
          }
          sc.result()
        } else applyCheckpointDf(spark.read.parquet(paths.map(_.toString): _*), cpV)
      // sidecars carry only file actions (per the v2 protocol), so the
      // metadata-only replay never opens them
      if (withFiles && sidecarNames.nonEmpty) {
        val scPaths = sidecarNames.map(n => new Path(sidecarDir(tablePath), n))
        scPaths.foreach(p => require(fs.exists(p),
          s"v2 checkpoint of $tablePath references a missing sidecar file: $p"))
        applyCheckpointDf(spark.read.parquet(scPaths.map(_.toString): _*), cpV)
      }
    }

    // JSON replay after the checkpoint. Every version is one JSON
    // commit — a hole in (checkpointVersion, target] means the log
    // prefix was aged out without a usable checkpoint covering it
    // (e.g. an incomplete multi-part set): replaying across it would
    // silently drop files, so refuse loudly instead.
    val replayFrom = cpVersion.map(_ + 1L).getOrElse(0L)
    val missing = (replayFrom to target).filterNot(jsons.contains)
    require(missing.isEmpty,
      s"Delta log of $tablePath has no commits for versions " +
        s"${missing.mkString(", ")} and no complete checkpoint covers them " +
        "(aged-out prefix or incomplete multi-part checkpoint)")
    (replayFrom to target).foreach { v =>
      jsons.get(v).foreach { p =>
        val in = fs.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
          finally in.close()
        lines.filter(_.nonEmpty).foreach(line => applyJsonAction(mapper.readTree(line)))
      }
    }

    val m = meta.getOrElse(
      throw new IllegalStateException(s"no metaData action found in the log of $tablePath"))
    Snapshot(target, m, active.values.toSeq, protocol, txns.toMap, domains.toMap)
  }

  /** `deletionVector` struct of a checkpoint add/remove row. */
  private def dvFromRow(d: org.apache.spark.sql.Row): DeletionVectors.DvDescriptor =
    DeletionVectors.DvDescriptor(
      d.getAs[String]("storageType"),
      d.getAs[String]("pathOrInlineDv"),
      Option(d.getAs[Any]("offset")).map {
        case l: Long => l
        case i: Int  => i.toLong
      },
      d.getAs[Int]("sizeInBytes"),
      d.getAs[Long]("cardinality"))

  /** All vacuum tombstones visible in the log: remove actions from the
    * surviving JSON commits plus the tombstone rows of the newest
    * checkpoint (the checkpoint carries unexpired tombstones forward
    * when the JSON prefix is cleaned up). Distinct (path, dv) pairs —
    * a file whose DV was replaced twice leaves one tombstone per old
    * DV, and each DV file needs its own retention clock. A remove
    * without a `deletionTimestamp` (it is optional in the protocol)
    * falls back to its commit file's mtime.
    */
  def tombstones(
      spark: SparkSession,
      tablePath: String,
      versionAsOf: Option[Long] = None
  ): Seq[Tombstone] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (jsonsAll, cpsAll) = listLog(spark, tablePath)
    // pin to a version so callers (e.g. the distributed checkpoint)
    // see the same log prefix as the snapshot they paired this with,
    // even if a concurrent commit lands mid-call
    val jsons = versionAsOf.fold(jsonsAll)(v => jsonsAll.filter(_._1 <= v))
    val cps = versionAsOf.fold(cpsAll)(v => cpsAll.filter(_._1 <= v))
    val out = mutable.Map.empty[(String, Option[DeletionVectors.DvDescriptor]), Long]
    def record(path: String, dv: Option[DeletionVectors.DvDescriptor], ts: Long): Unit = {
      val k = (path, dv)
      out(k) = math.max(out.getOrElse(k, Long.MinValue), ts)
    }

    def recordRemovesOf(cp: org.apache.spark.sql.DataFrame, fallbackTs: Long): Seq[String] = {
      if (cp.columns.contains("remove")) {
        cp.select("remove").where("remove IS NOT NULL").collect().foreach { r =>
          val rm = r.getStruct(0)
          val names = rm.schema.fieldNames
          // deletionTimestamp is optional in the protocol; a missing
          // one must NOT make the tombstone instantly vacuum-eligible
          // (0L would) — the checkpoint's own mtime is a safe upper
          // bound of the removal time
          val ts =
            if (!names.contains("deletionTimestamp")) fallbackTs
            else Option(rm.getAs[Any]("deletionTimestamp")).map {
              case l: Long => l
              case i: Int  => i.toLong
            }.getOrElse(fallbackTs)
          val dv =
            if (!names.contains("deletionVector")) None
            else Option(rm.getAs[org.apache.spark.sql.Row]("deletionVector")).map(dvFromRow)
          record(decodePath(rm.getAs[String]("path")), dv, ts)
        }
      }
      if (!cp.columns.contains("sidecar")) Seq.empty
      else cp.select("sidecar").where("sidecar IS NOT NULL").collect().toSeq
        .map(_.getStruct(0).getAs[String]("path"))
    }

    cps.toSeq.maxByOption(_._1).foreach { case (_, paths) =>
      val cpMtime = paths.map(p => fs.getFileStatus(p).getModificationTime).max
      val sidecarNames: Seq[String] =
        if (paths.size == 1 && paths.head.getName.endsWith(".json")) {
          // v2 JSON manifest: removes/sidecars from the JSON lines
          val in = fs.open(paths.head)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
            finally in.close()
          val sc = Seq.newBuilder[String]
          lines.filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            if (node.has("sidecar")) sc += node.get("sidecar").get("path").asText()
            if (node.has("remove")) {
              val rm = node.get("remove")
              val ts = Option(rm.get("deletionTimestamp")).filterNot(_.isNull)
                .map(_.asLong()).getOrElse(cpMtime)
              val dv = Option(rm.get("deletionVector")).filterNot(_.isNull)
                .map(DeletionVectors.parseDescriptor)
              record(decodePath(rm.get("path").asText()), dv, ts)
            }
          }
          sc.result()
        } else recordRemovesOf(spark.read.parquet(paths.map(_.toString): _*), cpMtime)
      val scPaths = sidecarNames.map(n => new Path(sidecarDir(tablePath), n))
      // vacuum decides what to DELETE from this list — a silently
      // dropped sidecar would hide tombstones and delete live files,
      // so refuse exactly like snapshot() does
      scPaths.foreach(p => require(fs.exists(p),
        s"v2 checkpoint of $tablePath references a missing sidecar file: $p"))
      if (scPaths.nonEmpty)
        recordRemovesOf(spark.read.parquet(scPaths.map(_.toString): _*), cpMtime)
    }

    jsons.toSeq.sortBy(_._1).foreach { case (_, p) =>
      lazy val mtime = fs.getFileStatus(p).getModificationTime
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("remove")) {
          val rm = node.get("remove")
          val ts = Option(rm.get("deletionTimestamp")).filterNot(_.isNull)
            .map(_.asLong()).getOrElse(mtime)
          val dv = Option(rm.get("deletionVector")).filterNot(_.isNull)
            .map(DeletionVectors.parseDescriptor)
          record(decodePath(rm.get("path").asText()), dv, ts)
        }
      }
    }
    out.toSeq.map { case ((path, dv), ts) => Tombstone(path, ts, dv) }
  }

  /** A change-data file (`cdc` action): rows this commit
    * updated/deleted, stored under `_change_data/` with a
    * `_change_type` column. `dataChange` is always false on cdc
    * actions (the data files already carry the table state).
    */
  final case class CdcFile(
      path: String,
      partitionValues: Map[String, Option[String]],
      size: Long)

  /** Everything the change-data-feed reader needs about one commit:
    * its cdc files plus the dataChange add/remove actions (removes
    * carried as AddFile so the removed file can be re-read to derive
    * delete rows — valid until vacuum reclaims it).
    */
  final case class VersionChanges(
      version: Long,
      timestamp: Long,
      cdc: Seq[CdcFile],
      adds: Seq[AddFile],
      removes: Seq[AddFile])

  /** Per-version change actions for versions [fromVersion, toVersion],
    * from the JSON commits (CDF reads need the per-commit action list,
    * which checkpoints do not preserve — an aged-out prefix refuses
    * loudly rather than silently skipping versions).
    */
  def changeActions(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long
  ): Seq[VersionChanges] =
    changeActionsIter(spark, tablePath, fromVersion, toVersion).toVector

  /** Lazy variant of [[changeActions]]: the log is listed (and the
    * range validated) eagerly, but each version's JSON commit is read
    * and parsed only when the iterator reaches it. Rate-limited
    * consumers (the streaming source's budget walk) can stop after a
    * bounded prefix without paying O(backlog) parse work per trigger.
    */
  def changeActionsIter(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long
  ): Iterator[VersionChanges] = {
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"invalid change range [$fromVersion, $toVersion]")
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (jsons, _) = listLog(spark, tablePath)
    val missing = (fromVersion to toVersion).filterNot(jsons.contains)
    require(missing.isEmpty,
      s"change data feed of $tablePath cannot replay versions " +
        s"${missing.mkString(", ")}: their JSON commits are gone (aged-out log)")

    def pvOf(n: JsonNode): Map[String, Option[String]] =
      Option(n.get("partitionValues")).map { o =>
        o.fields().asScala.map { e =>
          e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
        }.toMap
      }.getOrElse(Map.empty)

    (fromVersion to toVersion).iterator.map { v =>
      val p = jsons(v)
      val ts = fs.getFileStatus(p).getModificationTime
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      val cdc = Seq.newBuilder[CdcFile]
      val adds = Seq.newBuilder[AddFile]
      val removes = Seq.newBuilder[AddFile]
      lines.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("cdc")) {
          val c = node.get("cdc")
          cdc += CdcFile(decodePath(c.get("path").asText()), pvOf(c),
            Option(c.get("size")).map(_.asLong()).getOrElse(0L))
        }
        if (node.has("add")) {
          val a = node.get("add")
          if (a.path("dataChange").asBoolean(true))
            adds += AddFile(
              decodePath(a.get("path").asText()), pvOf(a),
              Option(a.get("size")).map(_.asLong()).getOrElse(0L),
              Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
              Option(a.get("deletionVector")).filterNot(_.isNull)
                .map(DeletionVectors.parseDescriptor))
        }
        if (node.has("remove")) {
          val r = node.get("remove")
          if (r.path("dataChange").asBoolean(true))
            removes += AddFile(
              decodePath(r.get("path").asText()), pvOf(r),
              Option(r.get("size")).map(_.asLong()).getOrElse(0L),
              None,
              Option(r.get("deletionVector")).filterNot(_.isNull)
                .map(DeletionVectors.parseDescriptor))
        }
      }
      VersionChanges(v, ts, cdc.result(), adds.result(), removes.result())
    }
  }

  /** add/remove paths are percent-encoded relative URIs per the
    * protocol.
    */
  private def decodePath(p: String): String =
    try java.net.URI.create(p).getPath
    catch { case _: IllegalArgumentException => p }

  /** [[decodePath]]'s exact inverse, applied at EVERY action write
    * site (commits, cdc, checkpoints): RFC 3986 pchar set kept
    * literal except ':' (a colon in a relative URI's first segment
    * would parse as a scheme) — everything else, '%' included,
    * percent-encodes its UTF-8 bytes. Without this, a Hive-escaped
    * partition dir like `part=x%3Ay` written raw would DECODE on read
    * to `part=x:y` and miss the file.
    */
  private[tables] def encodePath(p: String): String = {
    val sb = new StringBuilder(p.length + 8)
    p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val keep = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || "-._~!$&'()*+,;=@/".indexOf(c.toInt) >= 0
      if (keep) sb.append(c) else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** The newest usable checkpoint at or below `target`: the newer of
    * the `_last_checkpoint` hint and the listing (shared by the
    * driver-side [[snapshot]] replay and [[filesDataset]]).
    */
  private[tables] def checkpointChoice(
      fs: FileSystem,
      tablePath: String,
      cps: Map[Long, Seq[Path]],
      target: Long
  ): Option[(Long, Seq[Path])] = {
    val lcChoice: Option[(Long, Seq[Path])] =
      readLastCheckpoint(fs, tablePath).flatMap { case (v, parts) =>
        val paths = checkpointPaths(tablePath, v, parts)
        if (v <= target && paths.forall(fs.exists)) Some(v -> paths) else None
      }
    val listChoice: Option[(Long, Seq[Path])] =
      cps.view.filterKeys(_ <= target).toSeq.maxByOption(_._1)
    (lcChoice.toSeq ++ listChoice.toSeq).maxByOption(_._1)
  }

  /** (json commits by version, COMPLETE checkpoints by version — a
    * multi-part set missing any of its declared parts is treated as
    * absent, exactly like a checkpoint a writer is still writing).
    */
  private[tables] def listLog(
      spark: SparkSession,
      tablePath: String
  ): (Map[Long, Path], Map[Long, Seq[Path]]) = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return (Map.empty, Map.empty)
    val entries = fs.listStatus(dir).filter(_.isFile).map(_.getPath)
    val jsons = entries.flatMap(p => p.getName match {
      case JsonCommit(v) => Some(v.toLong -> p)
      case _             => None
    }).toMap
    val singles = entries.flatMap(p => p.getName match {
      case CheckpointFile(v) => Some(v.toLong -> p)
      case _                 => None
    }).toMap
    // multi-part: (version, declaredParts) → partIndex → path
    val multiGroups = entries.flatMap(p => p.getName match {
      case MultiPartCheckpointFile(v, i, n) => Some(((v.toLong, n.toInt), i.toInt, p))
      case _                                => None
    }).groupBy(_._1)
    val completeMultis: Map[Long, Seq[Path]] = multiGroups.collect {
      case ((v, n), parts) if parts.map(_._2).toSet == (1 to n).toSet =>
        v -> parts.sortBy(_._2).map(_._3).toSeq
    }
    // v2 (UUID-named) checkpoints: each file is a complete manifest;
    // several writers may leave one each at the same version — any one
    // is valid, pick deterministically
    val v2s: Map[Long, Seq[Path]] = entries.flatMap(p => p.getName match {
      case V2CheckpointFile(v, _, _) => Some(v.toLong -> p)
      case _                         => None
    }).groupBy(_._1).map { case (v, ps) => v -> Seq(ps.map(_._2).minBy(_.getName)) }
    // a complete single-file checkpoint wins over a multi-part set at
    // the same version (either is valid; one file is one read)
    val cps = completeMultis ++ v2s ++ singles.map { case (v, p) => v -> Seq(p) }
    (jsons, cps)
  }

  private implicit class IteratorAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
