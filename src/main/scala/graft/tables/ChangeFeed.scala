package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One change-stream contract over the lakehouse triad — the
  * format-dispatch seam [[graft.operators.IncrementalView]] (and any
  * other signed-delta consumer) reads through instead of importing a
  * format's reader directly.
  *
  * Versions are format-native tokens squeezed into a MONOTONIC Long
  * so a consumer can checkpoint one number: Delta's commit version,
  * Iceberg's snapshot SEQUENCE number (ids are random for foreign
  * writers; sequence numbers are spec-monotonic), Hudi's 17-digit
  * instant parsed as a Long. [[changes]] emits the table's rows plus
  * `_change_type` with insert/delete (+ update_preimage/postimage
  * from Delta's CDF) — the shared column name across all three
  * readers.
  */
trait ChangeFeed {

  /** The table's current version token (monotonic). */
  def head(spark: SparkSession): Long

  /** [[head]] as an Option: `None` when NO version is safely
    * consumable yet (e.g. a Hudi pending-instant fence below every
    * completed commit) — a polling consumer holds its previous
    * offset instead of failing, the same non-exceptional shape
    * [[graft.streaming.HudiStreamSource.getOffset]] uses.
    */
  def headOption(spark: SparkSession): Option[Long] = Some(head(spark))

  /** Typed change rows committed in `(fromVersion, toVersion]`. */
  def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame

  /** Full snapshot pinned at `version` (initialize / recompute). */
  def snapshotAt(spark: SparkSession, version: Long): DataFrame

  /** The table's data schema (no change columns). */
  def tableSchema(spark: SparkSession): org.apache.spark.sql.types.StructType

  /** Commit version tokens in `(fromVersion, toVersion]`, ascending —
    * what a bounded-catch-up consumer caps a batch with.
    */
  def versions(spark: SparkSession, fromVersion: Long, toVersion: Long): Seq[Long]

  /** [[changes]] projected to the UNIFORM cdc contract every leg
    * shares: table columns + `_change_type` + `_commit_version`
    * (this feed's version Long per row) + `_commit_timestamp` — the
    * schema a format-agnostic streaming consumer reads.
    */
  def changesUniform(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame

  /** The uniform cdc schema ([[changesUniform]]'s). */
  final def uniformSchema(spark: SparkSession): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(tableSchema(spark).fields ++ Seq(
      StructField(DeltaChanges.ChangeTypeCol, StringType),
      StructField(DeltaChanges.CommitVersionCol, LongType),
      StructField(DeltaChanges.CommitTimestampCol, TimestampType)))
  }
}

object ChangeFeed {

  /** Detect the table format from its on-disk layout: `_delta_log`
    * → `"delta"`, `.hoodie` → `"hudi"`, `metadata/v*.metadata.json`
    * → `"iceberg"` — `None` when the path matches none of them.
    */
  def detectFormat(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(p, "_delta_log"))) Some("delta")
    else if (fs.exists(new Path(p, ".hoodie"))) Some("hudi")
    else if (fs.exists(new Path(p, "metadata")) &&
      fs.listStatus(new Path(p, "metadata"))
        .exists(_.getPath.getName.matches("v\\d+\\.metadata\\.json")))
      Some("iceberg")
    else None
  }

  /** The [[ChangeFeed]] leg for a table, by on-disk layout — refused
    * loudly when the path is none of the three formats.
    */
  def forPath(spark: SparkSession, path: String): ChangeFeed =
    detectFormat(spark, path) match {
      case Some("delta")   => new DeltaFeed(path)
      case Some("hudi")    => new HudiFeed(path)
      case Some("iceberg") => new IcebergFeed(path)
      case _ => throw new IllegalArgumentException(
        s"$path is not a Delta, Iceberg or Hudi table " +
          "(no _delta_log, metadata/v*.metadata.json or .hoodie)")
    }
}

/** Delta leg: versions ARE the commit versions; changes come from
  * the change data feed ([[DeltaChanges.between]], from-exclusive
  * adjusted to its inclusive contract).
  */
final class DeltaFeed(val path: String) extends ChangeFeed {
  import org.apache.spark.sql.functions.col

  override def head(spark: SparkSession): Long =
    DeltaLog.snapshot(spark, path, withFiles = false).version

  override def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame =
    DeltaChanges.between(spark, path, fromVersion + 1, toVersion)

  override def snapshotAt(spark: SparkSession, version: Long): DataFrame =
    new DeltaTable("base", path)(spark,
      ReadArgs(extra = Map("versionAsOf" -> version)))

  override def tableSchema(spark: SparkSession): org.apache.spark.sql.types.StructType =
    DeltaLog.snapshot(spark, path, withFiles = false).schema

  override def versions(spark: SparkSession, fromVersion: Long, toVersion: Long): Seq[Long] =
    (fromVersion + 1) to toVersion // Delta versions are dense

  override def changesUniform(
      spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    val cols = tableSchema(spark).fieldNames.map(col).toSeq ++ Seq(
      col(DeltaChanges.ChangeTypeCol),
      col(DeltaChanges.CommitVersionCol),
      col(DeltaChanges.CommitTimestampCol))
    changes(spark, fromVersion, toVersion).select(cols: _*)
  }
}

/** Iceberg leg: version tokens are snapshot SEQUENCE numbers
  * (monotonic per the spec), resolved to snapshot ids through the
  * current snapshot's ancestor chain before the changelog walk.
  */
final class IcebergFeed(val path: String) extends ChangeFeed {

  private def meta(spark: SparkSession): IcebergMeta.TableMeta = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = IcebergMeta.load(fs, path)
    // v1 tables are spec-legal but OMIT sequence numbers (parsed as 0
    // for every snapshot): head() would sit at 0 forever and every
    // consumer would silently report "no changes" — refuse loudly
    // instead, the same honesty discipline as the unreadable-DV path
    require(m.formatVersion >= 2,
      s"Iceberg table $path is format-version ${m.formatVersion}: v1 " +
        "snapshots carry no sequence numbers, so a monotonic ChangeFeed " +
        "version token cannot be derived — upgrade the table to v2+")
    m
  }

  private def current(m: IcebergMeta.TableMeta): IcebergMeta.SnapshotInfo =
    IcebergMeta.selectSnapshot(m, None, None)

  /** The main-lineage snapshot with sequence number `seq`: walked
    * from the current snapshot through parent ids so a branch
    * snapshot sharing the number never resolves.
    */
  private def snapshotOfSeq(m: IcebergMeta.TableMeta, seq: Long): IcebergMeta.SnapshotInfo = {
    val byId = m.snapshots.map(s => s.id -> s).toMap
    var at: Option[IcebergMeta.SnapshotInfo] = Some(current(m))
    var steps = 0
    while (at.isDefined && at.get.sequenceNumber > seq && steps <= m.snapshots.size) {
      at = at.get.parentId.flatMap(byId.get)
      steps += 1
    }
    at.filter(_.sequenceNumber == seq).getOrElse {
      // parent links incomplete (foreign writer): fall back to the
      // unique snapshot carrying the number
      val hits = m.snapshots.filter(_.sequenceNumber == seq)
      require(hits.size == 1,
        s"cannot resolve sequence number $seq in $path " +
          s"(${hits.size} snapshots carry it and parent links are incomplete)")
      hits.head
    }
  }

  override def head(spark: SparkSession): Long =
    current(meta(spark)).sequenceNumber

  override def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    val m = meta(spark)
    new IcebergTable("base", path).changes(spark,
      snapshotOfSeq(m, fromVersion).id, snapshotOfSeq(m, toVersion).id)
  }

  override def snapshotAt(spark: SparkSession, version: Long): DataFrame = {
    val m = meta(spark)
    val table = new IcebergTable("base", path)
    table(spark, ReadArgs(extra = Map(table.SnapshotIdKey -> snapshotOfSeq(m, version).id)))
  }

  override def tableSchema(spark: SparkSession): org.apache.spark.sql.types.StructType =
    meta(spark).schema

  override def versions(spark: SparkSession, fromVersion: Long, toVersion: Long): Seq[Long] = {
    val m = meta(spark)
    IcebergMeta.lineage(m, snapshotOfSeq(m, fromVersion).id, snapshotOfSeq(m, toVersion).id)
      .map(_.sequenceNumber)
  }

  override def changesUniform(
      spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val m = meta(spark)
    // per-row snapshot id → sequence number through a literal map
    // (snapshot count is metadata-bounded)
    val idToSeq = m.snapshots.map(s => s.id -> s.sequenceNumber).toMap
    val cols = m.schema.fieldNames.map(col).toSeq ++ Seq(
      col(IcebergTable.ChangeTypeCol),
      element_at(
        typedlit(idToSeq), col(IcebergTable.CommitSnapshotCol))
        .as(DeltaChanges.CommitVersionCol),
      col(IcebergTable.CommitTimestampCol))
    changes(spark, fromVersion, toVersion).select(cols: _*)
  }
}

/** Hudi leg: version tokens are the 17-digit commit instants parsed
  * as Longs (wall-clock-ordered by construction).
  */
final class HudiFeed(val path: String) extends ChangeFeed {

  private def instantStr(v: Long): String = f"$v%017d"

  override def headOption(spark: SparkSession): Option[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fenced at the earliest PENDING instant: a racing writer whose
    // lower instant completes later must not be skipped forever —
    // None means nothing is safely consumable YET (empty table, or a
    // crashed writer's stale marker until rollbackPending clears it)
    HudiWrite.safeHeadInstant(fs, path).map(_.toLong)
  }

  override def head(spark: SparkSession): Long =
    headOption(spark).getOrElse(throw new IllegalArgumentException(
      s"Hudi table $path has no completed commits below its pending instants"))

  override def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame =
    new HudiTable("base", path)
      .changes(spark, instantStr(fromVersion), Some(instantStr(toVersion)))

  override def snapshotAt(spark: SparkSession, version: Long): DataFrame = {
    val table = new HudiTable("base", path)
    table(spark, ReadArgs(extra = Map(table.AsOfInstantKey -> instantStr(version))))
  }

  override def tableSchema(spark: SparkSession): org.apache.spark.sql.types.StructType =
    new HudiTable("base", path)(spark, ReadArgs.empty).schema

  override def versions(spark: SparkSession, fromVersion: Long, toVersion: Long): Seq[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    HudiWrite.completedInstants(fs, path, Some(instantStr(toVersion)))
      .map(_._1.toLong).filter(_ > fromVersion)
  }

  override def changesUniform(
      spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = changes(spark, fromVersion, toVersion)
    val dataCols = raw.columns.filterNot(Set(
      HudiTable.ChangeTypeCol, HudiTable.CommitInstantCol,
      HudiTable.ChangeOrdinalCol, HudiTable.CommitTimestampCol)).toSeq
    raw.select(dataCols.map(col) ++ Seq(
      col(HudiTable.ChangeTypeCol),
      col(HudiTable.CommitInstantCol).cast("long")
        .as(DeltaChanges.CommitVersionCol),
      col(HudiTable.CommitTimestampCol)): _*)
  }
}
