package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Delta Change Data Feed reads (public PROTOCOL.md "Change Data
  * Files" / `delta.enableChangeDataFeed`): the per-commit row-level
  * change stream a downstream incremental pipeline consumes instead of
  * re-diffing snapshots.
  *
  * Per the protocol, a commit's change rows come from its `cdc`
  * actions when present (files under `_change_data/` carrying a
  * `_change_type` column); a commit WITHOUT cdc actions derives them:
  * dataChange `add` files are inserts, dataChange `remove` files are
  * deletes (re-read from the still-present removed file). A commit
  * that both adds and removes data files without cdc actions is
  * ambiguous (a rewrite) — refused loudly rather than guessed.
  *
  * Scale shape: one log pass for the action list (driver-side, like
  * every Delta reader), then plain parquet scans of exactly the
  * changed files — cost ∝ changed data, never ∝ table size, which is
  * the point of CDF at 100 TB.
  */
object DeltaChanges {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  /** Change rows for commits in `[fromVersion, min(toVersion, head)]`.
    * Result schema: table columns + _change_type, _commit_version,
    * _commit_timestamp.
    */
  def between(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Long,
      toVersion: Long = Long.MaxValue
  ): DataFrame = {
    val snap = DeltaLog.snapshot(spark, tablePath, withFiles = false)
    val meta = snap.metadata
    require(meta.configuration.get("delta.enableChangeDataFeed").contains("true"),
      s"change data feed is not enabled on $tablePath " +
        "(set delta.enableChangeDataFeed=true)")

    val to = math.min(toVersion, snap.version)
    // a start past the table head is an empty feed, not an error
    val versionChanges =
      if (fromVersion > to) Seq.empty
      else DeltaLog.changeActions(spark, tablePath, fromVersion, to)
    val frames = versionChanges.flatMap { vc =>
      val perVersion: Seq[DataFrame] =
        if (vc.cdc.nonEmpty) Seq(readCdc(spark, tablePath, meta, vc.cdc))
        else {
          require((vc.adds ++ vc.removes).forall(_.dv.forall(_.cardinality == 0)),
            s"version ${vc.version} of $tablePath changes rows via deletion vectors " +
              "without cdc actions — its change rows cannot be derived")
          require(vc.adds.isEmpty || vc.removes.isEmpty,
            s"version ${vc.version} of $tablePath both adds and removes data files " +
              "without cdc actions (a rewrite) — its change rows cannot be derived")
          val b = Seq.newBuilder[DataFrame]
          if (vc.adds.nonEmpty)
            b += DeltaRead.readFiles(spark, tablePath, meta, vc.adds)
              .withColumn(ChangeTypeCol, lit("insert"))
          if (vc.removes.nonEmpty)
            b += DeltaRead.readFiles(spark, tablePath, meta, vc.removes)
              .withColumn(ChangeTypeCol, lit("delete"))
          b.result()
        }
      perVersion.map(_
        .withColumn(CommitVersionCol, lit(vc.version))
        .withColumn(CommitTimestampCol, timestamp_millis(lit(vc.timestamp))))
    }

    if (frames.isEmpty) {
      val empty = StructType(meta.schema.fields ++ Seq(
        StructField(ChangeTypeCol, StringType),
        StructField(CommitVersionCol, org.apache.spark.sql.types.LongType),
        StructField(CommitTimestampCol, org.apache.spark.sql.types.TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
    } else frames.reduce(_.unionByName(_))
  }

  /** Read `_change_data` files: table data columns + `_change_type`
    * stored in the file, partition columns re-attached as literals
    * (same layout contract as data files). Under COLUMN MAPPING the
    * cdc files carry PHYSICAL column names (and `partitionValues`
    * keys are physical) exactly like data files — read physically,
    * rename to the logical schema after the scan, the [[DeltaRead]]
    * discipline; `_change_type` itself is never mapped (it is not a
    * schema column).
    */
  private def readCdc(
      spark: SparkSession,
      tableUri: String,
      meta: DeltaLog.Metadata,
      files: Seq[DeltaLog.CdcFile]
  ): DataFrame = {
    val schema = meta.schema
    val partCols = meta.partitionColumns
    val physPart = partCols.map(meta.physicalName).toSet
    val physData = meta.physicalSchema.fields.filterNot(f => physPart.contains(f.name))
    val logData = schema.fields.filterNot(f => partCols.contains(f.name))
    val fileSchema = StructType(physData :+ StructField(ChangeTypeCol, StringType))
    if (meta.columnMappingMode == "id")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val base = tableUri.stripSuffix("/")
    // ONE parquet relation over all cdc files of the range; partition
    // values ride as per-file constants ([[FileConstAttr]]) so plan
    // width stays flat in partition cardinality — the DeltaRead scan
    // discipline applied to the _change_data leg.
    val zone = PartitionAttach.sessionZone(spark)
    var df = spark.read.schema(fileSchema)
      .parquet(files.map(f => s"$base/${f.path}"): _*)
    // one shared path→tuple map for ALL partition columns
    val pvFields = StructType(partCols.map(c => StructField(c, schema(c).dataType)))
    val pvPhys = partCols.map(meta.physicalName)
    val pvTuple: Map[String, Any] =
      if (partCols.isEmpty) Map.empty
      else files.map { f =>
        val vs = partCols.zip(pvPhys).map { case (c, phys) =>
          f.partitionValues.get(phys).flatten
            .map(v => PartitionAttach.fromString(v, schema(c).dataType, zone)).orNull
        }
        DvDeleted.normalizePath(s"$base/${f.path}") -> PartitionAttach.tupleRow(vs)
      }.toMap
    partCols.zipWithIndex.foreach { case (c, i) =>
      df = df.withColumn(c, PartitionAttach.tupleField(pvTuple, pvFields, i))
    }
    df.select(logData.zip(physData).map { case (lf, pf) =>
        col(pf.name).cast(lf.dataType).as(lf.name)
      }.toSeq ++ partCols.map(col) :+ col(ChangeTypeCol): _*)
      .select((schema.fieldNames :+ ChangeTypeCol).map(col).toSeq: _*)
  }
}
