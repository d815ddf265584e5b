package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg metadata tables — the `table$snapshots` / `$history` /
  * `$refs` / `$files` inspection surface (the Delta analog is
  * DESCRIBE HISTORY/DETAIL in E53's SQL front door): table state as
  * ordinary DataFrames, so health checks, retention policies, and
  * audit queries compose with the rest of the engine.
  *
  * Scale shape: snapshots/history/refs are O(snapshots) driver parses
  * of the metadata JSON — inherently small. `files` is DISTRIBUTED:
  * manifest paths parallelize and executors read their Avro entries
  * (the R52 maintenance discipline), so a 10⁷-file table's listing
  * never materializes on the driver.
  */
object IcebergMetaTables {

  final case class SnapshotRow(
      snapshot_id: Long, parent_id: Option[Long], sequence_number: Long,
      committed_at_ms: Long, operation: Option[String], manifest_list: String,
      main_lineage: Boolean)
  final case class HistoryRow(made_current_at_ms: Long, snapshot_id: Long)
  final case class RefRow(name: String, ref_type: String, snapshot_id: Long)
  final case class FileRow(
      content: Int, file_path: String, record_count: Long,
      sequence_number: Long, spec_id: Int, partition: Map[String, String],
      /** READABLE per-column stats (the upstream `readable_metrics`
        * idea): bounds decoded per the schema's field types, keyed by
        * column NAME; empty for stats-less writers.
        */
      lower_bounds: Map[String, String] = Map.empty,
      upper_bounds: Map[String, String] = Map.empty,
      null_value_counts: Map[String, Long] = Map.empty)

  private def root(spark: SparkSession, tablePath: String) = {
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(table, "metadata")
    val v = IcebergWrite.latestVersionByScan(fs, metaDir)
      .getOrElse(throw new IllegalArgumentException(s"no Iceberg metadata under $metaDir"))
    (fs, IcebergWrite.readRoot(fs, metaDir, v))
  }

  /** One row per snapshot, with parentage and main-lineage flag. */
  def snapshots(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val (_, r) = root(spark, tablePath)
    val parents = IcebergMeta.parentMap(r)
    val ancestors = {
      var at = Option(r.path("current-snapshot-id").asLong(-1L)).filter(_ >= 0)
      val b = Set.newBuilder[Long]
      while (at.isDefined) { b += at.get; at = parents.get(at.get).flatten }
      b.result()
    }
    IcebergMeta.elements(r.path("snapshots")).map { sn =>
      val id = sn.path("snapshot-id").asLong()
      SnapshotRow(
        id, parents(id),
        sn.path("sequence-number").asLong(0L),
        sn.path("timestamp-ms").asLong(0L),
        Option(sn.path("summary").path("operation").asText(null)),
        sn.path("manifest-list").asText(),
        ancestors.contains(id))
    }.toDF()
  }

  /** The snapshot-log: when each snapshot became current (main). */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val (_, r) = root(spark, tablePath)
    IcebergMeta.elements(r.path("snapshot-log")).map { e =>
      HistoryRow(e.path("timestamp-ms").asLong(0L), e.path("snapshot-id").asLong())
    }.toDF()
  }

  /** Named refs (tags and branches). */
  def refs(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    IcebergMeta.load(
      new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration),
      tablePath).refs.toSeq.map { case (n, ref) =>
      RefRow(n, ref.refType, ref.snapshotId)
    }.toDF()
  }

  /** Content files of the current snapshot (or `snapshotId`), one row
    * per live manifest entry — data AND delete files, with partition
    * tuples rendered as strings. Distributed: one task per manifest.
    */
  def files(
      spark: SparkSession,
      tablePath: String,
      snapshotId: Option[Long] = None
  ): DataFrame = {
    import spark.implicits._
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, tablePath)
    val snap = IcebergMeta.selectSnapshot(meta, snapshotId, None)
    val manifests = IcebergMeta.readAvro(fs, new Path(snap.manifestList)).map { m =>
      (m.get("manifest_path").toString,
        Option(m.get("sequence_number")).map(_.asInstanceOf[Number].longValue()).getOrElse(0L),
        Option(m.get("partition_spec_id")).map(_.asInstanceOf[Number].intValue()).getOrElse(0))
    }
    if (manifests.isEmpty) return Seq.empty[FileRow].toDF()
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // (field id → name, type) for readable bounds decoding in tasks —
    // TOP-LEVEL columns only (nested leaf ids stay un-rendered)
    val fieldMeta: Map[Int, (String, org.apache.spark.sql.types.DataType)] =
      meta.topFieldsByName.map { case (name, (id, dt)) => id -> ((name, dt)) }
    spark.sparkContext
      .parallelize(manifests, math.max(1, math.min(manifests.size, 32)))
      .flatMap { case (mPath, mSeq, specId) =>
        val p = new Path(mPath)
        IcebergMeta.readAvro(p.getFileSystem(conf.value), p).collect {
          case e if Option(e.get("status")).forall(_.asInstanceOf[Number].intValue() != 2) =>
            val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            val partition = Option(df.get("partition")) match {
              case Some(pr: org.apache.avro.generic.GenericRecord) =>
                pr.getSchema.getFields.toArray.map { f0 =>
                  val f = f0.asInstanceOf[org.apache.avro.Schema.Field]
                  f.name() -> Option(pr.get(f.name())).map(String.valueOf).orNull
                }.toMap
              case _ => Map.empty[String, String]
            }
            def readable(field: String): Map[String, String] =
              IcebergStats.boundsOf(df, field).flatMap { case (id, bytes) =>
                fieldMeta.get(id).flatMap { case (name, dt) =>
                  IcebergStats.decodeSingle(dt, bytes).map(v => name -> v.toString)
                }
              }
            FileRow(
              Option(df.get("content")).map(_.asInstanceOf[Number].intValue()).getOrElse(0),
              df.get("file_path").toString,
              Option(df.get("record_count")).map(_.asInstanceOf[Number].longValue()).getOrElse(0L),
              Option(e.get("sequence_number")).map(_.asInstanceOf[Number].longValue())
                .getOrElse(mSeq),
              specId, partition,
              lower_bounds = readable("lower_bounds"),
              upper_bounds = readable("upper_bounds"),
              null_value_counts = IcebergStats.countsOf(df, "null_value_counts")
                .flatMap { case (id, n) => fieldMeta.get(id).map(_._1 -> n) })
        }
      }.toDS().toDF()
  }
}
