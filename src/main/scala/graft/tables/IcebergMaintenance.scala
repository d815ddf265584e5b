package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Iceberg table maintenance: snapshot expiration and orphan-file
  * removal — the Iceberg half of the engine's lakehouse-janitor
  * surface (Delta's is OPTIMIZE/VACUUM, R28/R45).
  *
  * Both operations follow the public Iceberg semantics
  * (ExpireSnapshots / DeleteOrphanFiles actions):
  *
  *  - [[expireSnapshots]] retires old snapshots from the metadata via
  *    the same PUT-IF-ABSENT versioned-JSON commit loop the writer
  *    uses (a racing append and an expire can both land; neither is
  *    dropped), then deletes the files ONLY expired snapshots
  *    reference: their manifest lists, manifests no retained snapshot
  *    carries, and — for natively-owned tables — data/delete files
  *    unreachable from every retained snapshot. On a Delta-owned
  *    table (UniForm export) data files belong to the DELTA log and
  *    its VACUUM; expiration prunes Iceberg metadata only.
  *  - [[removeOrphanFiles]] deletes files under the table location
  *    that no snapshot references and that are older than the cutoff
  *    (protecting in-flight writes) — crashed staging dirs, files
  *    from failed commits.
  *
  * Scale shape: only MANIFEST-level reachability (manifest lists +
  * manifest paths, O(manifests)) is driver work. CONTENT-file
  * reachability — O(files), the set that outgrows a driver at 10⁷
  * files — is a distributed dataset end-to-end: manifest paths
  * parallelize, executors read the Avro entries, and both expire's
  * dead-diff and orphan removal's keep-check are anti-diffs
  * (`except`) between datasets, mirroring the distributed VACUUM
  * discipline (R45). The orphan LISTING and all DELETE passes are
  * Spark jobs too; [[IcebergMeta.driverContentFilePlans]] stays flat
  * across maintenance (spec-asserted).
  */
object IcebergMaintenance {

  private val mapper = new ObjectMapper()
  private val MaxAttempts = 10

  /** METADATA a snapshot set pins — manifest lists and manifest
    * paths, O(manifests) driver work. Content-file reachability is
    * deliberately NOT here: content paths are O(files), not
    * O(metadata), so they only ever exist as the distributed
    * [[contentPaths]] dataset (the R45/R39 discipline; Delta's
    * distributed VACUUM active set is the same shape).
    */
  private final case class MetaReachable(manifestLists: Set[String], manifests: Set[String])

  private def metaReachable(
      fs: FileSystem, snapshots: Seq[IcebergMeta.SnapshotInfo]): MetaReachable = {
    val lists = snapshots.map(_.manifestList).toSet
    val manifests = snapshots.flatMap { s =>
      IcebergMeta.readAvro(fs, new Path(s.manifestList)).map(_.get("manifest_path").toString)
    }.toSet
    MetaReachable(lists, manifests)
  }

  /** The content-file paths (URI-path normalized) the given manifests
    * carry, as a DISTRIBUTED dataset: manifest paths parallelize,
    * each executor task reads its manifests' Avro entries — at the
    * 10⁷-file scale the file set never touches the driver
    * ([[IcebergMeta.driverContentFilePlans]] stays flat; the
    * maintenance spec asserts it).
    */
  private def contentPaths(
      spark: SparkSession, manifests: Seq[String]): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val distinct = manifests.distinct
    if (distinct.isEmpty) return spark.emptyDataset[String]
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(distinct, math.max(1, math.min(distinct.size, 32)))
      .flatMap { m =>
        val p = new Path(m)
        IcebergMeta.manifestContentPaths(p.getFileSystem(conf.value), p)
          .map(cp => new Path(cp).toUri.getPath)
      }.toDS()
  }

  private def distributedDelete(spark: SparkSession, tableRoot: String, paths: Seq[String]): Unit =
    if (paths.nonEmpty) {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.sparkContext
        .parallelize(paths, math.max(1, math.min(paths.size, 32)))
        .foreachPartition { it =>
          val fs = new Path(tableRoot).getFileSystem(conf.value)
          it.foreach(p => fs.delete(new Path(p), false))
        }
    }

  /** Compaction (the public `rewrite_data_files` action): read the
    * CURRENT snapshot through the reader — position/equality deletes
    * applied — and overwrite the table with the merged rows, so the
    * new snapshot carries plain data files and no delete files. The
    * merge-on-read debt ([[IcebergWrite.deleteWhere]]) is paid here
    * once, instead of on every read; afterwards
    * [[expireSnapshots]] reclaims the old files and
    * [[DeltaConvert.fromIceberg]] (which refuses delete-carrying
    * snapshots) accepts the table. Returns the committed snapshot id.
    */
  def rewriteDataFiles(spark: SparkSession, tablePath: String): Long = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, tablePath)
    val spec = meta.specs.getOrElse(meta.defaultSpecId, Seq.empty)
    require(spec.forall(_.transform == "identity"),
      "rewrite_data_files supports identity partition specs only")
    val partCols = spec.map(_.name)
    val current = new IcebergTable("compact", tablePath)(spark, ReadArgs.empty)
      .select(meta.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    IcebergWrite.overwrite(spark, current, tablePath, partCols)
  }

  /** Retire all but the newest `keepLast` snapshots (the current
    * snapshot is always retained). Returns the expired snapshot ids;
    * no-op (no new metadata version) when nothing expires.
    */
  def expireSnapshots(spark: SparkSession, tablePath: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(table, "metadata")
    val deltaOwned = fs.exists(new Path(table, "_delta_log"))

    var attempt = 0
    while (true) {
      attempt += 1
      val baseV = IcebergWrite.latestVersionByScan(fs, metaDir)
        .getOrElse(throw new IllegalArgumentException(s"no Iceberg metadata under $metaDir"))
      val root = IcebergWrite.readRoot(fs, metaDir, baseV).deepCopy[ObjectNode]()
      val meta = IcebergMeta.parse(root, tablePath)

      val ordered = meta.snapshots.sortBy(s => (s.timestampMs, s.id))
      // ref-pinned snapshots (tags/branches) survive regardless of
      // the retention count — a tag IS the request to keep it
      val keepIds = (ordered.takeRight(keepLast).map(_.id) ++
        meta.currentSnapshotId ++ meta.refs.values.map(_.snapshotId)).toSet
      val expired = ordered.filterNot(s => keepIds.contains(s.id))
      if (expired.isEmpty) return Seq.empty
      val retained = ordered.filter(s => keepIds.contains(s.id))

      val expiredIds = expired.map(_.id).toSet
      def prune(field: String, idField: String): Unit = root.path(field) match {
        case arr: ArrayNode =>
          val kept = IcebergMeta.elements(arr)
            .filterNot(n => expiredIds.contains(n.path(idField).asLong()))
          arr.removeAll()
          kept.foreach(arr.add)
        case _ => ()
      }
      prune("snapshots", "snapshot-id")
      prune("snapshot-log", "snapshot-id")
      root.put("last-updated-ms", System.currentTimeMillis())

      val target = new Path(metaDir, s"v${baseV + 1}.metadata.json")
      if (IcebergWrite.publishIfAbsent(fs, target,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))) {
        val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
        try hint.write((baseV + 1).toString.getBytes("UTF-8")) finally hint.close()

        // ---- physical cleanup: only what NO retained snapshot pins.
        // Shared files are the norm (append carries manifests forward)
        // — the set difference, not the expired set, is what deletes.
        val live = metaReachable(fs, retained)
        val dead = metaReachable(fs, expired)
        val deadLists = (dead.manifestLists -- live.manifestLists).toSeq
        val deadManifests = (dead.manifests -- live.manifests).toSeq
        if (!deltaOwned) { // Delta VACUUM owns a Delta-owned table's data
          // content diff runs distributed end-to-end: a manifest the
          // live side shares contributes nothing (all its files are
          // live), so only dead-ONLY manifests are even read; the
          // anti-diff against every live manifest's files catches
          // file-level sharing across rewritten manifests. Content
          // deletes MUST land before the manifests they were read
          // from are deleted (except is lazy until foreachPartition).
          val conf = new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration)
          contentPaths(spark, deadManifests)
            .except(contentPaths(spark, live.manifests.toSeq))
            .foreachPartition { (it: Iterator[String]) =>
              val dfs = new Path(tablePath).getFileSystem(conf.value)
              it.foreach(p => dfs.delete(new Path(p), false))
            }
        }
        distributedDelete(spark, tablePath, deadLists ++ deadManifests)
        return expired.map(_.id)
      }
      if (attempt >= MaxAttempts)
        throw new java.io.IOException(
          s"could not commit expire to $tablePath after $MaxAttempts attempts")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Delete files under the table location that no snapshot of the
    * CURRENT metadata references and whose modification time is older
    * than `olderThanMs` (protects in-flight commits and stages).
    * Metadata versions, manifests and the version hint are always
    * kept. Returns the deleted paths.
    *
    * Refuses Delta-owned tables: there the Delta log is the source of
    * truth and [[DeltaWrite.vacuum]] is the janitor.
    */
  def removeOrphanFiles(spark: SparkSession, tablePath: String, olderThanMs: Long): Seq[String] = {
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(table, "_delta_log")),
      s"$tablePath is Delta-owned; orphan cleanup belongs to DeltaWrite.vacuum")
    val metaDir = new Path(table, "metadata")
    require(fs.exists(metaDir), s"no Iceberg metadata under $metaDir")

    val meta = IcebergMeta.load(fs, tablePath)
    val live = metaReachable(fs, meta.snapshots)
    val metaFiles = fs.listStatus(metaDir).map(_.getPath.toUri.getPath).toSet
    // METADATA keep-set only — O(manifests), broadcastable by design.
    // Content files are the O(files) side and stay a distributed
    // anti-join below, never a driver set.
    val keepMeta: Set[String] =
      live.manifestLists.map(p => new Path(p).toUri.getPath) ++
        live.manifests.map(p => new Path(p).toUri.getPath) ++
        metaFiles

    // candidate dirs driver-side at DIRECTORY granularity (R45's BFS
    // shape); per-dir file listing + age filter run executor-side
    val dirs = scala.collection.mutable.ArrayBuffer[String]()
    def bfs(p: Path): Unit = {
      dirs += p.toString
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory && st.getPath.getName != "metadata") bfs(st.getPath)
      }
    }
    bfs(table)

    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val keepB = spark.sparkContext.broadcast(keepMeta)
    val cutoff = olderThanMs
    import spark.implicits._
    val candidates = spark.sparkContext
      .parallelize(dirs.toSeq, math.max(1, math.min(dirs.size, 32)))
      .flatMap { d =>
        val dfs = new Path(d).getFileSystem(conf.value)
        dfs.listStatus(new Path(d)).iterator
          .filter(st => st.isFile && st.getModificationTime < cutoff &&
            !keepB.value.contains(st.getPath.toUri.getPath))
          .map(_.getPath.toUri.getPath).toSeq
      }.toDS()
    // referenced content files drop out via distributed anti-diff;
    // what survives is orphaned by definition (and aged past cutoff)
    val deleted = candidates
      .except(contentPaths(spark, live.manifests.toSeq))
      .mapPartitions { it =>
        val dfs = new Path(tablePath).getFileSystem(conf.value)
        it.map { p => dfs.delete(new Path(p), false); p }
      }
      .collect().toSeq

    // sweep aged staging dirs that hold no files (bounded by the dir
    // list). "No files" is checked RECURSIVELY — a crashed partitioned
    // append leaves `_staging_iceberg_x/part=0/` whose direct listing
    // stays non-empty (the subdir) even after its orphan parquet was
    // deleted above, so a shallow isEmpty check would keep it forever.
    // The age guard protects an in-flight write that has made dirs but
    // not yet written files.
    dirs.toSeq.reverse.foreach { d =>
      val p = new Path(d)
      if (p.getName.startsWith("_staging_iceberg_") && fs.exists(p) &&
        fs.getFileStatus(p).getModificationTime < cutoff &&
        !fs.listFiles(p, true).hasNext) fs.delete(p, true)
    }
    deleted
  }
}
