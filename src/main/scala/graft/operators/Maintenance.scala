package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Lakehouse maintenance: small-file compaction.
  *
  * Streaming ingestion and fine-grained partitioned writes leave
  * directories with thousands of KB-scale files; at scan time every
  * file costs a task + an open + a footer read, so a 100 TB lake of
  * small files is scheduler-bound before it is IO-bound. Compaction
  * rewrites a directory to ~`targetFileBytes` files (the analog of
  * Delta's OPTIMIZE bin-packing), swapping the rewrite in only after
  * it is fully written.
  */
object Maintenance {

  final case class CompactionResult(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** @param rewrite optional transform applied during the rewrite —
    *   e.g. `_.sortWithinPartitions("k")` for read-locality clustering
    *   (the OPTIMIZE ... ZORDER analog). Must be row-preserving: the
    *   verify gate aborts the compaction if row count or schema change.
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      rewrite: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity
  ): CompactionResult = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val dataFiles = fs.listStatus(path).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val source = spark.read.parquet(dir)
    val expectedRows = source.count()
    val expectedSchema = source.schema

    val tmp = new Path(path.getParent, path.getName + "._compact_tmp")
    rewrite(spark.read.parquet(dir).repartition(numFiles))
      .write.mode("overwrite").parquet(tmp.toString)

    // Verify the rewrite BEFORE touching the live directory — a bad
    // compaction must never replace good data.
    val compacted = spark.read.parquet(tmp.toString)
    val compactedRows = compacted.count()
    if (compactedRows != expectedRows || compacted.schema != expectedSchema) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction of $dir produced $compactedRows rows (expected $expectedRows) " +
          s"or a different schema; aborted, live data untouched")
    }

    // Two renames can't be atomic on a generic FileSystem; the window
    // between them is crash-recoverable: if `dir` is missing, the data
    // is intact in `<dir>._compact_old` (rename it back) or, post-swap,
    // in `<dir>` with the old copy still in the backup. The verified
    // backup is deleted only after the swapped-in directory passes the
    // same row-count check.
    val backup = new Path(path.getParent, path.getName + "._compact_old")
    if (fs.exists(backup)) fs.delete(backup, true)
    if (!fs.rename(path, backup))
      throw new IllegalStateException(s"could not move $path aside to $backup; live data untouched")
    if (!fs.rename(tmp, path)) {
      fs.rename(backup, path) // roll back
      throw new IllegalStateException(s"could not swap compacted data into $path; rolled back")
    }
    val liveRows = spark.read.parquet(dir).count()
    if (liveRows != expectedRows) {
      fs.delete(path, true)
      fs.rename(backup, path) // roll back to the original
      throw new IllegalStateException(
        s"post-swap verification of $dir read $liveRows rows (expected $expectedRows); rolled back")
    }
    fs.delete(backup, true)

    val after = fs.listStatus(path).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactionResult(dataFiles.length, after, totalBytes)
  }
}
