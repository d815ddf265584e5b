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

  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): CompactionResult = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val dataFiles = fs.listStatus(path).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(path.getParent, path.getName + "._compact_tmp")
    spark.read.parquet(dir).repartition(numFiles).write.mode("overwrite").parquet(tmp.toString)

    val backup = new Path(path.getParent, path.getName + "._compact_old")
    if (fs.exists(backup)) fs.delete(backup, true)
    fs.rename(path, backup)
    fs.rename(tmp, path)
    fs.delete(backup, true)

    val after = fs.listStatus(path).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactionResult(dataFiles.length, after, totalBytes)
  }
}
