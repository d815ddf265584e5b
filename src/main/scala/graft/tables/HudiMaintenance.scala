package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Hudi table maintenance — the CLEANER (public `hoodie.cleaner`
  * KEEP_LATEST_COMMITS semantics): copy-on-write rewrites leave every
  * superseded base file on disk for time travel; the cleaner deletes
  * base files that no snapshot within the retention window can reach,
  * bounding storage growth. The third leg of the janitor triad
  * (Delta VACUUM R28/R45, Iceberg expireSnapshots/orphans R52).
  *
  * Retention = the latest `retainLast` completed instants: every file
  * slice reachable from the snapshot AS OF each retained instant
  * survives; everything else written by the timeline is deleted.
  * Time travel OLDER than the window stops working — the same
  * contract as Delta VACUUM beyond its retention.
  *
  * Scale shape: reachability is O(timeline metadata) driver work (the
  * same commit-JSON parses every other Hudi path does); the DELETE
  * pass runs as a Spark job over the parallelized dead-file list (the
  * R45 distributed-VACUUM discipline).
  */
object HudiMaintenance {

  /** Delete base AND log files unreachable from the latest
    * `retainLast` snapshots (a compacted MOR group's superseded
    * `.log` files age out exactly like superseded base files).
    * Returns the deleted table-relative paths.
    */
  def clean(spark: SparkSession, tablePath: String, retainLast: Int): Seq[String] = {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    HudiWrite.readProps(fs, tablePath) // refuses non-Hudi paths
    val instants = HudiWrite.completedInstants(fs, tablePath, None).map(_._1)
    if (instants.isEmpty) return Seq.empty
    val retained = instants.takeRight(retainLast)
    val keep: Set[String] = retained
      .flatMap(i => HudiWrite.latestSlices(fs, tablePath, Some(i))
        .flatMap(s => s.relPath +: s.logFiles.map(_._2)))
      .toSet
    val dead = HudiWrite.allWrittenPaths(fs, tablePath)
      .distinct.filterNot(keep)
    if (dead.isEmpty) return Seq.empty

    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // report only files this run actually removed (delete returns
    // false for already-gone paths), so repeated cleans are no-ops
    spark.sparkContext
      .parallelize(dead, math.max(1, math.min(dead.size, 32)))
      .mapPartitions { it =>
        val dfs = new Path(tablePath).getFileSystem(conf.value)
        it.filter(rel => dfs.delete(new Path(tablePath, rel), false))
      }
      .collect().toSeq
  }
}
