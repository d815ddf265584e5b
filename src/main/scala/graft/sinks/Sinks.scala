package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side layout helpers: codify the three storage layouts the
  * read path exploits (partition pruning, bucket co-location, sane
  * file sizes). At 100 TB the write layout IS the query plan of every
  * future read — these helpers make the right layout the easy path.
  */
object Sinks {

  /** Hive-partitioned parquet: downstream filters on the partition
    * columns prune whole directories at planning time.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: equi-joins and aggregations on the
    * bucket key run without a shuffle (see StorageLayoutSpec).
    * Bucketing requires the table catalog, hence saveAsTable.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Deterministic shuffled shards — the export shape a training data
    * loader consumes: every row lands in shard `md5(salt|id) % n`
    * (engine- and partitioning-stable, like [[graft.operators
    * .Sampling]]'s gates), rows within a shard are ordered by the
    * same hash (a reproducible global shuffle, no RNG), and shards
    * are written as `shard=N/` partition dirs so a loader can read
    * any subset. The hash decorrelates neighbors, so each shard is an
    * unbiased sample of the corpus — what per-worker training streams
    * need. One shuffle total.
    */
  /** The shard a row lands in: md5(salt|id) % numShards — the same
    * portable hash the samplers use, so any engine (and the DuckDB
    * oracle) reproduces the assignment bit-for-bit.
    */
  def shardOf(id: org.apache.spark.sql.Column, numShards: Int, salt: String = "shard")
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat_ws, lit}
    (graft.functions.PortableHash.md5Mod(
      concat_ws("|", lit(salt), id.cast("string"))) % numShards).cast("int")
  }

  def writeShuffledShards(
      df: DataFrame,
      path: String,
      idCol: String,
      numShards: Int,
      salt: String = "shard",
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val h = graft.functions.PortableHash.md5Mod(
      concat_ws("|", lit(salt), col(idCol).cast("string")))
    df.withColumn("shard", shardOf(col(idCol), numShards, salt))
      .withColumn("_shuffle_key", h)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_shuffle_key"), col(idCol))
      .drop("_shuffle_key")
      .write.mode(mode).partitionBy("shard").parquet(path)
  }

  /** Size-targeted parquet: estimates the row byte-width from a
    * sample-free logical-plan stats pass and repartitions so output
    * files land near `targetFileBytes` (the write-time counterpart of
    * Maintenance.compactParquet).
    */
  def writeSized(
      df: DataFrame,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      (estBytes / BigInt(targetFileBytes)).toInt.min(100000))
    df.repartition(parts).write.mode(mode).parquet(path)
  }

  /** Point-lookup-optimized parquet: per-column BLOOM FILTERS in the
    * file footers (parquet-mr's split-block bloom, the public
    * `parquet.bloom.filter.*` write options), so an equality probe on
    * a high-cardinality column (doc id, record key, url hash) skips
    * whole row groups whose filter says "definitely absent" — the
    * 100-TB point-lookup path where min/max stats never prune because
    * ids are uniformly distributed across every file.
    *
    * `ndvByColumn` sizes each filter (expected distinct values; too
    * small inflates false positives, too large wastes footer bytes).
    * Combine with [[writeShuffledShards]]-style sorting on the probe
    * column to ALSO get min/max pruning; blooms cover the unsorted
    * case.
    */
  def writeWithBloomFilters(
      df: DataFrame,
      path: String,
      ndvByColumn: Map[String, Long],
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    require(ndvByColumn.nonEmpty, "at least one bloom column required")
    ndvByColumn.keys.foreach(c => require(df.columns.contains(c),
      s"bloom column $c missing from the frame"))
    val w = ndvByColumn.foldLeft(df.write.mode(mode)) { case (wr, (c, ndv)) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }
}
