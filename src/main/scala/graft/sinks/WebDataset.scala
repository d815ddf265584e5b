package graft.sinks

import graft.functions.PortableHash
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.{Partitioner, TaskContext}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** WebDataset-style tar shard export/import — the loader format
  * large-scale (multi)modal training pipelines stream
  * (github.com/webdataset/webdataset, public format: a plain tar
  * whose entries group by key, `<key>.<ext>`): each shard is one tar,
  * samples are consecutive entries sharing a key, and training
  * workers stream shards with plain sequential reads — no random
  * access, no index, any filesystem.
  *
  * Export discipline mirrors [[Sinks.writeShuffledShards]]: the shard
  * and the within-shard order are both md5-derived
  * (`md5(salt|id) % n`, [[PortableHash]]), so the assignment is
  * partitioning-stable, engine-portable, and reproducible — and each
  * shard is an unbiased sample of the corpus (what per-worker
  * training streams need). Tar bytes are BIT-DETERMINISTIC: fixed
  * mode/uid/gid, mtime 0, POSIX ustar headers — two runs produce
  * byte-identical shards, so shard checksums are meaningful.
  *
  * Scale shape: ONE shuffle
  * (`repartitionAndSortWithinPartitions` — each reducer owns exactly
  * one shard and streams it to its tar in sort order; nothing is
  * buffered beyond a single entry's payload). Import is one Spark
  * job over the shard list, each task streaming ONE tar
  * sequentially — memory is O(largest single entry), not O(shard).
  */
object WebDataset {

  private val BlockSize = 512

  /** Max entry-name length the ustar `name` field holds. Longer keys
    * refuse loudly rather than truncate (PAX extensions are out of
    * scope for an exporter that controls its own names).
    */
  private val MaxName = 100

  /** Export `df` as `numShards` tar files `shard-NNNNNN.tar` under
    * `path`. Every row becomes one sample: entries `<id>.<ext>` for
    * each `(ext, column)` in `entries` (columns are cast to BINARY;
    * strings become their UTF-8 bytes). NULL payloads are skipped
    * (a sample may legitimately lack a modality). Rows within a
    * shard are ordered by the portable shuffle hash (id tie-break).
    * Shards with no rows write an empty (end-blocks-only) tar so the
    * loader's `%06d` glob is dense.
    */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      entries: Seq[(String, String)],
      numShards: Int,
      salt: String = "shard"
  ): Unit = {
    require(numShards > 0, "numShards must be positive")
    require(entries.nonEmpty, "at least one (ext, column) entry required")
    val spark = df.sparkSession
    // ONE hash definition: Sinks.shardOf for the assignment, the same
    // un-modded md5 for the within-shard order — the spec and the
    // DuckDB oracle rely on parity with the parquet-shard export
    val h = PortableHash.md5Mod(
      concat_ws("|", lit(salt), col(idCol).cast("string")))
    val prepared = df.select(
      Seq(Sinks.shardOf(col(idCol), numShards, salt).as("_shard"),
        h.as("_order"),
        col(idCol).cast("string").as("_key")) ++
        entries.map { case (_, c) => col(c).cast("binary") }: _*)

    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val exts = entries.map(_._1)
    val outDir = path
    val part = new Partitioner {
      override def numPartitions: Int = numShards
      override def getPartition(key: Any): Int =
        key.asInstanceOf[(Int, Long, String)]._1
    }
    // (shard, orderHash, key) sorts each reducer's stream into the
    // final tar order; the partitioner routes on shard alone, so one
    // reducer = one shard = one output file.
    val keyed = prepared.rdd.map { r =>
      ((r.getInt(0), r.getLong(1), r.getString(2)), r)
    }
    keyed.repartitionAndSortWithinPartitions(part)
      .foreachPartition { it: Iterator[((Int, Long, String), Row)] =>
        val shard = TaskContext.getPartitionId()
        val fs = new Path(outDir).getFileSystem(conf.value)
        fs.mkdirs(new Path(outDir))
        // write-then-rename commit: a speculative or retried attempt
        // writes its OWN dot-prefixed temp (invisible to the reader's
        // shard glob) and publishes atomically — two live attempts
        // can never interleave bytes in the final artifact, and since
        // shard bytes are deterministic, whichever rename lands last
        // publishes identical content
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val finalPath = new Path(outDir, f"shard-$shard%06d.tar")
        val tmpPath = new Path(outDir, f".shard-$shard%06d.tar.inprogress-$attempt")
        val out = fs.create(tmpPath, true)
        try {
          it.foreach { case ((_, _, key), row) =>
            exts.zipWithIndex.foreach { case (ext, i) =>
              if (!row.isNullAt(3 + i)) {
                val payload = row.getAs[Array[Byte]](3 + i)
                val name = s"$key.$ext"
                require(name.getBytes("UTF-8").length <= MaxName,
                  s"entry name too long for ustar (max $MaxName bytes): $name")
                out.write(tarHeader(name, payload.length))
                out.write(payload)
                val pad = (BlockSize - payload.length % BlockSize) % BlockSize
                if (pad > 0) out.write(new Array[Byte](pad))
              }
            }
          }
          out.write(new Array[Byte](2 * BlockSize)) // end of archive
        } finally out.close()
        fs.delete(finalPath, false)
        if (!fs.rename(tmpPath, finalPath))
          throw new java.io.IOException(s"could not publish $finalPath")
      }
  }

  /** Read tar shards back as (shard INT, key STRING, ext STRING,
    * payload BINARY) — the long form; pivot by ext downstream if a
    * columnar sample view is wanted. One task per shard, streaming.
    */
  def readShards(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ShardName = "shard-(\\d+)\\.tar".r
    val shards = fs.listStatus(new Path(path)).toSeq
      .collect { case st if st.isFile =>
        st.getPath.getName match {
          // keep the FULL URI: executors resolve the path against its
          // own filesystem, not the default one
          case ShardName(n) => Some((n.toInt, st.getPath.toString))
          case _ => None
        }
      }.flatten.sortBy(_._1)
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(shards, math.max(1, shards.size))
      .flatMap { case (shard, p) =>
        val dfs = new Path(p).getFileSystem(conf.value)
        val in = dfs.open(new Path(p))
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        // close at task completion even when the iterator is not
        // fully drained (limit(), early exceptions) — a leaked handle
        // per partial read would exhaust object-store pools
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          private var nextEntry: Option[(String, Array[Byte])] = None
          private var done = false
          @annotation.tailrec
          private def advance(): Unit = {
            val header = new Array[Byte](BlockSize)
            var read = 0
            while (read < BlockSize) {
              val n = in.read(header, read, BlockSize - read)
              if (n < 0) { done = true; closeOnce(); return }
              read += n
            }
            if (header.forall(_ == 0)) { done = true; closeOnce(); return }
            val nameLen = header.indexOf(0.toByte) match {
              case -1 => MaxName
              case i => math.min(i, MaxName)
            }
            val name = new String(header, 0, nameLen, "UTF-8")
            val size = java.lang.Long.parseLong(
              new String(header, 124, 12, "US-ASCII").trim.stripSuffix("\u0000").trim, 8)
            require(size >= 0 && size <= Int.MaxValue, s"bad tar entry size $size in $p")
            val payload = new Array[Byte](size.toInt)
            var got = 0
            while (got < size) {
              val n = in.read(payload, got, size.toInt - got)
              require(n >= 0, s"truncated tar entry $name in $p")
              got += n
            }
            val pad = (BlockSize - size % BlockSize) % BlockSize
            var skipped = 0L
            while (skipped < pad) {
              val n = in.skip(pad - skipped)
              require(n > 0, s"truncated tar padding after $name in $p")
              skipped += n
            }
            // only REGULAR-file entries are samples. Foreign shards
            // carry PAX headers (typeflag g/x), GNU long names (L/K),
            // directory entries ('5', or old-format trailing-slash
            // names) — their payload blocks are consumed above, then
            // the entry is dropped, not parsed as a sample
            val typeflag = header(156)
            val regular = typeflag == '0'.toByte || typeflag == 0.toByte
            if (regular && !name.endsWith("/")) nextEntry = Some((name, payload))
            else advance()
          }
          override def hasNext: Boolean = {
            if (nextEntry.isEmpty && !done) advance()
            nextEntry.nonEmpty
          }
          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException
            val (name, payload) = nextEntry.get
            nextEntry = None
            val dot = name.lastIndexOf('.')
            require(dot > 0, s"tar entry without extension: $name in $p")
            Row(shard, name.substring(0, dot), name.substring(dot + 1), payload)
          }
        }
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("ext", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType, nullable = false))))
  }

  /** POSIX ustar header: fixed mode/uid/gid, mtime 0 — deterministic
    * bytes for deterministic shard checksums.
    */
  private[sinks] def tarHeader(name: String, size: Int): Array[Byte] = {
    val h = new Array[Byte](BlockSize)
    def put(offset: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, offset, b.length)
    }
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.length <= MaxName, s"name too long: $name")
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    put(100, "0000644\u0000")          // mode
    put(108, "0000000\u0000")          // uid
    put(116, "0000000\u0000")          // gid
    put(124, f"$size%011o" + "\u0000") // size
    put(136, "00000000000\u0000")      // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                        // typeflag: regular file
    put(257, "ustar\u0000")             // magic
    put(263, "00")                      // version
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o" + "\u0000 ")
    h
  }
}
