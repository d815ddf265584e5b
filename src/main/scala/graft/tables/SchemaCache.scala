package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Footer-inferred parquet schemas per (session, path) — SCHEMA
  * metadata only, never data or results.
  *
  * `spark.read.parquet(path)` re-lists and re-reads a footer on every
  * call (one Spark job per table per query construction — 30-50 ms of
  * driver fixed cost each at bench scale, guide §7.3). Real catalogs
  * (HMS/Glue, Spark's own filesource relation cache) hold exactly
  * this; every query still reads all parquet DATA per run.
  *
  * Keyed by `spark.sessionUUID` (globally unique — identity hash codes
  * can collide across live sessions) because schema-affecting session
  * confs (nanosAsLong, timestamp inference) can differ across
  * sessions. LRU-bounded so ephemeral temp-table paths evict the
  * oldest entry instead of silently disabling caching once full.
  *
  * INVALIDATION: an in-session rewrite of a cached path (Delta/Hudi/
  * Iceberg writers support additive schema evolution) would otherwise
  * serve the stale pre-evolution footer schema for the rest of the
  * session — the write paths call [[invalidate]] with the table root,
  * which purges every entry (any session) whose path overlaps the
  * written location in either direction.
  */
object SchemaCache {
  private val MaxEntries = 256
  private val cache =
    new java.util.LinkedHashMap[(String, String), StructType](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), StructType]): Boolean =
        size() > MaxEntries
    }

  /** Collision-proof per-session id: identity hash codes can collide
    * across live sessions (two sessions with different schema-affecting
    * confs must never share entries). Weak keys let dead sessions be
    * collected; their orphaned cache entries age out of the LRU bound.
    */
  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  private[graft] def sessionId(spark: SparkSession): String = synchronized {
    var id = sessionIds.get(spark)
    if (id == null) {
      id = java.util.UUID.randomUUID().toString
      sessionIds.put(spark, id)
    }
    id
  }

  /** Read `path` as parquet, inferring the schema at most once per
    * (session, path). Inference failures propagate unchanged.
    */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val key = (sessionId(spark), path)
    val cached = synchronized(cache.get(key))
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val d = spark.read.parquet(path)
      synchronized(cache.put(key, d.schema))
      d
    }
  }

  /** Test introspection: the cached schema for (session, path), if
    * any — never triggers inference.
    */
  private[graft] def cachedSchema(
      spark: SparkSession, path: String): Option[StructType] =
    synchronized(Option(cache.get((sessionId(spark), path))))

  /** Drop every cached schema (for any session) whose path is `path`,
    * contains it, or sits under it. Called by the write paths
    * (DeltaWrite / HudiWrite / IcebergWrite commits) so a rewritten or
    * schema-evolved location is re-inferred on next read.
    */
  def invalidate(path: String): Unit = {
    val p = path.stripSuffix("/")
    def overlaps(cachedPath: String): Boolean = {
      val c = cachedPath.stripSuffix("/")
      c == p || c.startsWith(p + "/") || p.startsWith(c + "/")
    }
    synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (overlaps(it.next()._2)) it.remove()
    }
  }
}
