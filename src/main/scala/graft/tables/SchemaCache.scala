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
  * this; every query still reads all parquet DATA per run. Keyed by
  * session identity because schema-affecting session confs
  * (nanosAsLong, timestamp inference) can differ across sessions;
  * bounded so ephemeral temp-table paths in tests cannot grow it
  * without limit.
  */
object SchemaCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), StructType]()

  /** Read `path` as parquet, inferring the schema at most once per
    * (session, path). Inference failures propagate unchanged.
    */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val key = (System.identityHashCode(spark), path)
    val cached = cache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val d = spark.read.parquet(path)
      if (cache.size < 256) cache.put(key, d.schema)
      d
    }
  }
}
