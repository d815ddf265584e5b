package graft.queries

import graft.catalog.{Catalog, MapDatabase}
import graft.tables.{ParquetTable, ReadArgs, TableProtocol}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Test-corpus tables exposed through the graft catalog layer, so the
  * query inventory exercises the same Catalog → Database → Table path
  * a user of the reference would (catalog.db("tpch").table("lineitem")).
  */
object Tables {
  val TpchTables = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val PipelineTables = Seq("events", "documents", "embeddings")

  /** One Catalog per data dir, memoized: table METADATA (and the
    * ParquetTable instances' footer-schema cache) persists across
    * query constructions the way a real catalog's does — rebuilding it
    * per call re-paid a schema-inference Spark job per table per query
    * run (driver fixed cost, not data work).
    */
  private val catalogs =
    new java.util.concurrent.ConcurrentHashMap[String, Catalog]()

  def forDir(dir: String): Catalog =
    catalogs.computeIfAbsent(dir, d => {
      def pt(n: String): (String, TableProtocol) =
        n -> new ParquetTable(n, s"$d/$n.parquet", partitioning = Seq.empty)
      new Catalog(Map(
        "tpch"     -> new MapDatabase(TpchTables.map(pt).toMap),
        "pipeline" -> new MapDatabase(PipelineTables.map(pt).toMap)
      ))
    })

  def table(spark: SparkSession, dir: String, name: String,
            args: ReadArgs = ReadArgs.empty): DataFrame = {
    val dbName = if (TpchTables.contains(name)) "tpch" else "pipeline"
    val df = forDir(dir).db(dbName).table(name, spark, args)
    if (name == "events") normalizeEventTime(df) else df
  }

  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader only surfaces as a nanosecond long (via
    * spark.sql.legacy.parquet.nanosAsLong — set in Verify/Bench/test
    * sessions). The data is micro-aligned, so converting to a real
    * timestamp is lossless.
    */
  private def normalizeEventTime(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer div — a double division would lose precision at 1.7e18 ns
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
}

/** Cross-engine numeric conventions shared by every oracle-checked
  * query (see SURVEY.md §4): money math in DECIMAL(12,4) (exact,
  * order-independent sums), final outputs cast to double and rounded
  * to 4 decimals. `Sql` mirrors each helper for the DuckDB oracle.
  */
object Num {
  def d4(c: Column): Column = c.cast(DecimalType(12, 4))
  /** Exact decimal sum → double, rounded. */
  def dsum(c: Column): Column = round(sum(c).cast(DoubleType), 4)
  /** Stable mean: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column = round(sum(c).cast(DoubleType) / count(lit(1)), 4)

  object Sql {
    def d4(x: String): String = s"CAST($x AS DECIMAL(12,4))"
    def dsum(x: String): String = s"round(CAST(sum($x) AS DOUBLE), 4)"
    def davg(x: String): String = s"round(CAST(sum($x) AS DOUBLE) / count(*), 4)"
  }
}
