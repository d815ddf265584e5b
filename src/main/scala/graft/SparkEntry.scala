package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracles

  /** Oracles whose SQL embeds values computed deterministically from
    * the data at `dir` (learned k-means centroids spliced as a literal
    * matrix); Verify merges these over [[oracleSql]].
    */
  def oracleSqlDynamic(spark: SparkSession, dir: String): Map[String, String] =
    graft.queries.OracleSql.dynamic(spark, dir)
      .view.filterKeys(queries.contains).toMap
}
