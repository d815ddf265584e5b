package graft.queries

import graft.core.{Filter, Filters}
import graft.tables.{DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 query additions: Delta-format reads (log replay, file
  * skipping, time travel) proven against DuckDB oracles over the
  * source parquet.
  */
object Wave3Queries {

  private def t(s: SparkSession, dir: String, name: String) = Tables.table(s, dir, name)

  /** One delta table per (JVM, sf dir): nation appended partitioned by
    * n_regionkey, then region 0 deleted at the format level (file
    * rewrite + remove/add commit). Both delta queries read this build,
    * so Verify builds it once.
    */
  private val builtTables = scala.collection.concurrent.TrieMap.empty[String, String]

  private def nationDelta(s: SparkSession, dir: String): String =
    builtTables.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_delta_nation").toString + "/nation"
      val nation = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      DeltaWrite.append(s, nation, path, partitionBy = Seq("n_regionkey"))
      DeltaWrite.deleteWhere(s, path, Filters.normalize(Seq(Filter("n_regionkey", "=", 0))))
      path
    })

  /** Delta read after a format-level DELETE: replay add/remove, prune
    * partitions (n_regionkey) and skip files on stats (n_nationkey).
    */
  def qDeltaRead(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("nation_delta", nationDelta(s, dir))
    table(s, ReadArgs(
      filters = Filters.normalize(Seq(Filter("n_nationkey", ">=", 5))),
      columns = Some(Seq("n_nationkey", "n_name", "n_regionkey"))))
      .orderBy("n_nationkey")
  }

  /** Time travel: version 0 predates the DELETE and sees full nation. */
  def qDeltaTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val table = new DeltaTable("nation_delta", nationDelta(s, dir))
    table(s, ReadArgs(
      columns = Some(Seq("n_nationkey", "n_name", "n_regionkey")),
      extra = Map(table.VersionKey -> 0L)))
      .orderBy("n_nationkey")
  }
}
