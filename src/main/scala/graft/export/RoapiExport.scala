package graft.export

import graft.catalog.Catalog
import graft.core.RoapiOptions
import graft.tables.{LakehouseTable, ParquetTable, PartitioningScheme, SqlTable, TableProtocol}
import Json._

/** ROAPI config generation — re-expression of export/roapi.py:
  * emits the `tables:` entries for a read-only-API server in front of
  * the lake. Parquet tables must be hive-partitioned (so the server
  * can infer partitions); partition column types come from the docs
  * filters; a fully-pinned file fragment is handed over for schema
  * inference. Lakehouse tables export as `delta`, SQL tables as
  * `clickhouse` via connector.
  */
object RoapiExport {

  def exportToRoapiTables(catalog: Catalog): Seq[JObj] =
    catalog.dbs.flatMap { dbName =>
      val db = catalog.db(dbName)
      db.getTables(showDeprecated = true).toSeq.sortBy(_._1).flatMap { case (tblName, table) =>
        val physName = table match {
          case p: ParquetTable   => p.name
          case l: LakehouseTable => l.name
          case s: SqlTable       => s.name
          case _                 => tblName
        }
        exportToRoapiTable(s"${dbName}_$physName", table)
      }
    }

  def exportToRoapiTable(name: String, table: TableProtocol): Option[JObj] = table match {
    case p: ParquetTable   => exportParquet(name, p)
    case l: LakehouseTable => exportLakehouse(name, l)
    case s: SqlTable       => exportSql(name, s)
    case _                 => None
  }

  private def opts(t: TableProtocol): RoapiOptions =
    t.tableMetadata.roapiOpts.getOrElse(RoapiOptions())

  private def exportParquet(name: String, table: ParquetTable): Option[JObj] = {
    val o = opts(table)
    if (o.disable) return None
    if (table.partitioningScheme != PartitioningScheme.Hive) return None

    val filters = table.tableMetadata.docsFilters
    val base = Seq(
      "name" -> str(o.overrideName.getOrElse(name)),
      "uri" -> str(table.uri),
      "option" -> JObj(Seq(
        "format" -> str("parquet"),
        "use_memory_table" -> JBool(o.useMemoryTable))))

    val cfg =
      if (filters.isEmpty) JObj(base)
      else {
        val partitionCols = JArr(filters.map { f =>
          val dt =
            if (f.column == "date") "Date32" // YYYY-MM-DD partition -> Date32
            else valueTypeToRoapi(f.value)
          JObj(Seq("name" -> str(f.column), "data_type" -> str(dt)))
        })
        JObj(base ++ Seq(
          "partition_columns" -> partitionCols,
          "schema_from_files" -> JArr(Seq(str(table.buildFileFragment(filters))))))
      }
    Some(withReloadInterval(cfg, o))
  }

  private def exportLakehouse(name: String, table: LakehouseTable): Option[JObj] = {
    val o = table.tableMetadata.roapiOpts.getOrElse(
      RoapiOptions(reloadIntervalSeconds = Some(60))) // DeltaRoapiOptions default
    if (o.disable) return None
    Some(withReloadInterval(JObj(Seq(
      "name" -> str(o.overrideName.getOrElse(name)),
      "uri" -> str(table.uri),
      "option" -> JObj(Seq(
        "format" -> str("delta"),
        "use_memory_table" -> JBool(o.useMemoryTable))))), o))
  }

  private def exportSql(name: String, table: SqlTable): Option[JObj] = {
    val o = opts(table)
    if (o.disable) return None
    Some(withReloadInterval(JObj(Seq(
      "name" -> str(o.overrideName.getOrElse(name)),
      "uri" -> str(table.config.uri),
      "option" -> JObj(Seq(
        "format" -> str("clickhouse"),
        "use_memory_table" -> JBool(o.useMemoryTable),
        "table" -> str(table.name))))), o))
  }

  private def withReloadInterval(cfg: JObj, o: RoapiOptions): JObj =
    o.reloadIntervalSeconds.fold(cfg)(s =>
      JObj(cfg.fields :+ ("reload_interval" -> JObj(Seq(
        "secs" -> JNum(s), "nanos" -> JNum(0))))))

  def valueTypeToRoapi(value: Any): String = value match {
    case _: Int | _: Long | _: Short | _: Byte => "Int64"
    case _: String                             => "Utf8"
    case _: Boolean                            => "Boolean"
    case _: Double | _: Float                  => "Float64"
    case other =>
      throw new IllegalArgumentException(s"No roapi type mapping for $other")
  }
}
