package graft.export

import graft.catalog.{Catalog, Database}
import graft.tables.{LakehouseTable, TableProtocol}
import org.apache.spark.sql.SparkSession
import Json._

/** Web-catalog export — re-expression of export/web.py: serializes
  * catalogs → databases → tables (schema, partitions, docs metadata)
  * into the `data.json` consumed by the reference's static catalog
  * site.
  */
object WebExport {

  def exportTable(name: String, table: TableProtocol, spark: SparkSession): JObj = {
    val meta = table.tableMetadata
    val schema = table.getSchema(spark)
    JObj(Seq(
      "name" -> str(name),
      "description" -> str(meta.description),
      "partitions" -> JArr(schema.partitions.map(p => JObj(Seq(
        "column_name" -> str(p.columnName),
        "type_annotation" -> str(p.typeAnnotation),
        "value" -> (p.value match {
          case null       => JNull
          case n: Int     => JNum(n)
          case n: Long    => JNum(n)
          case d: Double  => JDouble(d)
          case b: Boolean => JBool(b)
          case other      => str(other.toString)
        }))))),
      "columns" -> JArr(schema.columns.map(c => JObj(Seq(
        "column" -> str(c.column),
        "type" -> str(c.dataType),
        "readonly" -> JBool(c.readonly),
        "filter_only" -> JBool(c.filterOnly),
        "has_stats" -> JBool(c.hasStats))))),
      "selected_columns" -> meta.docsColumns
        .map(cs => JArr(cs.map(str))).getOrElse(JNull),
      "supports_sql_filter" -> JBool(table.isInstanceOf[LakehouseTable]),
      "table_type" -> str(meta.tableType),
      "latency_info" -> opt(meta.latencyInfo),
      "example_notebook" -> opt(meta.exampleNotebook),
      "data_input" -> opt(meta.dataInput)))
  }

  def exportDatabase(name: String, db: Database, spark: SparkSession): JObj =
    JObj(Seq(
      "name" -> str(name),
      "tables" -> JArr(db.getTables().toSeq.sortBy(_._1).map {
        case (k, t) => exportTable(k, t, spark)
      })))

  def exportCatalog(name: String, catalog: Catalog, spark: SparkSession): JObj =
    JObj(Seq(
      "name" -> str(name),
      "package_name" -> opt(catalog.packageName),
      "metadata" -> JObj(Seq("jupyterhub_url" -> opt(catalog.metadata.jupyterhubUrl))),
      "databases" -> JArr(catalog.dbs.map(db => exportCatalog0(db, catalog, spark)))))

  private def exportCatalog0(dbName: String, catalog: Catalog, spark: SparkSession): JObj =
    exportDatabase(dbName, catalog.db(dbName), spark)

  /** Top-level data.json payload (web.py:export_datarepo). */
  def exportDatarepo(catalogs: Seq[(String, Catalog)], spark: SparkSession): JObj =
    JObj(Seq("catalogs" -> JArr(catalogs.map { case (n, c) => exportCatalog(n, c, spark) })))

  /** Write data.json for the static site (web.py:export_and_generate_site,
    * minus copying the precompiled JS bundle).
    */
  def writeDataJson(catalogs: Seq[(String, Catalog)], outputDir: String,
                    spark: SparkSession): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(outputDir)
    java.nio.file.Files.createDirectories(dir)
    val out = dir.resolve("data.json")
    java.nio.file.Files.writeString(out, exportDatarepo(catalogs, spark).render)
    out
  }
}
