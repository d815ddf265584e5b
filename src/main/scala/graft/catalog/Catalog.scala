package graft.catalog

import graft.tables.{ReadArgs, TableProtocol}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Database protocol: a named collection of tables
  * (datarepo/core/catalog/catalog.py:Database).
  */
trait Database {
  def getTables(showDeprecated: Boolean = false): Map[String, TableProtocol]

  def tables(showDeprecated: Boolean = false): Seq[String] =
    getTables(showDeprecated).keys.toSeq.sorted

  def table(name: String, spark: SparkSession, args: ReadArgs = ReadArgs.empty): DataFrame =
    getTables(showDeprecated = true)
      .getOrElse(name, throw new NoSuchElementException(s"Table '$name' not found in database"))
      .apply(spark, args)
}

/** In-memory database over a table map — the Scala analog of
  * ModuleDatabase (module attributes → map entries).
  */
class MapDatabase(all: Map[String, TableProtocol]) extends Database {
  override def getTables(showDeprecated: Boolean): Map[String, TableProtocol] =
    if (showDeprecated) all
    else all.filterNot(_._2.tableMetadata.isDeprecated)
}

/** Database discovered by reflection over an object's members — the
  * Scala analog of ModuleDatabase (catalog.py:ModuleDatabase), where a
  * Python module's attributes become the table namespace. Any no-arg
  * method (incl. `val`s) returning a TableProtocol on the container
  * object is a table.
  */
class ReflectionDatabase(container: AnyRef) extends Database {
  override def getTables(showDeprecated: Boolean): Map[String, TableProtocol] = {
    val all = container.getClass.getMethods.toSeq
      .filter(m => m.getParameterCount == 0 &&
        classOf[TableProtocol].isAssignableFrom(m.getReturnType))
      .map(m => m.getName -> m.invoke(container).asInstanceOf[TableProtocol])
      .toMap
    if (showDeprecated) all
    else all.filterNot(_._2.tableMetadata.isDeprecated)
  }
}

/** Wrapper applying global read args to every table call
  * (catalog.py:DatabaseWithGlobalArgs).
  */
class DatabaseWithGlobalArgs(db: Database, globalArgs: Map[String, Any]) extends Database {
  override def getTables(showDeprecated: Boolean): Map[String, TableProtocol] =
    db.getTables(showDeprecated)

  override def table(name: String, spark: SparkSession, args: ReadArgs): DataFrame =
    db.table(name, spark, args.withGlobal(globalArgs))
}

final case class CatalogMetadata(jupyterhubUrl: Option[String] = None)

/** Catalog of databases (catalog.py:Catalog). */
class Catalog(
    dbMap: Map[String, Database],
    val packageName: Option[String] = None,
    val metadata: CatalogMetadata = CatalogMetadata()
) {
  private var globalArgs: Option[Map[String, Any]] = None

  def setGlobalArgs(args: Map[String, Any]): Unit = globalArgs = Some(args)

  def db(name: String): Database = {
    val d = dbMap.getOrElse(
      name,
      throw new NoSuchElementException(
        s"Database '$name' not found. Available databases: ${dbs.mkString(", ")}"))
    globalArgs.fold(d)(g => new DatabaseWithGlobalArgs(d, g))
  }

  def dbs: Seq[String] = dbMap.keys.toSeq.sorted

  /** Register every table as a `<db>_<table>` temp view so the whole
    * catalog is queryable through `spark.sql` (the engine's SQL
    * front door; lazily planned, so unused views cost nothing).
    */
  def registerAllViews(spark: SparkSession): Unit =
    for {
      dbName <- dbs
      (tblName, _) <- db(dbName).getTables(showDeprecated = true)
    } db(dbName).table(tblName, spark).createOrReplaceTempView(s"${dbName}_$tblName")
}
