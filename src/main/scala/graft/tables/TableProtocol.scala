package graft.tables

import graft.core.{Filter, Filters, TableMetadata, TableSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arguments accepted by every table read, the Spark analog of the
  * reference's `__call__(filters=..., columns=...)` convention
  * (datarepo/core/tables/metadata.py:TableProtocol).
  */
final case class ReadArgs(
    filters: Filters.Normalized = Seq.empty,
    columns: Option[Seq[String]] = None,
    extra: Map[String, Any] = Map.empty
) {
  def withGlobal(global: Map[String, Any]): ReadArgs =
    copy(extra = global ++ extra)
}

object ReadArgs {
  val empty: ReadArgs = ReadArgs()
  /** Flat conjunction convenience. */
  def where(fs: Filter*): ReadArgs = ReadArgs(filters = Filters.normalize(fs))
  def dnf(fss: Seq[Seq[Filter]]): ReadArgs = ReadArgs(filters = Filters.normalizeDnf(fss))
}

/** A catalog table: lazily produces a DataFrame for given read args.
  * Plans stay declarative so Catalyst can push filters/projections
  * into the source scan.
  */
trait TableProtocol {
  def tableMetadata: TableMetadata

  def apply(spark: SparkSession, args: ReadArgs = ReadArgs.empty): DataFrame

  /** Schema introspection used by catalog docs / export. */
  def getSchema(spark: SparkSession): TableSchema
}
