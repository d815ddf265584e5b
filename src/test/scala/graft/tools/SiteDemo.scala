package graft.tools

import graft.catalog.{Catalog, MapDatabase}
import graft.export.StaticSite
import graft.tables.{ParquetTable, Partition, PartitioningScheme}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StringType

/** Dev tool: generate a demo static catalog site from the sf0.001
  * testdata (usage: runMain graft.tools.SiteDemo [outDir]) so the
  * embedded renderer can be driven in a real browser.
  */
object SiteDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_site")
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions.col
    // a hive-partitioned copy of documents exercises the partition-
    // derived example filters in the usage snippet
    val parts = s"$out-data/docs_by_source"
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("source").parquet(parts)

    val tables = Map(
      "documents" -> new ParquetTable("documents", s"$sf/documents.parquet",
        partitioning = Seq.empty, description = "raw documents"),
      "docs_by_source" -> new ParquetTable("docs_by_source", parts,
        partitioning = Seq(Partition("source", StringType)),
        partitioningScheme = PartitioningScheme.Hive,
        description = "documents partitioned by source",
        // docs filters provide the example partition values the site's
        // usage snippet renders (reference get_schema behavior)
        docsFilters = Seq(graft.core.Filter("source", "=", "src0"))),
      "lineitem" -> new ParquetTable("lineitem", s"$sf/lineitem.parquet",
        partitioning = Seq.empty, description = "TPC-H-ish fact table"))
    val cat = new Catalog(Map("analytics" -> new MapDatabase(tables)),
      packageName = Some("graft_demo"))
    val index = StaticSite.generate(Seq("main" -> cat), out, spark)
    println(s"site at $index")
    spark.stop()
  }
}
