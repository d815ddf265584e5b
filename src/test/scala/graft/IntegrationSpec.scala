package graft

import graft.catalog.{Catalog, CatalogMetadata, MapDatabase}
import graft.core.Filter
import graft.export.{RoapiExport, WebExport}
import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The switch-over story from the reference, end to end: declare a
  * catalog of heterogeneous tables, read through the filter algebra,
  * query it in SQL, and export it — the full datarepo usage surface
  * in one flow.
  */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("a datarepo-style catalog works end-to-end on Spark") {
    // -- declare tables the way the reference's database modules do --
    val base = tempDir("integration").toString
    Seq((5956, "2024-03-24", 1.5), (5956, "2024-03-25", 2.5), (6001, "2024-03-24", 9.0))
      .toDF("implant_id", "date", "reading")
      .write.partitionBy("implant_id", "date").mode("overwrite").parquet(s"$base/spikes")

    val spikes = new ParquetTable("spikes", s"$base/spikes",
      partitioning = Seq(Partition("implant_id", IntegerType), Partition("date", StringType)),
      partitioningScheme = PartitioningScheme.Hive,
      description = "binned spikes",
      docsFilters = Seq(Filter("implant_id", "=", 5956), Filter("date", "=", "2024-03-24")),
      parquetFileName = "df.parquet")

    Seq((1L, "s1"), (1L, "s1"), (2L, "s2")).toDF("session_id", "tag")
      .write.mode("overwrite").parquet(s"$base/sessions")
    val sessions = new LakehouseTable("sessions", s"$base/sessions",
      StructType(Seq(StructField("session_id", LongType), StructField("tag", StringType),
        StructField("missing_col", StringType))),
      uniqueColumns = Some(Seq("session_id")))

    val derived = FunctionTable.table(description = "function table") { (s, args) =>
      val df = Seq((1, "fn")).toDF("n", "src")
      args.columns.fold(df)(cs => df.select(cs.map(col): _*))
    }

    val catalog = new Catalog(
      Map("lab" -> new MapDatabase(Map(
        "spikes" -> spikes, "sessions" -> sessions, "derived" -> derived))),
      packageName = Some("graft_lab"),
      metadata = CatalogMetadata(jupyterhubUrl = Some("https://hub.example")))

    // -- dataframe reads through the filter algebra --
    val day = catalog.db("lab").table("spikes", spark,
      ReadArgs.where(Filter("implant_id", "=", 5956), Filter("date", "=", "2024-03-24")))
    assert(day.select("reading").as[Double].collect().toSeq == Seq(1.5))

    // -- lakehouse semantics: dedup + schema normalization --
    val ses = catalog.db("lab").table("sessions", spark)
    assert(ses.count() == 2)
    assert(ses.columns.contains("missing_col"))

    // -- whole-catalog SQL --
    catalog.registerAllViews(spark)
    assert(spark.sql(
      "SELECT count(*) FROM lab_spikes WHERE implant_id = 5956").as[Long].head() == 2)

    // -- exports: roapi config + web catalog json --
    val roapi = RoapiExport.exportToRoapiTables(catalog)
    assert(roapi.exists(_.render.contains("lab_spikes")))
    val site = WebExport.exportCatalog("main", catalog, spark).render
    assert(site.contains("binned spikes") && site.contains("graft_lab"))
  }

  test("a modern Delta table (DVs, checkpoints) plugs into the catalog flow") {
    import graft.core.Filters
    val base = tempDir("integration-delta").toString
    val path = s"$base/readings"
    DeltaWrite.append(spark,
      (1 to 40).map(i => (i.toLong, i * 1.5, s"sensor${i % 4}")).toDF("id", "value", "sensor"),
      path, partitionBy = Seq("sensor"))
    DeltaWrite.deleteWhereDv(spark, path,
      Filters.normalize(Seq(Filter("id", ">", 30L))))
    DeltaWrite.checkpoint(spark, path)

    val readings = new DeltaTable("readings", path, description = "sensor readings")
    val catalog = new Catalog(Map("iot" -> new MapDatabase(Map("readings" -> readings))))

    // filter-algebra read composes with partition pruning + the DV mask
    val one = catalog.db("iot").table("readings", spark,
      ReadArgs.where(Filter("sensor", "=", "sensor1")))
    assert(one.select("id").as[Long].collect().sorted.toSeq ==
      (1 to 30).filter(_ % 4 == 1).map(_.toLong))

    // catalog-wide SQL sees the DV-masked state
    catalog.registerAllViews(spark)
    assert(spark.sql("SELECT count(*) FROM iot_readings").as[Long].head() == 30)

    // schema introspection / export treats it like any other table
    val json = WebExport.exportCatalog("main", catalog, spark).render
    assert(json.contains("sensor readings") && json.contains("\"table_type\":\"DELTA_LAKE\""))
  }
}
