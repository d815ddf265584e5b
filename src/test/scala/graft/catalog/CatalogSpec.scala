package graft.catalog

import graft.SparkSpec
import graft.core.TableMetadata
import graft.tables.{FunctionTable, ReadArgs}
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(v: Int, deprecated: Boolean = false) =
    new FunctionTable(
      TableMetadata("FUNCTION", s"table $v", isDeprecated = deprecated),
      (s, args) => {
        val base = Seq((v, args.extra.getOrElse("tag", "none").toString)).toDF("v", "tag")
        args.columns.fold(base)(cs => base.select(cs.map(col): _*))
      })

  private def catalog = new Catalog(Map(
    "db1" -> new MapDatabase(Map(
      "t1" -> mkTable(1),
      "t2" -> mkTable(2),
      "old" -> mkTable(3, deprecated = true)))))

  test("db/table lookup and missing-key errors") {
    val c = catalog
    assert(c.dbs == Seq("db1"))
    assert(c.db("db1").table("t1", spark).select("v").as[Int].head() == 1)
    intercept[NoSuchElementException] { c.db("nope") }
    intercept[NoSuchElementException] { c.db("db1").table("nope", spark) }
  }

  test("deprecated tables hidden unless requested (reference semantics)") {
    val db = catalog.db("db1")
    assert(db.tables() == Seq("t1", "t2"))
    assert(db.tables(showDeprecated = true) == Seq("old", "t1", "t2"))
    // but still callable directly
    assert(db.table("old", spark).select("v").as[Int].head() == 3)
  }

  test("global args flow into every table call") {
    val c = catalog
    c.setGlobalArgs(Map("tag" -> "global"))
    val df = c.db("db1").table("t1", spark)
    assert(df.select("tag").as[String].head() == "global")
    // per-call args win over globals
    val df2 = c.db("db1").table("t1", spark, ReadArgs(extra = Map("tag" -> "local")))
    assert(df2.select("tag").as[String].head() == "local")
  }

  test("ReflectionDatabase discovers table members like ModuleDatabase") {
    object MyTables {
      val live: graft.tables.TableProtocol = mkTable(10)
      def computed: graft.tables.TableProtocol = mkTable(20)
      val retired: graft.tables.TableProtocol = mkTable(30, deprecated = true)
      def notATable: Int = 42
    }
    val db = new ReflectionDatabase(MyTables)
    assert(db.tables() == Seq("computed", "live"))
    assert(db.tables(showDeprecated = true) == Seq("computed", "live", "retired"))
    assert(db.table("live", spark).select("v").as[Int].head() == 10)
    intercept[NoSuchElementException] { db.table("notATable", spark) }
  }

  test("registerAllViews exposes the catalog through spark.sql") {
    catalog.registerAllViews(spark)
    assert(spark.sql("SELECT v FROM db1_t2").as[Int].head() == 2)
    assert(spark.sql("SELECT v FROM db1_old").as[Int].head() == 3)
  }

  test("function table schema introspection") {
    val ts = mkTable(7).getSchema(spark)
    assert(ts.columns.map(_.column) == Seq("v", "tag"))
  }

  test("WarehouseResolver: names resolve through the seam into native reads") {
    import graft.tables.{DeltaWrite, HudiWrite, IcebergWrite}
    val wh = tempDir("cat-wh").toString
    DeltaWrite.append(spark, Seq((1L, "d")).toDF("id", "v"), s"$wh/sales/orders")
    IcebergWrite.append(spark, Seq((2L, "i")).toDF("id", "v"), s"$wh/sales/events")
    HudiWrite.bulkInsert(spark, Seq((3L, "h")).toDF("id", "v"),
      s"$wh/ops/logs", "id")
    val db = MetadataResolver.database(
      new WarehouseResolver(wh, spark.sparkContext.hadoopConfiguration))
    assert(db.tables() == Seq("ops.logs", "sales.events", "sales.orders"))
    // each name reads through its format's native reader
    assert(db.table("sales.events", spark).select("id", "v")
      .as[(Long, String)].head() == ((2L, "i")))
    assert(db.table("sales.orders", spark).select("v").as[String].head() == "d")
    assert(db.table("ops.logs", spark).select("v").as[String].head() == "h")
    // the resolver database composes into a Catalog like any other
    val cat = new Catalog(Map("wh" -> db))
    assert(cat.db("wh").tables().size == 3)
    // unknown names miss cleanly
    intercept[NoSuchElementException] { db.table("sales.nope", spark) }
  }

  test("REST-shaped resolver: pinned metadata-location reads a foreign-named Iceberg table") {
    import graft.tables.{IcebergTable, IcebergWrite, ReadArgs}
    import org.apache.hadoop.fs.Path
    val root = tempDir("cat-rest").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    // forge the foreign deployment shape: UUID-named metadata file,
    // no version-hint — graft's filesystem discovery cannot see it
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val cur = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json")).maxBy(_.getName)
    val foreign = new Path(metaDir, "00001-6f4f9c3e-ab.metadata.json")
    assert(fs.rename(cur, foreign))
    fs.listStatus(metaDir).map(_.getPath)
      .filter(p => p.getName.matches("v\\d+\\.metadata\\.json") ||
        p.getName == "version-hint.text")
      .foreach(p => fs.delete(p, false))
    intercept[Exception] {
      new IcebergTable("t", root)(spark, ReadArgs.empty).collect()
    }
    // the REST catalog contract in miniature: LoadTableResponse's
    // metadata-location, served from an in-memory map
    val rest = new MetadataResolver {
      private val tables = Map(
        "prod.t" -> MetadataResolver.Resolved(
          root, Some("iceberg"), Some(foreign.toString)))
      override def list(): Seq[String] = tables.keys.toSeq.sorted
      override def resolve(name: String) = tables.get(name)
    }
    val db = MetadataResolver.database(
      rest, spark.sparkContext.hadoopConfiguration)
    val got = db.table("prod.t", spark).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
