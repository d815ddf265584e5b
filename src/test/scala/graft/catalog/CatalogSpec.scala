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
}
