package graft.catalog

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress

/** r15: the LIVE Iceberg REST catalog client, driven end to end
  * against an in-process HTTP server speaking the public protocol —
  * config prefix routing, paged namespace/table enumeration, nested
  * namespaces, pluggable auth headers, and a LoadTableResponse whose
  * UUID-named metadata-location pins a table graft's filesystem
  * discovery cannot see.
  */
class RestCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** A real Iceberg table re-shaped like a foreign REST-managed
    * deployment: UUID metadata name, no version-hint. Returns
    * (table root, metadata-location).
    */
  private def foreignIceberg(): (String, String) = {
    import graft.tables.IcebergWrite
    import org.apache.hadoop.fs.Path
    val root = tempDir("rest-ice").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val cur = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json")).maxBy(_.getName)
    val foreign = new Path(metaDir, "00001-9c81a2f0-rest.metadata.json")
    assert(fs.rename(cur, foreign))
    fs.listStatus(metaDir).map(_.getPath)
      .filter(p => p.getName.matches("v\\d+\\.metadata\\.json") ||
        p.getName == "version-hint.text")
      .foreach(p => fs.delete(p, false))
    (root, foreign.toString)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  test("live REST catalog: config prefix, paged listing, nested namespaces, auth") {
    val (root, metadataLoc) = foreignIceberg()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // the server sees DECODED paths: %1F arrives as the raw separator
    val US = "\u001f"
    val loadBody =
      s"""{"metadata-location":"$metadataLoc",
         |"metadata":{"location":"$root","format-version":2}}""".stripMargin
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      val query = Option(x.getRequestURI.getQuery).getOrElse("")
      // pluggable auth: every call must carry the bearer header
      if (x.getRequestHeaders.getFirst("Authorization") != "Bearer tok")
        respond(x, 401, """{"error":{"message":"unauthorized"}}""")
      else path match {
        case "/v1/config" =>
          respond(x, 200, """{"overrides":{"prefix":"tenant1"},"defaults":{}}""")
        case "/v1/tenant1/namespaces" if query == "parent=prod" =>
          respond(x, 200, """{"namespaces":[["prod","sub"]]}""")
        case "/v1/tenant1/namespaces" if query.contains("parent=") =>
          respond(x, 200, """{"namespaces":[]}""")
        case "/v1/tenant1/namespaces" if query.contains("pageToken=p2") =>
          respond(x, 200, """{"namespaces":[["ops"]]}""")
        case "/v1/tenant1/namespaces" =>
          respond(x, 200,
            """{"namespaces":[["prod"]],"next-page-token":"p2"}""")
        case "/v1/tenant1/namespaces/prod/tables" =>
          respond(x, 200,
            """{"identifiers":[{"namespace":["prod"],"name":"t"}]}""")
        case p if p == s"/v1/tenant1/namespaces/prod${US}sub/tables" =>
          respond(x, 200,
            """{"identifiers":[{"namespace":["prod","sub"],"name":"t2"}]}""")
        case "/v1/tenant1/namespaces/ops/tables" =>
          respond(x, 200, """{"identifiers":[]}""")
        case "/v1/tenant1/namespaces/prod/tables/t" =>
          respond(x, 200, loadBody)
        case p if p == s"/v1/tenant1/namespaces/prod${US}sub/tables/t2" =>
          respond(x, 200, loadBody)
        case _ => respond(x, 404, """{"error":{"message":"not found"}}""")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val rest = new RestCatalogResolver(base,
        headers = Map("Authorization" -> "Bearer tok"))
      // enumeration crosses pages and nested namespaces
      assert(rest.list() == Seq("prod.sub.t2", "prod.t"))
      // point lookup returns the pinned metadata-location + table root
      val r = rest.resolve("prod.t").get
      assert(r.location == root && r.metadataLocation.contains(metadataLoc))
      assert(rest.resolve("prod.nope").isEmpty)
      assert(rest.resolve("bare").isEmpty)
      // the resolution reads end to end through the catalog Database
      val db = MetadataResolver.database(
        rest, spark.sparkContext.hadoopConfiguration)
      val got = db.table("prod.t", spark).select("id", "v")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "b")))
      // multi-level namespace spells a.b.table and resolves too
      assert(db.table("prod.sub.t2", spark).count() == 2)
      // missing/denied auth fails LOUDLY with the HTTP status named
      val noAuth = intercept[IllegalArgumentException](
        new RestCatalogResolver(base))
      assert(noAuth.getMessage.contains("401"), noAuth.getMessage)
    } finally server.stop(0)
  }

  test("live REST catalog: no config endpoint and derived table root still work") {
    val (root, metadataLoc) = foreignIceberg()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      x.getRequestURI.getPath match {
        // no /v1/config (404 → no prefix); LoadTableResponse carries
        // ONLY metadata-location — the root derives from its path
        case "/v1/namespaces/db/tables/t" =>
          respond(x, 200, s"""{"metadata-location":"$metadataLoc"}""")
        case _ => respond(x, 404, "{}")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val rest = new RestCatalogResolver(base)
      val r = rest.resolve("db.t").get
      assert(r.location == root, r.location)
      val db = MetadataResolver.database(
        rest, spark.sparkContext.hadoopConfiguration)
      assert(db.table("db.t", spark).count() == 2)
    } finally server.stop(0)
  }

  test("warehouse resolver: listings sniff each table once (cached)") {
    import graft.tables.DeltaWrite
    val wh = tempDir("wh-cache").toString
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), s"$wh/sales/orders")
    val resolver = new WarehouseResolver(wh,
      spark.sparkContext.hadoopConfiguration)
    assert(resolver.list() == Seq("sales.orders"))
    // repeated enumeration and point lookups answer from the cache —
    // pin it indirectly: resolve() of a cached table never touches the
    // filesystem, so it still answers after the directory vanishes
    assert(resolver.resolve("sales.orders").isDefined)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$wh/sales/orders"), true)
    assert(resolver.resolve("sales.orders").isDefined,
      "positive sniffs must be cached (deletion surfaces at read time)")
    // a FRESH resolver sees the truth
    assert(new WarehouseResolver(wh,
      spark.sparkContext.hadoopConfiguration).resolve("sales.orders").isEmpty)
  }
}
