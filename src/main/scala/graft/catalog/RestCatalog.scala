package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Live client for the PUBLIC Iceberg REST catalog read protocol
  * (iceberg.apache.org rest-catalog-open-api): the [[MetadataResolver]]
  * a real metastore-backed deployment plugs in.
  *
  * Protocol (read side):
  *  - `GET /v1/config[?warehouse=…]` once at construction — the
  *    response's `overrides.prefix` / `defaults.prefix` joins the URL
  *    path of every later call (multi-tenant servers route on it),
  *  - `GET /v1/{prefix}/namespaces` (+ `parent=` for nesting, paged
  *    via `pageToken`) and `GET …/namespaces/{ns}/tables` enumerate,
  *  - `GET …/namespaces/{ns}/tables/{table}` returns
  *    `LoadTableResponse`: `metadata-location` (the exact — usually
  *    UUID-named — metadata JSON, which [[graft.tables.IcebergTable]]
  *    pins via its `metadataLocation` override) and the embedded
  *    `metadata.location` table root.
  *
  * Multi-level namespaces spell `a.b.table`; the URL encodes the
  * namespace levels joined by the unit separator (%1F), per the spec.
  * AUTH is header-pluggable: pass `Authorization -> "Bearer …"` (or
  * any header set) via `headers` — the OAuth token *acquisition*
  * dance is out of scope (deployments mint tokens out of band), the
  * transport of the result is not. Resolutions are point lookups —
  * no client-side caching, the server owns freshness.
  */
class RestCatalogResolver(
    baseUri: String,
    headers: Map[String, String] = Map.empty,
    warehouse: Option[String] = None,
    client: HttpClient = HttpClient.newHttpClient()
) extends MetadataResolver {

  private val mapper = new ObjectMapper()
  private val base = baseUri.stripSuffix("/")

  /** `tolerate404` distinguishes the two kinds of miss: a LOAD-TABLE
    * or CONFIG 404 is a legitimate not-found (→ null → None/no
    * prefix), but a 404 on an ENUMERATION route means the prefix or
    * base URL is wrong — reading that as an empty catalog would be
    * silent emptiness, so it throws with the URL named.
    */
  private def get(pathAndQuery: String, tolerate404: Boolean): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$pathAndQuery")).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404 && tolerate404) return null
    require(resp.statusCode() / 100 == 2,
      s"REST catalog GET $pathAndQuery failed: HTTP ${resp.statusCode()} ${resp.body()}")
    mapper.readTree(resp.body())
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** `overrides` win over `defaults` per the spec's config contract. */
  private val prefix: String = {
    val q = warehouse.map(w => s"?warehouse=${enc(w)}").getOrElse("")
    val cfg = get(s"/v1/config$q", tolerate404 = true)
    if (cfg == null) ""
    else {
      val p = Option(cfg.path("overrides").path("prefix").asText(null))
        .orElse(Option(cfg.path("defaults").path("prefix").asText(null)))
        .getOrElse("")
      // the prefix is a PATH FRAGMENT: servers may return
      // multi-segment values ("a/b") — encode per segment, keep '/'
      if (p.isEmpty) ""
      else "/" + p.split("/").map(enc).mkString("/")
    }
  }

  /** Namespace levels join with the UNIT SEPARATOR in the URL path
    * (the spec's multipart namespace encoding).
    */
  private def nsPath(ns: Seq[String]): String = enc(ns.mkString("\u001f"))

  private def paged(path: String, arrayField: String): Seq[JsonNode] = {
    val out = Seq.newBuilder[JsonNode]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = token.map(t => (if (path.contains("?")) "&" else "?") +
        s"pageToken=${enc(t)}").getOrElse("")
      val node = get(path + q, tolerate404 = false)
      graft.tables.IcebergMeta.elements(node.path(arrayField)).foreach(out += _)
      token = Option(node.path("next-page-token").asText(null)).filter(_.nonEmpty)
      more = token.isDefined
    }
    out.result()
  }

  private def namespaces(): Seq[Seq[String]] = {
    // visited-set guard: a server echoing a namespace under its own
    // parent (or any listing cycle) must not recurse forever
    val seen = scala.collection.mutable.Set.empty[Seq[String]]
    def children(parent: Option[Seq[String]]): Seq[Seq[String]] = {
      val q = parent.map(p => s"?parent=${nsPath(p)}").getOrElse("")
      val here = paged(s"/v1$prefix/namespaces$q", "namespaces")
        .map(n => graft.tables.IcebergMeta.elements(n).map(_.asText()).toSeq)
        .filter(seen.add)
      here ++ here.flatMap(ns => children(Some(ns)))
    }
    children(None)
  }

  override def list(): Seq[String] =
    namespaces().flatMap { ns =>
      paged(s"/v1$prefix/namespaces/${nsPath(ns)}/tables", "identifiers")
        .map(id => (ns :+ id.path("name").asText()).mkString("."))
    }.sorted

  override def resolve(name: String): Option[MetadataResolver.Resolved] = {
    val parts = name.split('.')
    if (parts.length < 2) return None
    val (ns, table) = (parts.init.toSeq, parts.last)
    val node = get(s"/v1$prefix/namespaces/${nsPath(ns)}/tables/${enc(table)}",
      tolerate404 = true)
    if (node == null) return None
    val metadataLocation = Option(node.path("metadata-location").asText(null))
    // table root: the embedded metadata's `location`, else derived
    // from the metadata file path (".../metadata/<file>" layout)
    val location = Option(node.path("metadata").path("location").asText(null))
      .orElse(metadataLocation.map { ml =>
        val i = ml.lastIndexOf("/metadata/")
        if (i > 0) ml.substring(0, i) else ml
      })
    location.map(loc => MetadataResolver.Resolved(
      loc, Some("iceberg"), metadataLocation))
  }
}
