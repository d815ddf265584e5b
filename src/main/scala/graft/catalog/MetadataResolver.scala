package graft.catalog

import graft.tables.{DeltaTable, HudiTable, IcebergTable, TableProtocol}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** External-catalog seam: resolve a table NAME to its physical
  * metadata location. graft's own layout is path-addressed
  * (filesystem catalog: version-hint, `v<N>.metadata.json`), but real
  * lakehouse deployments mostly sit behind a metastore — Hive or an
  * Iceberg REST catalog — whose contract is exactly this interface:
  * `name → (table location, format, optional pinned metadata file)`.
  * Implementations:
  *
  *  - [[WarehouseResolver]]: `<warehouse>/<db>/<table>` directories,
  *    format sniffed from the layout — the filesystem metastore.
  *  - a REST-shaped double lives in CatalogSpec: an in-memory
  *    `name → {location, metadata-location}` map mimicking the REST
  *    catalog `LoadTableResponse`, pinning UUID-named metadata files
  *    graft's filesystem discovery cannot see (the
  *    [[IcebergTable.metadataLocation]] override).
  *
  * [[MetadataResolver.database]] lifts any resolver into the catalog
  * [[Database]] protocol, so resolved tables sit next to declared
  * ones in a [[Catalog]] and register as SQL views like any other.
  */
trait MetadataResolver {

  /** Names this resolver can enumerate (possibly empty for resolvers
    * that only answer point lookups).
    */
  def list(): Seq[String]

  /** `name` → resolution, None when unknown. */
  def resolve(name: String): Option[MetadataResolver.Resolved]
}

object MetadataResolver {

  /** One resolved table.
    *
    * @param location         table root path
    * @param format           "delta" | "iceberg" | "hudi"; None =
    *                         sniff the layout
    * @param metadataLocation Iceberg only: the exact metadata JSON to
    *                         read (REST catalogs return this), which
    *                         overrides filesystem discovery
    */
  final case class Resolved(
      location: String,
      format: Option[String] = None,
      metadataLocation: Option[String] = None)

  /** `_delta_log` → delta, `.hoodie` → hudi, a `metadata/` dir with
    * any `*.metadata.json` → iceberg (UUID-named foreign spellings
    * included — a pinned metadataLocation handles the read side).
    */
  def sniffFormat(location: String, conf: Configuration): Option[String] = {
    val p = new Path(location)
    val fs = p.getFileSystem(conf)
    if (fs.exists(new Path(p, "_delta_log"))) Some("delta")
    else if (fs.exists(new Path(p, ".hoodie"))) Some("hudi")
    else if (fs.exists(new Path(p, "metadata")) &&
      fs.listStatus(new Path(p, "metadata"))
        .exists(_.getPath.getName.endsWith(".metadata.json")))
      Some("iceberg")
    else None
  }

  /** A resolution → the native reader for its format. */
  def tableFor(
      name: String,
      r: Resolved,
      conf: Configuration = new Configuration()): TableProtocol =
    r.format.orElse(sniffFormat(r.location, conf)) match {
      case Some("delta")   => new DeltaTable(name, r.location)
      case Some("iceberg") =>
        new IcebergTable(name, r.location,
          metadataLocation = r.metadataLocation)
      case Some("hudi")    => new HudiTable(name, r.location)
      case Some(other) => throw new IllegalArgumentException(
        s"resolver returned unknown format '$other' for $name")
      case None => throw new IllegalArgumentException(
        s"cannot determine the table format of $name at ${r.location} — " +
          "no _delta_log, .hoodie or metadata/*.metadata.json layout")
    }

  /** Lift a resolver into the [[Database]] protocol (tables resolve
    * lazily per listing — a resolver over 10⁵ tables costs nothing
    * until a table is actually read).
    */
  def database(
      resolver: MetadataResolver,
      conf: Configuration = new Configuration()): Database =
    new Database {
      override def getTables(showDeprecated: Boolean): Map[String, TableProtocol] =
        resolver.list().flatMap(n =>
          resolver.resolve(n).map(r => n -> tableFor(n, r, conf))).toMap

      // POINT lookup: one resolve, never an enumeration — reading one
      // table of a 10⁵-table warehouse must not list (and format-sniff)
      // the other 99 999
      override def table(
          name: String,
          spark: org.apache.spark.sql.SparkSession,
          args: graft.tables.ReadArgs): org.apache.spark.sql.DataFrame =
        resolver.resolve(name) match {
          case Some(r) => tableFor(name, r, conf)(spark, args)
          case None => throw new NoSuchElementException(
            s"Table '$name' not found in database")
        }
    }
}

/** Filesystem metastore: `<warehouse>/<db>/<table>` directories, the
  * layout Hive-style warehouses use. Names are `db.table` (or bare
  * `table` for single-level warehouses).
  */
class WarehouseResolver(
    warehouse: String,
    conf: Configuration = new Configuration(),
    levels: Int = 2
) extends MetadataResolver {
  require(levels == 1 || levels == 2, s"1 or 2 path levels, got $levels")

  private def fs = new Path(warehouse).getFileSystem(conf)

  /** POSITIVE sniffs cache per path — a directory that IS a delta/
    * iceberg/hudi table never changes format, so repeated listings
    * (and getTables' re-resolution) cost one directory walk each, not
    * O(tables) filesystem sniffs per enumeration. Non-tables are NOT
    * cached (an empty directory can become a table later), and a
    * cached table that was deleted surfaces loudly at read time.
    */
  private val sniffed = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One cache-key spelling for both entry points: list() sees
    * fs-qualified paths (file:/wh/db/t), resolve() builds raw ones
    * (/wh/db/t) — qualify both or every resolve-after-list misses.
    */
  private def ck(p: Path): String = fs.makeQualified(p).toString

  private def sniff(p: Path): Option[String] =
    Option(sniffed.get(ck(p))).orElse {
      val f = MetadataResolver.sniffFormat(p.toString, conf)
      f.foreach(sniffed.put(ck(p), _))
      f
    }

  override def list(): Seq[String] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Seq.empty
    def dirs(p: Path): Seq[Path] =
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
        .filterNot(_.getName.startsWith("_"))
    // one walk; each directory sniffs at most once EVER (cache above)
    // instead of a resolve() round (exists probes + sniff) per name
    // per enumeration
    val found: Seq[(String, Path)] =
      if (levels == 1) dirs(root).map(d => d.getName -> d)
      else dirs(root).flatMap(db =>
        dirs(db).map(t => s"${db.getName}.${t.getName}" -> t))
    found.collect { case (n, p) if sniff(p).isDefined => n }.sorted
  }

  override def resolve(name: String): Option[MetadataResolver.Resolved] = {
    val rel = name.split('.')
    if (rel.length != levels) return None
    val p = rel.foldLeft(new Path(warehouse))(new Path(_, _))
    // cached positive: no filesystem round at all (deletion is the
    // read path's loud problem, not the resolver's)
    Option(sniffed.get(ck(p))) match {
      case Some(f) => Some(MetadataResolver.Resolved(p.toString, Some(f)))
      case None =>
        if (!fs.exists(p)) None
        else sniff(p).map(f => MetadataResolver.Resolved(p.toString, Some(f)))
    }
  }
}
