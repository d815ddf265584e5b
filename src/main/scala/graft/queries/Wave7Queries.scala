package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 additions: typed CHANGELOG reads for Iceberg and Hudi
  * (CDF parity — the triad-wide change-stream contract
  * IncrementalView dispatches over), each oracle-checked by replaying
  * the expected insert/delete rows relationally in DuckDB.
  */
object Wave7Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  // ---------- Iceberg typed changelog ----------

  private val icebergChangelog =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Three-snapshot native Iceberg nation table: append, then an
    * atomic equality UPSERT (suffixed names for keys < 8 + a
    * synthetic insert), then an equality DELETE of keys ≡ 2 (mod 5)
    * — the upsert+delete shape a tailing consumer must decode into
    * typed change rows.
    */
  private[queries] def writtenNationChangelog(s: SparkSession, dir: String): String =
    icebergChangelog.getOrElseUpdate(dir, {
      import graft.tables.IcebergWrite
      val path = java.nio.file.Files
        .createTempDirectory("graft_iceberg_chg").toString + "/nation"
      val nation = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      IcebergWrite.append(s, nation, path, Seq("n_regionkey"))
      val changes = nation.where(col("n_nationkey") < 8)
        .withColumn("n_name", concat(col("n_name"), lit("_UP")))
        .unionByName(s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(992, "mu", 3)),
          nation.schema))
      IcebergWrite.upsertEquality(s, changes, path, Seq("n_nationkey"))
      IcebergWrite.deleteEquality(s, path,
        nation.where(col("n_nationkey") % 5 === 2).select("n_nationkey"))
      path
    })

  /** Typed changelog across the upsert + delete commits: the upsert
    * surfaces as pre-image deletes + post-image inserts (ordinal 1),
    * the equality delete as post-upsert-state deletes (ordinal 2) —
    * the oracle replays both relationally. Snapshot ids and
    * timestamps are writer-dependent, so the gate pins the
    * deterministic ordinal instead.
    */
  def qIcebergChangelog(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{IcebergMeta, IcebergTable}
    import org.apache.hadoop.fs.Path
    val path = writtenNationChangelog(s, dir)
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    val snaps = IcebergMeta.load(fs, path).snapshots.sortBy(_.sequenceNumber)
    require(snaps.size == 3, s"expected 3 snapshots, found ${snaps.size}")
    new IcebergTable("nation_iceberg_chg", path)
      .changes(s, snaps.head.id, snaps.last.id)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col(IcebergTable.ChangeTypeCol),
        col(IcebergTable.ChangeOrdinalCol))
      .orderBy(col(IcebergTable.ChangeOrdinalCol),
        col(IcebergTable.ChangeTypeCol), col("n_nationkey"))
  }

  /** The same changelog served through the SQL front door (E53's
    * DESCRIBE CHANGES) under the UNIFORM cdc schema: `_commit_version`
    * is the snapshot SEQUENCE number — deterministic (1,2,3) for this
    * fixture's linear history, so the oracle pins it.
    */
  def qLakehouseChanges(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaChanges, LakehouseSql}
    val path = writtenNationChangelog(s, dir)
    LakehouseSql.exec(s, s"DESCRIBE CHANGES iceberg.`$path` AFTER 1")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col(DeltaChanges.ChangeTypeCol),
        col(DeltaChanges.CommitVersionCol))
      .orderBy(col(DeltaChanges.CommitVersionCol),
        col(DeltaChanges.ChangeTypeCol), col("n_nationkey"))
  }

  // ---------- Hudi typed changelog ----------

  private val hudiChangelog =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Three-commit native Hudi MOR nation table: bulk insert, a
    * log-file UPSERT (lowercased names for keys < 10 + a synthetic
    * insert), then tombstone DELETEs of keys ≡ 3 (mod 5) — the
    * merge-on-read change shapes a tailing consumer must decode.
    * Returns (path, bulk-insert instant).
    */
  private[queries] def writtenHudiChangelog(s: SparkSession, dir: String): (String, String) =
    hudiChangelog.getOrElseUpdate(dir, {
      import graft.tables.HudiWrite
      import s.implicits._
      val path = java.nio.file.Files
        .createTempDirectory("graft_hudi_chg").toString + "/nation"
      val nation = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val i1 = HudiWrite.bulkInsert(s, nation, path, "n_nationkey",
        Seq("n_regionkey"), tableType = "MERGE_ON_READ")
      val changes = nation.where(col("n_nationkey") < 10)
        .withColumn("n_name", lower(col("n_name")))
        .unionByName(s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(990, "atlantis", 2)),
          nation.schema))
      HudiWrite.upsert(s, changes, path)
      val delKeys = nation.where(col("n_nationkey") % 5 === 3)
        .select("n_nationkey")
      HudiWrite.delete(s, delKeys, path)
      (path, i1)
    })

  /** Typed changelog across the MOR upsert + tombstone commits: the
    * upsert surfaces as pre-image deletes + post-image inserts
    * (ordinal 1), the tombstones as deletes of the post-upsert state
    * (ordinal 2) — replayed relationally by the oracle. Instants are
    * wall-clock, so the gate pins the deterministic ordinal.
    */
  def qHudiChangelog(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.HudiTable
    val (path, i1) = writtenHudiChangelog(s, dir)
    new HudiTable("nation_hudi_chg", path)
      .changes(s, i1)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col(HudiTable.ChangeTypeCol), col(HudiTable.ChangeOrdinalCol))
      .orderBy(col(HudiTable.ChangeOrdinalCol),
        col(HudiTable.ChangeTypeCol), col("n_nationkey"))
  }

  // ---------- IncrementalView over an Iceberg base (E50 × R49) ----------

  private val icebergIvm =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Per-region (count, sum) view over an ICEBERG base, maintained
    * through the typed changelog: initialize, then an equality upsert
    * (+1000 on keys ≡ 0 mod 3, one inserted key) and an equality
    * delete (keys ≡ 2 mod 5) folded into ONE refresh that reads only
    * the change feed — never the base table. Returns the VIEW path
    * (a Delta table).
    */
  private[queries] def builtIcebergView(s: SparkSession, dir: String): String =
    icebergIvm.getOrElseUpdate(dir, {
      import graft.operators.IncrementalView
      import graft.tables.IcebergWrite
      val tmp = java.nio.file.Files.createTempDirectory("graft_iceberg_ivm").toString
      val base = tmp + "/base"
      val view = tmp + "/view"
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"),
          (col("n_nationkey") * 10L).cast("long").as("v"))
      IcebergWrite.append(s, nation, base)
      val keys = Seq("n_regionkey"); val sums = Seq(("v", "sum_v"))
      IncrementalView.initialize(s, base, view, keys, sums)
      IcebergWrite.upsertEquality(s,
        nation.where(col("n_nationkey") % 3 === 0)
          .withColumn("v", col("v") + 1000L)
          .unionByName(s.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(990, 2, 777L)),
            nation.schema)),
        base, Seq("n_nationkey"))
      IcebergWrite.deleteEquality(s, base,
        nation.where(col("n_nationkey") % 5 === 2).select("n_nationkey"))
      IncrementalView.refresh(s, base, view, keys, sums)
      view
    })

  /** The refreshed view's final state; the oracle recomputes it from
    * scratch, so a hash match proves the Iceberg-changelog-fed
    * signed-delta algebra.
    */
  def qIncrViewIceberg(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaTable, ReadArgs}
    new DeltaTable("iceberg_view", builtIcebergView(s, dir))(s, ReadArgs())
      .select(col("n_regionkey"), col("n_rows"), col("sum_v"))
      .orderBy("n_regionkey")
  }

  // ---------- IncrementalView over a Hudi MOR base (E50 × R53) ----------

  private val hudiIvm =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The same per-region view over a HUDI MERGE_ON_READ base: a
    * log-file upsert (+1000 on keys ≡ 0 mod 3, inserted key 990) and
    * a tombstone delete (keys ≡ 2 mod 5) folded into ONE changelog-fed
    * refresh — the final state is identical to the Iceberg leg's, so
    * the oracle is the same relational recompute.
    */
  private[queries] def builtHudiView(s: SparkSession, dir: String): String =
    hudiIvm.getOrElseUpdate(dir, {
      import graft.operators.IncrementalView
      import graft.tables.HudiWrite
      val tmp = java.nio.file.Files.createTempDirectory("graft_hudi_ivm").toString
      val base = tmp + "/base"
      val view = tmp + "/view"
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"),
          (col("n_nationkey") * 10L).cast("long").as("v"))
      HudiWrite.bulkInsert(s, nation, base, "n_nationkey", Seq("n_regionkey"),
        tableType = "MERGE_ON_READ")
      val keys = Seq("n_regionkey"); val sums = Seq(("v", "sum_v"))
      IncrementalView.initialize(s, base, view, keys, sums)
      HudiWrite.upsert(s,
        nation.where(col("n_nationkey") % 3 === 0)
          .withColumn("v", col("v") + 1000L)
          .unionByName(s.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(990, 2, 777L)),
            nation.schema)),
        base)
      import s.implicits._
      HudiWrite.delete(s,
        nation.where(col("n_nationkey") % 5 === 2).select("n_nationkey"), base)
      IncrementalView.refresh(s, base, view, keys, sums)
      view
    })

  def qIncrViewHudi(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaTable, ReadArgs}
    new DeltaTable("hudi_view", builtHudiView(s, dir))(s, ReadArgs())
      .select(col("n_regionkey"), col("n_rows"), col("sum_v"))
      .orderBy("n_regionkey")
  }

  // ---------- Delta stats-pruned read (the bench's planner probe) ----------

  private val deltaStats =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Lineitem written natively as an UNPARTITIONED Delta table in 8
    * orderkey-ranged files — the Delta leg of the triad's
    * stats-pruning probes (writtenLineitemRanged / writtenOrdersRanged
    * are the Iceberg/Hudi legs): only the commit log's per-file
    * min/max stats keep a selective orderkey predicate from opening
    * all 8 files. Headline-benched so a regression in log replay or
    * stats evaluation shows up in BENCH, not just in specs.
    */
  private[queries] def writtenLineitemDelta(s: SparkSession, dir: String): String =
    deltaStats.getOrElseUpdate(dir, {
      import graft.tables.DeltaWrite
      val path = java.nio.file.Files
        .createTempDirectory("graft_delta_stats").toString + "/lineitem"
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
      DeltaWrite.append(s, li, path)
      path
    })

  /** Bounds-pruned range probe + aggregate, the same probe shape as
    * q_iceberg_stats_prune / q_hudi_stats_prune: `l_orderkey < 1200`
    * must reach one of the 8 ranged files via the Delta log's file
    * stats before any parquet opens.
    */
  def qDeltaStatsPrune(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Filter
    import graft.tables.{DeltaTable, ReadArgs}
    import Num.{d4, dsum}
    val table = new DeltaTable("lineitem_delta_ranged", writtenLineitemDelta(s, dir))
    table(s, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("l_orderkey", "<", 1200L)))))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(d4(col("l_quantity"))).as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))
      .orderBy("l_returnflag")
  }
}
