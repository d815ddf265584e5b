package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-12 additions: the Iceberg v3 deletion-vector WRITE path
  * through the gate (a graft-written Puffin-DV table read back
  * natively — replacement semantics included) and the net-rows
  * incremental read over a DV-and-rewrite-bearing range (the
  * changelog fold [[graft.tables.IcebergTable.incremental]] serves
  * where the v2 adds-only diff refuses).
  */
object Wave8Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  // ---------- v3 deletion-vector write (P-free native round trip) ----------

  private val icebergDv = scala.collection.concurrent.TrieMap.empty[String, String]

  object IcebergDvParams {
    /** Round 1 deletes every key below this bound... */
    val Round1Below = 5
    /** ...round 2 deletes these — key 3 re-deletes a round-1 file, so
      * its DV REPLACES (union positions, old entry dropped).
      */
    val Round2Keys: Seq[Int] = Seq(3, 7, 12, 19)
  }

  /** Native Iceberg nation table deleted from TWICE via v3 Puffin
    * deletion vectors: the second round replaces the first round's
    * DV on shared files, so the snapshot read exercises the
    * at-most-one-DV-per-file contract end to end.
    */
  private def dvNation(s: SparkSession, dir: String): String =
    icebergDv.getOrElseUpdate(dir, {
      import graft.core.Filter
      import graft.tables.IcebergWrite
      val path = java.nio.file.Files
        .createTempDirectory("graft_iceberg_dv").toString + "/nation"
      IcebergWrite.append(s,
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey"),
        path, Seq("n_regionkey"))
      IcebergWrite.deleteWhereDv(s, path, graft.core.Filters.normalize(
        Seq(Filter("n_nationkey", "<", IcebergDvParams.Round1Below))))
      IcebergWrite.deleteWhereDv(s, path, graft.core.Filters.normalize(
        Seq(Filter("n_nationkey", "in", IcebergDvParams.Round2Keys))))
      path
    })

  /** Snapshot after two DV delete rounds: survivors only, served from
    * the ORIGINAL data files + one deletion vector per affected file.
    */
  def qIcebergDv(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{IcebergTable, ReadArgs}
    new IcebergTable("nation_dv", dvNation(s, dir))(s, ReadArgs.empty)
      .orderBy("n_nationkey")
  }

  // ---------- net-rows incremental over a DV + rewrite range ----------

  private val icebergIncrDv = scala.collection.concurrent.TrieMap.empty[String, (String, Long, Long)]

  object IcebergIncrDvParams {
    /** The first append holds keys below this; the second the rest. */
    val SplitAt = 15
    /** DV-deleted after both appends: 2 is a round-1 (pre-range) row —
      * its delete must contribute NOTHING to the net fold; 17 and 20
      * are in-range rows that net out.
      */
    val DeleteKeys: Seq[Int] = Seq(2, 17, 20)
  }

  /** Build: append(keys < 15) → append(rest) → rewrite_data_files
    * (replace commit) → DV delete of {2, 17, 20}; returns
    * (path, firstSnapshotId, headSnapshotId).
    */
  private def incrDvNation(s: SparkSession, dir: String): (String, Long, Long) =
    icebergIncrDv.getOrElseUpdate(dir, {
      import graft.core.Filter
      import graft.tables.{IcebergMaintenance, IcebergWrite}
      import IcebergIncrDvParams._
      val path = java.nio.file.Files
        .createTempDirectory("graft_iceberg_incr_dv").toString + "/nation"
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val s1 = IcebergWrite.append(s,
        nation.where(org.apache.spark.sql.functions.col("n_nationkey") < SplitAt),
        path, Seq("n_regionkey"))
      IcebergWrite.append(s,
        nation.where(org.apache.spark.sql.functions.col("n_nationkey") >= SplitAt), path)
      IcebergMaintenance.rewriteDataFiles(s, path)
      val head = IcebergWrite.deleteWhereDv(s, path, graft.core.Filters.normalize(
        Seq(Filter("n_nationkey", "in", DeleteKeys))))
      (path, s1, head)
    })

  /** Net new rows of a range containing a COMPACTION and a
    * DELETION-VECTOR delete — the shapes the v2 adds-only diff
    * refuses; the changelog fold serves them: second-append rows
    * minus the in-range DV deletes, the pre-range delete ignored.
    */
  def qIcebergIncrDv(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.IcebergTable
    val (path, s1, head) = incrDvNation(s, dir)
    new IcebergTable("nation_incr_dv", path)
      .incremental(s, s1, head, allowNewDeletes = true)
      .orderBy("n_nationkey")
  }

  // ---------- cross-format CDC replication (Replicate) ----------

  object ReplicateParams {
    /** `s_suppkey % UpdateMod == 0` rows get `s_name = 'UPDATED'`. */
    val UpdateMod = 7
    /** `s_suppkey % InsertMod == 0` spawns a NEW key `+InsertOffset`. */
    val InsertMod = 13
    val InsertOffset = 100000L
    /** Final commit deletes original keys below this bound. */
    val DeleteBelow = 10
  }

  private val replicaIce = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Delta-CDF supplier source → churn (MERGE updates + inserts, then
    * a DELETE) → one [[graft.operators.Replicate.sync]] folds the
    * whole range into the ICEBERG replica; returns the replica path.
    */
  private def replicatedSupplier(s: SparkSession, dir: String): String =
    replicaIce.getOrElseUpdate(dir, {
      import graft.core.Filter
      import graft.tables.{DeltaDdl, DeltaWrite}
      import org.apache.spark.sql.functions._
      import ReplicateParams._
      val root = java.nio.file.Files.createTempDirectory("graft_replicate").toString
      val src = root + "/src"
      val tgt = root + "/replica"
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      DeltaDdl.createTable(s, src, sup.schema,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaWrite.append(s, sup, src)
      graft.operators.Replicate.initialize(s, src, tgt, Seq("s_suppkey"), "iceberg")
      val upd = sup.where(col("s_suppkey") % UpdateMod === 0)
        .select(col("s_suppkey"), lit("UPDATED").as("s_name"), col("s_nationkey"))
      val ins = sup.where(col("s_suppkey") % InsertMod === 0)
        .select((col("s_suppkey") + InsertOffset).as("s_suppkey"),
          lit("NEW").as("s_name"), col("s_nationkey"))
      DeltaWrite.merge(s, src, upd.unionByName(ins), Seq("s_suppkey"))
      DeltaWrite.deleteWhere(s, src, graft.core.Filters.normalize(
        Seq(Filter("s_suppkey", "<", DeleteBelow))))
      graft.operators.Replicate.sync(s, src, tgt, Seq("s_suppkey"))
      tgt
    })

  /** The Iceberg replica after one sync over the churn range — must
    * equal the source's final state replayed relationally.
    */
  def qReplicate(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{IcebergTable, ReadArgs}
    new IcebergTable("supplier_replica", replicatedSupplier(s, dir))(s, ReadArgs.empty)
      .orderBy("s_suppkey")
  }

  object ReplicateHudiParams {
    /** Rows of this region get `n_name = 'REPL_UP'` via a MOR log upsert. */
    val UpdateRegion = 2
    /** Rows of region 0 spawn NEW keys `+InsertOffset`. */
    val InsertRegion = 0
    val InsertOffset = 100
    /** Tombstoned record keys. */
    val DeleteKeys: Seq[Int] = Seq(1, 4)
  }

  private val replicaDelta = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Hudi MERGE_ON_READ nation source (log upserts + DELETE_BLOCK
    * tombstones) → one sync into a DELTA replica (the atomic
    * merge+deleteKeys commit); returns the replica path.
    */
  private def replicatedNation(s: SparkSession, dir: String): String =
    replicaDelta.getOrElseUpdate(dir, {
      import graft.tables.HudiWrite
      import org.apache.spark.sql.functions._
      import ReplicateHudiParams._
      val root = java.nio.file.Files.createTempDirectory("graft_replicate_hudi").toString
      val src = root + "/src"
      val tgt = root + "/replica"
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      HudiWrite.bulkInsert(s, nation, src, "n_nationkey",
        tableType = "MERGE_ON_READ")
      graft.operators.Replicate.initialize(s, src, tgt, Seq("n_nationkey"), "delta")
      val upd = nation.where(col("n_regionkey") === UpdateRegion)
        .select(col("n_nationkey"), lit("REPL_UP").as("n_name"), col("n_regionkey"))
      val ins = nation.where(col("n_regionkey") === InsertRegion)
        .select((col("n_nationkey") + InsertOffset).as("n_nationkey"),
          lit("NEW").as("n_name"), col("n_regionkey"))
      HudiWrite.upsert(s, upd.unionByName(ins), src)
      import s.implicits._
      HudiWrite.delete(s, DeleteKeys.toDF("n_nationkey"), src)
      graft.operators.Replicate.sync(s, src, tgt, Seq("n_nationkey"))
      tgt
    })

  /** The Delta replica of the Hudi MOR source after one sync. */
  def qReplicateHudi(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.DeltaTable
    new DeltaTable("nation_replica", replicatedNation(s, dir))(s)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  // ---------- deletion-vector MERGE (the low-write-amplification apply) ----------

  object MergeDvParams {
    /** `c_custkey % UpdateMod == 0` rows get `c_name = 'DVUP'`. */
    val UpdateMod = 9
    /** New keys minted at `c_custkey + InsertOffset` for `% InsertMod == 0`. */
    val InsertMod = 17
    val InsertOffset = 500000L
    /** Keys 1..DeleteBelow-1 are deleted (via deleteKeys) in the SAME
      * mergeDv commit — starting at 1, not 0, because custkey 0 is an
      * update+insert key (%9 == %17 == 0) and overlapping the clauses
      * would complicate the relational oracle.
      */
    val DeleteBelow = 8
  }

  private val mergeDvTables = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Delta customer table upserted ONCE through [[graft.tables.
    * DeltaWrite.mergeDv]]: updates + inserts land as new files while
    * matched and deleted rows die via per-file deletion vectors — no
    * candidate file rewritten. The read then applies the DVs.
    */
  private def mergeDvCustomer(s: SparkSession, dir: String): String =
    mergeDvTables.getOrElseUpdate(dir, {
      import graft.tables.DeltaWrite
      import org.apache.spark.sql.functions._
      import MergeDvParams._
      val path = java.nio.file.Files
        .createTempDirectory("graft_merge_dv").toString + "/customer"
      val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
      DeltaWrite.append(s, cust, path)
      val upd = cust.where(col("c_custkey") % UpdateMod === 0)
        .select(col("c_custkey"), lit("DVUP").as("c_name"), col("c_nationkey"))
      val ins = cust.where(col("c_custkey") % InsertMod === 0)
        .select((col("c_custkey") + InsertOffset).as("c_custkey"),
          lit("NEW").as("c_name"), col("c_nationkey"))
      import s.implicits._
      DeltaWrite.mergeDv(s, path, upd.unionByName(ins), Seq("c_custkey"),
        deleteKeys = Some((1L until DeleteBelow).toDF("c_custkey")))
      path
    })

  /** The post-merge state read through the DV-applying snapshot. */
  def qMergeDv(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.DeltaTable
    new DeltaTable("customer_dv", mergeDvCustomer(s, dir))(s)
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }
}
