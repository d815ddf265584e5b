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
}
