package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed changelog read (IcebergTable.changes): CDF-parity
  * insert/delete rows derived per commit from the snapshot lineage —
  * appends, atomic equality upserts (pre-image delete + post-image
  * insert), equality/position deletes, and `replace` commits
  * contributing nothing.
  */
class IcebergChangesSpec extends SparkSpec {
  import spark.implicits._

  private def snaps(path: String): Seq[IcebergMeta.SnapshotInfo] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IcebergMeta.load(fs, path).snapshots.sortBy(_.sequenceNumber)
  }

  private def changed(path: String, from: Long, to: Long) =
    new IcebergTable("t", path).changes(spark, from, to)
      .select(col("id").as[Int], col("v").as[String],
        col(IcebergTable.ChangeTypeCol).as[String],
        col(IcebergTable.ChangeOrdinalCol).as[Int])
      .collect().toSet

  test("append commits emit inserts with per-commit ordinals") {
    val path = tempDir("ice-chg-app").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    IcebergWrite.append(spark, Seq((3, "c")).toDF("id", "v"), path)
    IcebergWrite.append(spark, Seq((4, "d")).toDF("id", "v"), path)
    val s = snaps(path)
    assert(changed(path, s.head.id, s.last.id) == Set(
      (3, "c", "insert", 1), (4, "d", "insert", 2)))
    // full range includes the first commit's rows when walked from it
    assert(changed(path, s(0).id, s(1).id) == Set((3, "c", "insert", 1)))
    // empty range
    assert(new IcebergTable("t", path).changes(spark, s.last.id, s.last.id).count() == 0)
  }

  test("equality upsert emits pre-image deletes + post-image inserts") {
    val path = tempDir("ice-chg-up").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), path)
    // update id=2, insert id=9 — one atomic commit (eq delete + add)
    IcebergWrite.upsertEquality(spark,
      Seq((2, "B"), (9, "z")).toDF("id", "v"), path, Seq("id"))
    val s = snaps(path)
    assert(changed(path, s.head.id, s.last.id) == Set(
      (2, "b", "delete", 1), // pre-image of the update
      (2, "B", "insert", 1), // post-image: same-commit eq delete must NOT kill it
      (9, "z", "insert", 1))) // fresh key: no pre-image delete emitted
  }

  test("equality delete emits only rows live at the parent") {
    val path = tempDir("ice-chg-del").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "v"), path)
    IcebergWrite.deleteEquality(spark, path, Seq(Tuple1(2)).toDF("id"))
    // deleting {2, 3}: 2 is already dead — only 3's delete may emit
    IcebergWrite.deleteEquality(spark, path, Seq(Tuple1(2), Tuple1(3)).toDF("id"))
    val s = snaps(path)
    assert(changed(path, s.head.id, s.last.id) == Set(
      (2, "b", "delete", 1), (3, "c", "delete", 2)))
  }

  test("a wide range PAGES: bounded plan width, identical rows") {
    val path = tempDir("ice-chg-page").toString + "/t"
    (1 to 40).foreach(i =>
      IcebergWrite.append(spark, Seq((i, s"v$i")).toDF("id", "v"), path))
    val s = snaps(path)
    val t = new IcebergTable("t", path)
    val paged = t.changes(spark, s.head.id, s.last.id, pageCommits = 8)
    // every leaf of the final tree is a MATERIALIZED page — no parquet
    // relation and no O(commits)-wide analysis ride into one plan
    val leaves = paged.queryExecution.logical.collectLeaves()
    assert(leaves.size <= 5, s"expected <= ceil(39/8) leaves, got ${leaves.size}")
    assert(leaves.forall(_.getClass.getSimpleName.contains("LogicalRDD")),
      leaves.map(_.getClass.getSimpleName).distinct.mkString(","))
    val got = paged
      .select(col("id").as[Int], col(IcebergTable.ChangeOrdinalCol).as[Int])
      .collect().toSet
    assert(got == (2 to 40).map(i => (i, i - 1)).toSet)
    // row parity with the unpaged read
    val plain = t.changes(spark, s.head.id, s.last.id, pageCommits = 1000)
      .select(col("id").as[Int], col(IcebergTable.ChangeOrdinalCol).as[Int])
      .collect().toSet
    assert(plain == got)
  }

  test("additive evolution mid-range: changes emit under the evolved schema, old rows null-filled") {
    val path = tempDir("ice-chg-evo").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    // additive evolution: the second append carries a NEW column w
    IcebergWrite.append(spark, Seq((3, "c", 30L)).toDF("id", "v", "w"), path)
    // a post-evolution delete of a PRE-evolution row: its change row
    // reads the old file under the evolved schema (w null-filled)
    IcebergWrite.deleteEquality(spark, path, Seq(Tuple1(1)).toDF("id"))
    val s = snaps(path)
    val got = new IcebergTable("t", path).changes(spark, s.head.id, s.last.id)
      .select("id", "v", "w", IcebergTable.ChangeTypeCol)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.get(2)), r.getString(3)))
      .toSet
    assert(got == Set(
      (3, "c", Some(30L), "insert"),
      (1, "a", None, "delete")), got)
  }

  test("position delete (deleteWhere) emits deleted rows") {
    val path = tempDir("ice-chg-pos").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), path)
    IcebergWrite.deleteWhere(spark, path,
      graft.core.Filters.normalize(Seq(graft.core.Filter("id", ">=", 2))))
    val s = snaps(path)
    assert(changed(path, s.head.id, s.last.id) == Set(
      (2, "b", "delete", 1), (3, "c", "delete", 1)))
  }

  test("replace (compaction) commits contribute no change rows") {
    val path = tempDir("ice-chg-rep").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a")).toDF("id", "v"), path)
    IcebergWrite.append(spark, Seq((2, "b")).toDF("id", "v"), path)
    val before = snaps(path)
    IcebergMaintenance.rewriteDataFiles(spark, path)
    val after = snaps(path)
    assert(after.size == before.size + 1, "compact must commit a snapshot")
    assert(after.last.operation.contains("replace"))
    assert(changed(path, before.last.id, after.last.id).isEmpty)
    // and across the whole range the appends still surface exactly once
    assert(changed(path, before.head.id, after.last.id) ==
      Set((2, "b", "insert", 1)))
  }

  test("REPLAY INVARIANT: initial state + inserts − deletes == final state (randomized ops)") {
    // the changelog's defining property, checked over random op
    // sequences (fixed seeds — deterministic): folding the typed
    // change stream into the range's initial snapshot reconstructs
    // the final snapshot EXACTLY, as a multiset of full rows
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val dir = tempDir(s"ice-chg-prop$seed").toString + "/t"
      def batch(n: Int): Seq[(Long, String)] =
        Seq.fill(n)((rnd.nextInt(30).toLong, s"v${rnd.nextInt(1000)}"))
          .groupBy(_._1).map(_._2.head).toSeq // distinct keys per batch
      IcebergWrite.append(spark, batch(8).toDF("id", "v"), dir)
      (1 to 6).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => IcebergWrite.append(spark, batch(3).toDF("id", "v"), dir)
          case 1 => IcebergWrite.upsertEquality(spark,
            batch(4).toDF("id", "v"), dir, Seq("id"))
          case 2 => IcebergWrite.deleteEquality(spark, dir,
            batch(3).map(_._1).distinct.toDF("id"))
          case _ => IcebergMaintenance.rewriteDataFiles(spark, dir)
        }
      }
      val s = snaps(dir)
      val t = new IcebergTable("t", dir)
      def multiset(rows: Seq[(Long, String)]): Map[(Long, String), Int] =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      val initial = t(spark, ReadArgs(extra = Map(t.SnapshotIdKey -> s.head.id)))
        .select(col("id").as[Long], col("v").as[String]).collect().toSeq
      val fin = t(spark, ReadArgs.empty)
        .select(col("id").as[Long], col("v").as[String]).collect().toSeq
      val chg = t.changes(spark, s.head.id, s.last.id)
        .select(col("id").as[Long], col("v").as[String],
          col(IcebergTable.ChangeTypeCol).as[String]).collect().toSeq
      val inserts = chg.collect { case (i, v, "insert") => (i, v) }
      val deletes = chg.collect { case (i, v, "delete") => (i, v) }
      val replayed = (multiset(initial ++ inserts).toSeq ++
        multiset(deletes).toSeq.map { case (k, n) => k -> -n })
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
      assert(replayed == multiset(fin),
        s"seed $seed: replay diverged\nreplayed=$replayed\nfinal=${multiset(fin)}")
    }
  }

  test("changelog columns: snapshot id and timestamp ride every row") {
    val path = tempDir("ice-chg-cols").toString + "/t"
    IcebergWrite.append(spark, Seq((1, "a")).toDF("id", "v"), path)
    IcebergWrite.append(spark, Seq((2, "b")).toDF("id", "v"), path)
    val s = snaps(path)
    val rows = new IcebergTable("t", path).changes(spark, s.head.id, s.last.id)
    assert(rows.schema.fieldNames.toSeq == Seq("id", "v",
      IcebergTable.ChangeTypeCol, IcebergTable.CommitSnapshotCol,
      IcebergTable.ChangeOrdinalCol, IcebergTable.CommitTimestampCol))
    val r = rows.head()
    assert(r.getAs[Long](IcebergTable.CommitSnapshotCol) == s.last.id)
    assert(r.getAs[java.sql.Timestamp](IcebergTable.CommitTimestampCol).getTime ==
      s.last.timestampMs)
  }
}
