package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Row tracking (`rowTracking` writer feature) + `domainMetadata`
  * actions, per the public Delta protocol: every committed file gets
  * a `baseRowId`, the fresh row id of row i is baseRowId + i, and the
  * table-wide high-water mark rides the `delta.rowTracking` domain so
  * concurrent/later writers never reuse ids.
  */
class DeltaRowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)

  private def rowIds(dir: String): Map[Long, (Option[Long], Option[Long])] =
    t(dir)(spark, ReadArgs(extra = Map(t(dir).RowIdsKey -> true)))
      .select("id", "_row_id", "_row_commit_version")
      .collect()
      .map(r => (r.getLong(0),
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap

  private def enable(dir: String): Unit =
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableRowTracking" -> "true"))

  test("appends assign contiguous base row ids; pre-feature files read null ids") {
    val dir = tempDir("delta-rt").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "before")).toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (10L to 12L).map(i => (i, "a")).toDF("id", "v"), dir)
    DeltaWrite.append(spark, (20L to 21L).map(i => (i, "b")).toDF("id", "v"), dir)

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.rowIdHighWaterMark == 4L) // 3 + 2 rows assigned
    assert(snap.protocol.writerFeatures.exists(f =>
      f.contains("rowTracking") && f.contains("domainMetadata")))

    val ids = rowIds(dir)
    assert(ids(1L)._1.isEmpty && ids(1L)._2.isEmpty) // pre-feature file
    val assigned = ids.filterKeys(_ >= 10L).values.map(_._1.get).toSeq.sorted
    assert(assigned == (0L to 4L))
    // rows of one commit share its version; the two commits differ
    val vs = ids.filterKeys(_ >= 10L).toSeq.groupBy(_._2._2.get).view
      .mapValues(_.map(_._1).toSet).toMap
    assert(vs.size == 2)
    assert(vs.values.toSet == Set(Set(10L, 11L, 12L), Set(20L, 21L)))
  }

  test("DV delete keeps surviving row ids stable; later appends never reuse ids") {
    val dir = tempDir("delta-rt-dv").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 4L).map(i => (i, "x")).toDF("id", "v"), dir)
    val before = rowIds(dir)

    DeltaWrite.deleteWhereDv(spark, dir, Seq(Seq(Filter("id", "in", Seq(1L, 3L)))))
    val after = rowIds(dir)
    assert(after.keySet == Set(0L, 2L, 4L))
    after.foreach { case (id, rid) => assert(rid == before(id)) }

    DeltaWrite.append(spark, Seq((9L, "y")).toDF("id", "v"), dir)
    val ids2 = rowIds(dir)
    val all = ids2.values.flatMap(_._1).toSeq
    assert(all.distinct.size == all.size) // no id reused
    assert(ids2(9L)._1.get > before.values.flatMap(_._1).max)
  }

  test("high-water mark and row ids survive checkpoint + aged-out JSON prefix") {
    val dir = tempDir("delta-rt-cp").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 3L).map(i => (i, "x")).toDF("id", "v"), dir)
    val before = rowIds(dir)
    val cpV = DeltaWrite.checkpoint(spark, dir)
    val logDir = new Path(dir + "/_delta_log")
    val f = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpV).foreach(v => f.delete(new Path(logDir, f"$v%020d.json"), false))

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.rowIdHighWaterMark == 3L)
    assert(rowIds(dir) == before)
    // and appends on top of the checkpointed mark continue correctly
    DeltaWrite.append(spark, Seq((8L, "z")).toDF("id", "v"), dir)
    assert(DeltaLog.snapshot(spark, dir).rowIdHighWaterMark == 4L)
  }

  test("v2 checkpoint persists domains and txn marks in the manifest") {
    val dir = tempDir("delta-rt-cp2").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 2L).map(i => (i, "x")).toDF("id", "v"), dir,
      txn = Some(("app-1", 7L)))
    val before = rowIds(dir)
    val cpV = DeltaWrite.checkpointV2(spark, dir)
    val logDir = new Path(dir + "/_delta_log")
    val f = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpV).foreach(v => f.delete(new Path(logDir, f"$v%020d.json"), false))

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.rowIdHighWaterMark == 2L)
    assert(snap.txns.get("app-1").contains(7L))
    assert(rowIds(dir) == before)
  }

  test("OPTIMIZE materializes row ids: compaction preserves every id") {
    val dir = tempDir("delta-rt-opt").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    // several small files so compaction has something to do
    (0 until 4).foreach(i =>
      DeltaWrite.append(spark,
        (i * 10L until i * 10L + 3L).map(j => (j, s"f$i")).toDF("id", "v"), dir))
    val before = rowIds(dir)
    val res = DeltaWrite.optimize(spark, dir)
    assert(res.filesAdded > 0, "compaction rewrote nothing")
    assert(rowIds(dir) == before) // ids survive the rewrite, bit for bit
    // the rewritten file carries fresh baseRowIds ABOVE the old mark
    // (materialized values take precedence at read)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.rowIdHighWaterMark > 11L)
    // appends after the rewrite still mint unique ids
    DeltaWrite.append(spark, Seq((99L, "z")).toDF("id", "v"), dir)
    val all = rowIds(dir).values.flatMap(_._1).toSeq
    assert(all.distinct.size == all.size)
  }

  test("copy-on-write DELETE and ZORDER preserve surviving row ids") {
    val dir = tempDir("delta-rt-del").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 9L).map(i => (i, "x")).toDF("id", "v"), dir)
    val before = rowIds(dir)
    DeltaWrite.deleteWhere(spark, dir, Seq(Seq(Filter("id", "<", 3L))))
    val after = rowIds(dir)
    assert(after.keySet == (3L to 9L).toSet)
    after.foreach { case (id, rid) => assert(rid == before(id)) }

    DeltaWrite.optimizeZorder(spark, dir, Seq("id"), bits = 4)
    assert(rowIds(dir) == after) // clustering rewrite keeps them too
  }

  test("MERGE keeps row ids: updates preserve the id with a new commit version") {
    val dir = tempDir("delta-rt-merge").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 4L).map(i => (i, "old")).toDF("id", "v"), dir)
    val before = rowIds(dir)

    val res = DeltaWrite.merge(spark, dir,
      Seq((2L, "upd"), (9L, "new")).toDF("id", "v"), Seq("id"))
    val after = rowIds(dir)
    assert(after.keySet == Set(0L, 1L, 2L, 3L, 4L, 9L))
    // unchanged rows: id AND commit version untouched
    Seq(0L, 1L, 3L, 4L).foreach(i => assert(after(i) == before(i)))
    // updated row: same id, commit version = the MERGE's version
    assert(after(2L)._1 == before(2L)._1)
    assert(after(2L)._2.contains(res.version))
    // inserted row: a fresh id, never seen before
    assert(!before.values.flatMap(_._1).toSet.contains(after(9L)._1.get))
    val all = after.values.flatMap(_._1).toSeq
    assert(all.distinct.size == all.size)

    // updated value actually landed
    val vals = t(dir)(spark, ReadArgs())
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(vals(2L) == "upd" && vals(9L) == "new")
  }

  test("pre-feature rows acquire fresh ids on rewrite (backfill-on-rewrite)") {
    val dir = tempDir("delta-rt-backfill").toString + "/t"
    DeltaWrite.append(spark, (0L to 2L).map(i => (i, "old")).toDF("id", "v"), dir)
    DeltaWrite.append(spark, (10L to 12L).map(i => (i, "old2")).toDF("id", "v"), dir)
    enable(dir)
    assert(rowIds(dir).values.forall(_._1.isEmpty)) // nothing assigned yet
    DeltaWrite.optimize(spark, dir, smallFileBytes = 1L << 20)
    val ids = rowIds(dir)
    assert(ids.values.forall(_._1.isDefined), "rewrite backfills ids")
    val assigned = ids.values.flatMap(_._1).toSeq
    assert(assigned.distinct.size == assigned.size)
  }

  test("domainMetadata replay: latest wins, removed tombstones the domain") {
    val dir = tempDir("delta-dm").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "x")).toDF("id", "v"), dir)
    val logDir = new Path(dir + "/_delta_log")
    val f = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(version: Long, lines: Seq[String]): Unit = {
      val out = f.create(new Path(logDir, f"$version%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    put(1L, Seq(
      """{"domainMetadata":{"domain":"user.a","configuration":"{\"k\":1}","removed":false}}""",
      """{"domainMetadata":{"domain":"user.b","configuration":"{\"k\":2}","removed":false}}"""))
    put(2L, Seq(
      """{"domainMetadata":{"domain":"user.a","configuration":"{\"k\":9}","removed":false}}""",
      """{"domainMetadata":{"domain":"user.b","configuration":"","removed":true}}"""))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.domains == Map("user.a" -> """{"k":9}"""))
    // time travel sees the pre-removal state
    val old = DeltaLog.snapshot(spark, dir, versionAsOf = Some(1L))
    assert(old.domains.keySet == Set("user.a", "user.b"))
  }

  test("shallow clone carries row ids and the high-water-mark domain") {
    val dir = tempDir("delta-rt-clone").toString + "/src"
    val dst = tempDir("delta-rt-clone").toString + "/dst"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    DeltaWrite.append(spark, (0L to 3L).map(i => (i, "x")).toDF("id", "v"), dir)
    DeltaDdl.cloneShallow(spark, dir, dst)
    assert(DeltaLog.snapshot(spark, dst).rowIdHighWaterMark == 3L)
    assert(rowIds(dst) == rowIds(dir))
    // appends into the CLONE continue above the inherited mark
    DeltaWrite.append(spark, Seq((9L, "y")).toDF("id", "v"), dst)
    val ids = rowIds(dst).values.flatMap(_._1).toSeq
    assert(ids.distinct.size == ids.size)
  }

  test("concurrent appends to a row-tracked table mint disjoint id ranges") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val dir = tempDir("delta-rt-race").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    enable(dir)
    // eight writers race; each loses commits and re-reads the mark —
    // every re-assignment must still produce globally disjoint ranges
    val writers = (0 until 8).map { w =>
      Future(DeltaWrite.append(spark,
        (0 until 5).map(i => (w * 100L + i, s"w$w")).toDF("id", "v"), dir))
    }
    Await.result(Future.sequence(writers), 300.seconds)

    val ids = rowIds(dir)
    assert(ids.size == 40)
    val assigned = ids.values.map(_._1.get).toSeq
    assert(assigned.distinct.size == 40, "row ids collided across racing writers")
    assert(assigned.sorted == (0L until 40L)) // contiguous, no holes
    assert(DeltaLog.snapshot(spark, dir).rowIdHighWaterMark == 39L)
  }
}
