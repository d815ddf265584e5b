package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path

/** r15: `IcebergWrite.updateWhere` — row-level UPDATE as a
  * copy-on-write rewrite of exactly the matched data files, committed
  * as ONE snapshot (delete+add at the same sequence number). The
  * tests pin the parts that can silently go wrong: existing
  * merge-on-read deletes and Puffin DVs must MATERIALIZE into the
  * rewrite (never resurrect a dead row), untouched files must not be
  * rewritten, time travel must keep the pre-update state, and the
  * snapshot must read as an overwrite (data changed), not a replace.
  */
class IcebergUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def read(t: String) =
    new IcebergTable("t", t)(spark, ReadArgs())

  private def dataFilesOf(t: String): Seq[String] = {
    val fs = fsOf(t)
    val meta = IcebergMeta.load(fs, t)
    val snap = IcebergMeta.selectSnapshot(meta, None, None)
    IcebergMeta.planFiles(fs, snap).filter(_.content == 0).map(_.path)
  }

  test("updates matched rows; untouched files are not rewritten") {
    val t = tempDir("ice_upd").toString + "/t"
    // two files via partitioning: part=0 (ids 0..4), part=1 (ids 5..9)
    val df = (0L until 10L).map(i => (i, s"v$i", (i / 5).toInt)).toDF("id", "v", "part")
    val s0 = IcebergWrite.append(spark, df, t, Seq("part"))
    val before = dataFilesOf(t).toSet

    val snap = IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("part", "=", 0), Filter("id", ">=", 2))),
      Seq("v" -> "concat(v, '!')"))
    assert(snap != s0)
    val got = read(t).orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(got.toSeq == (0L until 10L).map(i =>
      (i, if (i >= 2 && i < 5) s"v$i!" else s"v$i")))
    // the part=1 file is untouched — exact partition pruning kept it
    // out of the rewrite entirely
    val after = dataFilesOf(t).toSet
    assert((before -- after).forall(_.contains("part=0")), (before -- after).toString)
    assert(after.intersect(before).exists(_.contains("part=1")))
    // every assignment sees the PRE-update row
    IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("id", "=", 7L))),
      Seq("id" -> "id + 100", "v" -> "concat(v, cast(id as string))"))
    val r7 = read(t).where("id = 107").select("v").as[String].collect()
    assert(r7.toSeq == Seq("v77"))
  }

  test("no matching file is a no-op (current snapshot id returned)") {
    val t = tempDir("ice_upd_noop").toString + "/t"
    val s0 = IcebergWrite.append(spark,
      (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    val fs = fsOf(t)
    val v0 = IcebergWrite.latestVersionByScan(fs, new Path(t, "metadata")).get
    assert(IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("id", ">", 100L))),
      Seq("v" -> "'x'")) == s0)
    assert(IcebergWrite.latestVersionByScan(fs, new Path(t, "metadata")).get == v0)
  }

  test("position deletes materialize: a deleted row never resurrects") {
    val t = tempDir("ice_upd_pos").toString + "/t"
    IcebergWrite.append(spark, (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    IcebergWrite.deleteWhere(spark, t, Filters.normalize(Seq(Filter("id", "=", 3L))))
    // the update MATCHES the deleted row's file; the rewrite must keep
    // id=3 dead while updating the live matches
    IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("id", "<=", 4L))),
      Seq("v" -> "upper(v)"))
    val got = read(t).orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(got.toSeq == Seq(0L -> "V0", 1L -> "V1", 2L -> "V2",
      4L -> "V4", 5L -> "v5", 6L -> "v6", 7L -> "v7"))
  }

  test("equality deletes materialize into the rewrite") {
    val t = tempDir("ice_upd_eq").toString + "/t"
    IcebergWrite.append(spark, (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    IcebergWrite.deleteEquality(spark, t, Seq(1L, 4L).toDF("id"))
    IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq.empty[Filter]),
      Seq("v" -> "concat(v, '+')"))
    val got = read(t).orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(got.toSeq == Seq(0L -> "v0+", 2L -> "v2+", 3L -> "v3+", 5L -> "v5+"))
  }

  test("Puffin DVs materialize into the rewrite (v3 table)") {
    val t = tempDir("ice_upd_dv").toString + "/t"
    IcebergWrite.append(spark, (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    IcebergWrite.deleteWhereDv(spark, t, Filters.normalize(Seq(Filter("id", "<", 2L))))
    IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("id", "<", 5L))),
      Seq("v" -> "upper(v)"))
    val got = read(t).orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(got.toSeq == Seq(2L -> "V2", 3L -> "V3", 4L -> "V4",
      5L -> "v5", 6L -> "v6", 7L -> "v7"))
  }

  test("time travel keeps the pre-update state; snapshot reads as overwrite") {
    val t = tempDir("ice_upd_tt").toString + "/t"
    val s0 = IcebergWrite.append(spark,
      (0L until 4L).map(i => (i, i * 10L)).toDF("id", "x"), t)
    val s1 = IcebergWrite.updateWhere(spark, t,
      Filters.normalize(Seq(Filter("id", ">=", 2L))), Seq("x" -> "x + 1"))
    val table = new IcebergTable("t", t)
    val old = table(spark, ReadArgs(extra = Map(table.SnapshotIdKey -> s0)))
      .orderBy("id").select("x").as[Long].collect()
    assert(old.toSeq == Seq(0L, 10L, 20L, 30L))
    val now = read(t).orderBy("id").select("x").as[Long].collect()
    assert(now.toSeq == Seq(0L, 10L, 21L, 31L))
    val fs = fsOf(t)
    val meta = IcebergMeta.load(fs, t)
    val sn = meta.snapshots.find(_.id == s1).get
    assert(sn.operation.contains("overwrite"),
      s"updateWhere must commit an overwrite (data changed), got ${sn.operation}")
  }

  test("refusals: unknown SET column, Delta path") {
    val t = tempDir("ice_upd_ref").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), t)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.updateWhere(spark, t,
        Filters.normalize(Seq.empty[Filter]), Seq("nope" -> "'x'")))
    assert(e.getMessage.contains("SET column"))
  }
}
