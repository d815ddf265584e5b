package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path

/** Incremental snapshot-diff read: appended-rows semantics over
  * ranges, empty range, ordering refusal, append-only validation
  * against a range that adds delete files, and pruning on the diff.
  */
class IcebergIncrSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("incremental returns exactly the rows appended in the range") {
    val dir = tempDir("ice-incr").toString + "/t"
    val s1 = IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, Seq("part"))
    val s2 = IcebergWrite.append(spark, Seq((3L, "c", 0)).toDF("id", "v", "part"), dir)
    val s3 = IcebergWrite.append(spark, Seq((4L, "d", 1)).toDF("id", "v", "part"), dir)
    val t = new IcebergTable("t", dir)

    def ids(from: Long, to: Long, args: ReadArgs = ReadArgs()) =
      t.incremental(spark, from, to, args).collect().map(_.getLong(0)).sorted.toSeq

    assert(ids(s1, s3) == Seq(3L, 4L))
    assert(ids(s1, s2) == Seq(3L))
    assert(ids(s2, s3) == Seq(4L))
    assert(ids(s1, s1) == Seq.empty)
    // identity partition pruning applies to the diff
    assert(ids(s1, s3, ReadArgs.where(Filter("part", "=", 1))) == Seq(4L))
    // column selection
    assert(t.incremental(spark, s1, s3, ReadArgs(columns = Some(Seq("v"))))
      .columns.toSeq == Seq("v"))
    // reversed range refuses
    val e = intercept[IllegalArgumentException] { ids(s3, s1) }
    assert(e.getMessage.contains("newer"))
  }

  test("manifest-diff fast path: O(delta) reads, never a full snapshot plan") {
    val dir = tempDir("ice-incr-fast").toString + "/t"
    val s1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val s2 = IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    val t = new IcebergTable("t", dir)
    // appends carry base manifests verbatim: from's manifests are a
    // subset of to's, so the diff reads only the NEW manifest and
    // never calls the full planner
    val before = IcebergMeta.driverContentFilePlans.get()
    assert(t.incremental(spark, s1, s2).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(IcebergMeta.driverContentFilePlans.get() == before,
      "append-only incremental must take the manifest-diff fast path")

    // a manifest rewrite breaks subsetness: the exact full-set diff
    // engages (and still answers correctly — nothing data-changed)
    IcebergMaintenance.rewriteManifests(spark, dir)
    val s3 = IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), dir)
    val b2 = IcebergMeta.driverContentFilePlans.get()
    assert(t.incremental(spark, s1, s3).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
    assert(IcebergMeta.driverContentFilePlans.get() > b2,
      "a rewritten-manifest range must fall back to the full diff")

    // the equality-upsert shape stays fast-path too: the new
    // snapshot's delete manifest is NEW, so allowNewDeletes tailing
    // sees exactly the latest row versions
    IcebergWrite.upsertEquality(spark,
      Seq((2L, "B!"), (9L, "i")).toDF("id", "v"), dir, Seq("id"))
    val head = IcebergMeta.load(fs(dir), dir).currentSnapshotId.get
    val b3 = IcebergMeta.driverContentFilePlans.get()
    val up = t.incremental(spark, s3, head, allowNewDeletes = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(up == Seq((2L, "B!"), (9L, "i")))
    assert(IcebergMeta.driverContentFilePlans.get() == b3)
  }

  test("a range that adds delete files refuses as non-append-only") {
    val delta = tempDir("ice-incr-dv").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, 10.0), (2L, -5.0), (3L, 7.0)).toDF("id", "bal"), delta)
    graft.export.IcebergUniform.export(spark, delta)
    DeltaWrite.deleteWhereDv(spark, delta,
      Filters.normalize(Seq(Filter("bal", "<", 0.0))))
    graft.export.IcebergUniform.export(spark, delta)

    val snaps = IcebergMeta.load(fs(delta), delta).snapshots.sortBy(_.sequenceNumber)
    assert(snaps.size >= 2, s"expected >=2 exported snapshots, got ${snaps.size}")
    val t = new IcebergTable("t", delta)
    val e = intercept[IllegalArgumentException] {
      t.incremental(spark, snaps.head.id, snaps.last.id).collect()
    }
    assert(e.getMessage.contains("not append-only"))
  }

  test("net-rows fallback: DV and rewrite ranges fold instead of refusing") {
    val dir = tempDir("ice-incr-net").toString + "/t"
    val s1 = IcebergWrite.append(spark,
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)
    val s2 = IcebergWrite.append(spark,
      Seq((9L, "i"), (10L, "j")).toDF("id", "v").coalesce(1), dir)
    // v3 Puffin DV deleting a pre-existing row (1) AND an in-range one (9)
    val s3 = IcebergWrite.deleteWhereDv(spark, dir,
      Filters.normalize(Seq(Filter("id", "in", Seq(1L, 9L)))))
    val t = new IcebergTable("t", dir)
    // without the opt-in the DV range still refuses (append-only contract)
    val e = intercept[IllegalArgumentException] {
      t.incremental(spark, s1, s3).collect()
    }
    assert(e.getMessage.contains("not append-only"))
    // with it: net rows = appends {9,10} ∖ in-range delete of 9 → {10};
    // the delete of pre-existing id 1 contributes nothing
    assert(t.incremental(spark, s1, s3, allowNewDeletes = true)
      .select("id").as[Long].collect().sorted.toSeq == Seq(10L))

    // rewrite (replace) commits fold too: compaction changes files,
    // not rows, so only the follow-up append emits
    IcebergMaintenance.rewriteDataFiles(spark, dir)
    val s5 = IcebergWrite.append(spark, Seq((11L, "k")).toDF("id", "v"), dir)
    assert(t.incremental(spark, s3, s5, allowNewDeletes = true)
      .select("id").as[Long].collect().sorted.toSeq == Seq(11L))
    // filters and projections compose over the fold
    assert(t.incremental(spark, s1, s3,
      ReadArgs(filters = Filters.normalize(Seq(Filter("id", ">", 5L))),
        columns = Some(Seq("id"))), allowNewDeletes = true)
      .as[Long].collect().sorted.toSeq == Seq(10L))
  }

  test("qIcebergIncr equals the second append's slice on real testdata") {
    val got = graft.queries.Wave6Queries.qIcebergIncr(spark, sf())
      .collect().map(_.getInt(0)).toSeq
    val want = graft.queries.Tables.table(spark, sf(), "nation")
      .where("n_nationkey >= 12").collect().map(_.getInt(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }
}
