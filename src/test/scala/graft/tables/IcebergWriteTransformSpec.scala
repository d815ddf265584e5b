package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Native Iceberg WRITES under non-identity partition specs
  * (`days`/`bucket`/`truncate`/...) and partition-spec EVOLUTION:
  * the writer places rows with the same transform definitions the
  * reader prunes with, each file generation prunes under its own
  * spec id, and the metadata follows the public spec's
  * partition-evolution rules (new spec id, field ids continuing
  * last-partition-id, default-spec-id moves).
  */
class IcebergWriteTransformSpec extends SparkSpec {
  import spark.implicits._

  private def meta(root: String) = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    IcebergMeta.load(fs, root)
  }

  private def tsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "ts", "v").select(
      col("id"), col("ts").cast(TimestampNTZType).as("ts"), col("v"))

  test("write under days(ts) + bucket(8,id): round trip, pruning, spec JSON") {
    val root = tempDir("icew-day").toString + "/t"
    val df = tsDf(Seq(
      (1L, "2024-01-05 01:00:00", "a"), (2L, "2024-01-05 23:00:00", "b"),
      (3L, "2024-01-06 10:00:00", "c"), (4L, "2024-01-07 00:30:00", "d")))
    IcebergWrite.append(spark, df, root, Seq("days(ts)", "bucket(8, id)"))

    val m = meta(root)
    val spec = m.specs(m.defaultSpecId)
    assert(spec.map(f => (f.name, f.transform)) ==
      Seq(("ts_day", "day"), ("id_bucket", "bucket[8]")))

    val t = new IcebergTable("t", root)
    val all = t(spark, ReadArgs.empty)
    assert(all.count() == 4)
    // source column is stored in the files (only derived fields are
    // directory-only), so a plain select works
    assert(all.select("id", "ts", "v").collect().toSet ==
      df.collect().toSet)

    // day-granular pruning: equality on ts opens only that day's files
    val eq = t(spark, ReadArgs.where(Filter("ts", "=", "2024-01-06 10:00:00")))
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(eq.inputFiles.forall(_.contains("ts_day=2024-01-06")), eq.inputFiles.toSeq)

    // bucket pruning: id equality opens only its bucket's files
    val idEq = t(spark, ReadArgs.where(Filter("id", "=", 3L)))
    assert(idEq.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val b3 = IcebergTransforms.apply(
      IcebergTransforms.Bucket(8), LongType, 3L).get
    assert(idEq.inputFiles.forall(_.contains(s"id_bucket=$b3")), idEq.inputFiles.toSeq)
  }

  test("writer bucket placement equals the spec's Appendix-B hash for every row") {
    val root = tempDir("icew-bucket").toString + "/t"
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWrite.append(spark, df, root, Seq("bucket(16, id)"))
    // every row's directory bucket == the driver-side transform of its id
    val placed = spark.read
      .option("basePath", root)
      .parquet(s"$root/data")
      .select(col("id"), col("id_bucket"))
      .collect()
    assert(placed.length == 50)
    placed.foreach { r =>
      val want = IcebergTransforms.apply(
        IcebergTransforms.Bucket(16), LongType, r.getLong(0)).get
      assert(r.getInt(1) == want, s"id ${r.getLong(0)}")
    }
    // the published vector: id 34 hashes to 2017239379 → bucket 3
    assert(placed.find(_.getLong(0) == 34L).get.getInt(1) == (2017239379 & Int.MaxValue) % 16)
  }

  test("truncate(3,v) and months(ts) write + prune; read equals input") {
    val root = tempDir("icew-trunc").toString + "/t"
    val df = tsDf(Seq(
      (1L, "2023-11-05 01:00:00", "apple"), (2L, "2023-12-05 23:00:00", "apricot"),
      (3L, "2024-01-06 10:00:00", "banana"), (4L, "2024-02-07 00:30:00", "berry")))
    IcebergWrite.append(spark, df, root, Seq("truncate(3, v)", "months(ts)"))
    val m = meta(root)
    assert(m.specs(m.defaultSpecId).map(_.transform) == Seq("truncate[3]", "month"))
    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).select("id", "ts", "v").collect().toSet ==
      df.collect().toSet)
    val ge = t(spark, ReadArgs.where(Filter("v", ">=", "b")))
    assert(ge.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(ge.inputFiles.forall(f => !f.contains("v_trunc=ap")), ge.inputFiles.toSeq)
    // months 647 (2023-12) and 646 (2023-11) prune; 648/649 stay
    val monthEq = t(spark, ReadArgs.where(Filter("ts", ">=", "2024-01-01 00:00:00")))
    assert(monthEq.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(monthEq.inputFiles.length == 2, monthEq.inputFiles.toSeq)
    assert(monthEq.inputFiles.forall(f =>
      f.contains("ts_month=648") || f.contains("ts_month=649")), monthEq.inputFiles.toSeq)
  }

  test("partition-spec evolution: identity → days(ts); both generations prune under their own spec") {
    val root = tempDir("icew-evolve").toString + "/t"
    val gen1 = tsDf(Seq(
      (1L, "2024-01-05 01:00:00", "x"), (2L, "2024-01-06 02:00:00", "y")))
    IcebergWrite.append(spark, gen1, root, Seq("v"))
    val m1 = meta(root)
    assert(m1.specs(m1.defaultSpecId).map(_.transform) == Seq("identity"))

    val gen2 = tsDf(Seq(
      (3L, "2024-01-06 10:00:00", "x"), (4L, "2024-01-07 00:30:00", "y")))
    IcebergWrite.append(spark, gen2, root, Seq("days(ts)"))

    val m2 = meta(root)
    assert(m2.specs.size == 2, m2.specs)
    val newSpec = m2.specs(m2.defaultSpecId)
    assert(newSpec.map(_.transform) == Seq("day"))
    // field ids continue from last-partition-id, not a 1000 restart
    assert(newSpec.head.fieldId == 1001, newSpec)
    assert(m2.defaultSpecId != m1.defaultSpecId)

    val t = new IcebergTable("t", root)
    val all = t(spark, ReadArgs.empty)
    assert(all.count() == 4)
    assert(all.select("id", "ts", "v").collect().toSet ==
      (gen1.collect().toSet ++ gen2.collect().toSet))

    // a ts filter prunes gen-2 files by day and keeps gen-1 files
    // (their spec can't prune it) — never drops matching rows
    val ge = t(spark, ReadArgs.where(Filter("ts", ">=", "2024-01-07 00:00:00")))
    assert(ge.collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(ge.inputFiles.count(_.contains("ts_day=")) == 1, ge.inputFiles.toSeq)
    // a v filter prunes gen-1 files by identity value
    val veq = t(spark, ReadArgs.where(Filter("v", "=", "x")))
    assert(veq.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(!veq.inputFiles.exists(_.contains("v=y")), veq.inputFiles.toSeq)

    // appending WITHOUT partitionBy adopts the current default
    // (transform) spec and reuses its id — no third spec appears
    IcebergWrite.append(spark, tsDf(Seq((5L, "2024-01-08 09:00:00", "z"))), root)
    val m3 = meta(root)
    assert(m3.specs.size == 2, m3.specs)
    assert(m3.defaultSpecId == m2.defaultSpecId)
    assert(new IcebergTable("t", root)(spark, ReadArgs.empty).count() == 5)
  }

  test("graft-written transform tables read back through the foreign-fixture reader path consistently") {
    // write with year(ts) + verify year pruning keeps floor semantics
    val root = tempDir("icew-year").toString + "/t"
    val df = tsDf(Seq(
      (1L, "1969-06-05 01:00:00", "a"), (2L, "1970-02-05 23:00:00", "b"),
      (3L, "2024-01-06 10:00:00", "c")))
    IcebergWrite.append(spark, df, root, Seq("years(ts)"))
    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).count() == 3)
    val pre = t(spark, ReadArgs.where(Filter("ts", "<", "1970-01-01 00:00:00")))
    assert(pre.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the year-granular transform may-match would keep the boundary
    // year-0 file conservatively, but r10's MANIFEST TS BOUNDS prune
    // it exactly (its min ts is 1970-02-05 ≥ the probe): only the
    // pre-epoch file (year ordinal floors to -1) opens
    assert(pre.inputFiles.length == 1, pre.inputFiles.toSeq)
    assert(pre.inputFiles.exists(_.contains("ts_year=-1")), pre.inputFiles.toSeq)
    assert(!pre.inputFiles.exists(_.contains("ts_year=54")), pre.inputFiles.toSeq)
  }
}
