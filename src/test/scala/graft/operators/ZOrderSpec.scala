package graft.operators

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaLog, DeltaTable, DeltaWrite, ReadArgs}
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("SearchSorted matches the declarative bucket count on boundary edges") {
    val bounds = Array(1.0, 2.5, 2.5, 7.0) // duplicate boundary = empty bucket
    val vals = Seq(0.0, 1.0, 1.5, 2.5, 3.0, 7.0, 9.0)
    val df = vals.toDF("v")
    val native = df.select(ZOrder.bucketOf(col("v"), bounds).as("b"))
      .as[Int].collect().toSeq
    val declarative = df.select(
      size(filter(lit(bounds), b => b <= col("v"))).as("b"))
      .as[Int].collect().toSeq
    assert(native == declarative)
    assert(native == Seq(0, 1, 1, 3, 3, 4, 4))
  }

  test("interleave places bit i of column c at position i*ncols+c") {
    // a=3 (0b11), b=1 (0b01), bits=2: z = a0<<0 | b0<<1 | a1<<2 | b1<<3
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[Long].head()
    assert(z == (1L | (1L << 1) | (1L << 2)))
  }

  test("zvalue is monotone within each dimension when the other is fixed") {
    val df = (0 until 1024).map(i => (i.toLong, 512L)).toDF("a", "b")
    val zs = df.select(col("a"), ZOrder.zvalue(df, Seq("a", "b"), bits = 4).as("z"))
      .orderBy("a").as[(Long, Long)].collect()
    zs.sliding(2).foreach { case Array((_, z1), (_, z2)) => assert(z1 <= z2) }
  }

  test("OPTIMIZE ZORDER makes multi-column box filters prune files") {
    val dir = tempDir("delta-z").toString + "/t"
    // two independent uniform dims, written in RANDOM order across 8
    // files — every file's (a, b) min/max spans the whole space
    val n = 40000
    val df = (0 until n).map { i =>
      val a = (i * 2654435761L) % 1000 // pseudo-random permutation
      val b = (i * 40503L + 7) % 1000
      (i.toLong, a, b)
    }.toDF("id", "a", "b").repartition(8)
    DeltaWrite.append(spark, df, dir)

    val box = Filters.normalize(Seq(
      Filter("a", ">=", 100L), Filter("a", "<=", 160L),
      Filter("b", ">=", 200L), Filter("b", "<=", 260L)))
    val t = new DeltaTable("t", dir)
    val before = t(spark, ReadArgs(filters = box))
    val beforeFiles = before.inputFiles.length
    val expected = before.select("id").as[Long].collect().sorted.toSeq
    assert(beforeFiles == 8, s"random layout should leave all files in play, got $beforeFiles")

    // rewrite clustered on (a, b) at roughly the same file count
    val total = DeltaLog.snapshot(spark, dir).files.map(_.size).sum
    DeltaWrite.optimizeZorder(spark, dir, Seq("a", "b"),
      targetFileBytes = math.max(1L, total / 8), bits = 6)

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.files.length >= 4, s"expected a multi-file layout, got ${snap.files.length}")
    val after = t(spark, ReadArgs(filters = box))
    // identical rows…
    assert(after.select("id").as[Long].collect().sorted.toSeq == expected)
    // …from far fewer files: a ~6%×6% box on a z-ordered layout
    assert(after.inputFiles.length < beforeFiles / 2,
      s"z-order should prune the box scan: ${after.inputFiles.length} of ${snap.files.length}")
  }

  test("incremental ZORDER rewrites only unclustered files; tags survive checkpoints") {
    val dir = tempDir("delta-zi").toString + "/t"
    def batch(lo: Int, hi: Int) = (lo until hi).map { i =>
      ((i * 2654435761L) % 1000, (i * 40503L + 7) % 1000)
    }.toDF("a", "b").repartition(4)

    DeltaWrite.append(spark, batch(0, 10000), dir)
    DeltaWrite.optimizeZorder(spark, dir, Seq("a", "b"), bits = 6, incremental = true)
    val clustered1 = DeltaLog.snapshot(spark, dir).files
    assert(clustered1.forall(_.tags.contains("graft.zorder")),
      "first incremental run must cluster (and tag) everything")

    // idempotence: nothing left to cluster → no new commit
    val v1 = DeltaLog.snapshot(spark, dir).version
    DeltaWrite.optimizeZorder(spark, dir, Seq("a", "b"), bits = 6, incremental = true)
    assert(DeltaLog.snapshot(spark, dir).version == v1, "no-op must not commit")

    // new ingest arrives unclustered
    DeltaWrite.append(spark, batch(10000, 20000), dir)
    val afterIngest = DeltaLog.snapshot(spark, dir).files
    assert(afterIngest.exists(f => !f.tags.contains("graft.zorder")))

    DeltaWrite.optimizeZorder(spark, dir, Seq("a", "b"), bits = 6, incremental = true)
    val snap2 = DeltaLog.snapshot(spark, dir)
    // previously clustered files are untouched — steady-state cost is
    // proportional to NEW data only
    val keptPaths = snap2.files.map(_.path).toSet
    assert(clustered1.forall(f => keptPaths.contains(f.path)),
      "incremental run must not rewrite already-clustered files")
    assert(snap2.files.forall(_.tags.contains("graft.zorder")))

    // a different spec invalidates the tags → full rewrite
    DeltaWrite.optimizeZorder(spark, dir, Seq("b", "a"), bits = 6, incremental = true)
    val snap3 = DeltaLog.snapshot(spark, dir)
    assert(snap3.files.forall(_.tags.get("graft.zorder").contains("b,a:6")))
    assert(!snap3.files.map(_.path).toSet.exists(clustered1.map(_.path).toSet),
      "spec change must re-cluster everything")

    // tags must survive a checkpoint + aged-out JSON prefix
    DeltaWrite.checkpoint(spark, dir)
    val logFs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to DeltaLog.snapshot(spark, dir).version).foreach { v =>
      logFs.delete(new org.apache.hadoop.fs.Path(
        DeltaLog.logDir(dir), f"$v%020d.json"), false)
    }
    val replayed = DeltaLog.snapshot(spark, dir)
    assert(replayed.files.nonEmpty &&
      replayed.files.forall(_.tags.get("graft.zorder").contains("b,a:6")),
      "checkpoint replay must preserve clustering tags")
    // …and the incremental run after replay is still a no-op
    val vCp = replayed.version
    DeltaWrite.optimizeZorder(spark, dir, Seq("b", "a"), bits = 6, incremental = true)
    assert(DeltaLog.snapshot(spark, dir).version == vCp)
  }

  test("zorder refuses partition columns and unknown columns") {
    val dir = tempDir("delta-zr").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "x", 2L)).toDF("id", "p", "v"), dir, partitionBy = Seq("p"))
    assertThrows[IllegalArgumentException] {
      DeltaWrite.optimizeZorder(spark, dir, Seq("p"))
    }
    assertThrows[IllegalArgumentException] {
      DeltaWrite.optimizeZorder(spark, dir, Seq("nope"))
    }
  }
}
