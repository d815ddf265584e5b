package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))

  test("bucketized range join equals the naive range predicate") {
    val points = Seq((1L, ts(10), "a"), (1L, ts(500), "b"), (1L, ts(9999), "c"),
      (2L, ts(100), "d")).toDF("key", "ts", "tag")
    val intervals = Seq((1L, ts(0), ts(600), "i1"), (1L, ts(9000), ts(10000), "i2"),
      (2L, ts(5000), ts(6000), "i3")).toDF("key", "s", "e", "ival")

    val bucketized = RangeJoin.pointInInterval(points, intervals, "key", "ts", "s", "e",
      bucketWidthUs = 300L * 1000000)
      .select("tag", "ival").as[(String, String)].collect().toSet
    val naive = points.join(intervals, Seq("key"))
      .where(col("ts") >= col("s") && col("ts") <= col("e"))
      .select("tag", "ival").as[(String, String)].collect().toSet

    assert(bucketized == naive)
    assert(bucketized == Set(("a", "i1"), ("b", "i1"), ("c", "i2")))
  }

  test("interval boundaries are inclusive") {
    val points = Seq((1L, ts(100), "edge")).toDF("key", "ts", "tag")
    val intervals = Seq((1L, ts(100), ts(100), "i")).toDF("key", "s", "e", "ival")
    val got = RangeJoin.pointInInterval(points, intervals, "key", "ts", "s", "e", 1000000L)
    assert(got.count() == 1)
  }

  test("intervalOverlap equals the naive overlap predicate, one row per pair") {
    val left = Seq(
      (1L, 0L, 250L, "a"),      // spans 3 buckets at width 100
      (1L, 300L, 310L, "b"),
      (2L, -150L, -40L, "neg"), // negative bounds: floor alignment
      (1L, 900L, 950L, "lone")).toDF("key", "ls", "le", "ltag")
    val right = Seq(
      (1L, 200L, 400L, "x"),    // overlaps a (200-250) and b fully
      (1L, 260L, 280L, "y"),    // shares a's bucket 2, no overlap
      (2L, -60L, 10L, "z")      // overlaps neg at [-60,-40]
    ).toDF("key", "rs", "re", "rtag")

    val got = RangeJoin.intervalOverlap(left, right, "key",
      "ls", "le", "rs", "re", bucketWidth = 100L)
      .select("ltag", "rtag").as[(String, String)].collect().toSeq
    // exactly once per pair even when the overlap spans several buckets
    assert(got.sorted == Seq(("a", "x"), ("b", "x"), ("neg", "z")).sorted)

    val naive = left.join(right, Seq("key"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    assert(got.toSet == naive)

    // shared non-key columns refuse (ambiguous bounds)
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(left, left.withColumnRenamed("ltag", "t2"),
        "key", "ls", "le", "ls", "le", 100L)
    }
  }
}

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses small files and preserves the data") {
    val dir = tempDir("compact").toString + "/t"
    val df = (1L to 10000L).map(i => (i, s"payload-$i")).toDF("id", "payload")
    df.repartition(40).write.mode("overwrite").parquet(dir)

    val before = spark.read.parquet(dir)
    val sumBefore = before.agg(sum("id")).as[Long].head()

    val result = Maintenance.compactParquet(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(result.filesBefore == 40)
    assert(result.filesAfter < 40)

    val after = spark.read.parquet(dir)
    assert(after.count() == 10000)
    assert(after.agg(sum("id")).as[Long].head() == sumBefore)
    // verified backup is cleaned up after the swap
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_tmp")))
  }

  test("compaction verifies before swapping; live data survives a bad rewrite") {
    val dir = tempDir("compact-bad").toString + "/t"
    val df = (1L to 100L).map(i => (i, s"p-$i")).toDF("id", "payload")
    df.repartition(4).write.mode("overwrite").parquet(dir)

    // a row-dropping rewrite must be caught by the verify gate BEFORE
    // the live directory is touched
    intercept[IllegalStateException] {
      Maintenance.compactParquet(spark, dir, rewrite = _.where(col("id") > 50))
    }
    assert(spark.read.parquet(dir).count() == 100) // live data untouched
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_tmp")))

    // a row-preserving clustering rewrite passes
    val result = Maintenance.compactParquet(spark, dir,
      rewrite = _.sortWithinPartitions("id"))
    assert(result.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == 100)
  }
}

class HllMergeSpec extends SparkSpec {
  import spark.implicits._

  test("HLL sketches merge: union of per-group sketches ~= global distinct") {
    val df = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    // two-level rollup: sketch per status, then union to a global estimate
    val perStatus = df.groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perStatus.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    val exact = df.select(countDistinct("o_custkey")).as[Long].head()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
  }
}
