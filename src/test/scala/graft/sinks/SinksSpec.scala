package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1L to 5000L).map(i => (i, s"g${i % 4}", s"payload-$i"))
    .toDF("id", "grp", "payload")

  test("writePartitioned lays out hive directories that prune") {
    val path = tempDir("sink").toString + "/p"
    Sinks.writePartitioned(data, path, Seq("grp"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("grp=g0", "grp=g1", "grp=g2", "grp=g3"))
    val pruned = spark.read.parquet(path).where(col("grp") === "g1")
    assert(pruned.count() == 1250)
  }

  test("writeBucketed produces a shuffle-free self-join") {
    Sinks.writeBucketed(data, "sink_bucketed", Seq("id"), numBuckets = 4)
    val t = spark.table("sink_bucketed")
    val plan = t.as("a").join(t.as("b"), "id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join shuffled:\n$plan")
    spark.sql("DROP TABLE sink_bucketed")
  }

  test("writeSized bounds output file count") {
    val path = tempDir("sink").toString + "/s"
    Sinks.writeSized(data, path, targetFileBytes = 1L << 30)
    val files = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1) // tiny data, one target-size file
    assert(spark.read.parquet(path).count() == 5000)
  }
}
