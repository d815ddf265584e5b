package graft.tables

import graft.SparkSpec
import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class HudiZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder clustering lays rows on the Morton curve with full data parity") {
    val dir = tempDir("hudi-zorder").toString + "/t"
    val rows = for { a <- 0 until 16; b <- 0 until 16 }
      yield ((a * 16 + b).toLong, a, b)
    val df = rows.toDF("id", "a", "b")
    HudiWrite.bulkInsert(spark, df, dir, "id")
    HudiWrite.cluster(spark, dir, Seq("a", "b"), zorder = true)

    val table = new HudiTable("t", dir)
    val read = table(spark, ReadArgs.empty).select("id", "a", "b")
    assert(read.as[(Long, Int, Int)].collect().toSet == rows.toSet)

    // the clustered base file holds rows in z order: recompute the
    // z-value over the same rows and assert file order is monotone
    val files = read.inputFiles
    assert(files.length == 1, files.toSeq)
    val inFile = spark.read.parquet(files.head).coalesce(1)
    val z = ZOrder.zvalue(inFile, Seq("a", "b"))
    val zs = inFile.withColumn("_z", z).select("_z").as[Long].collect()
    assert(zs.length == 256)
    assert(zs.sliding(2).forall { case Array(x, y) => x <= y; case _ => true },
      s"file not z-sorted: ${zs.take(20).toSeq} ...")
    // and NOT plain-lexicographically sorted by (a, b) — z order is a
    // different curve (guards against the flag silently no-opping)
    val ab = inFile.select("a", "b").as[(Int, Int)].collect().toSeq
    assert(ab != ab.sortBy(identity), "zorder=true produced a lexicographic layout")
  }
}
