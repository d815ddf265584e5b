package graft.tables

import graft.SparkSpec
import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class IcebergZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z-ordered rewrite lays rows on the Morton curve with full data parity") {
    val dir = tempDir("ice-zorder").toString + "/t"
    val rows = for { a <- 0 until 16; b <- 0 until 16 }
      yield ((a * 16 + b).toLong, a, b)
    IcebergWrite.append(spark, rows.toDF("id", "a", "b"), dir)
    IcebergMaintenance.rewriteDataFiles(spark, dir, zorderBy = Seq("a", "b"))

    val read = new IcebergTable("t", dir)(spark, ReadArgs.empty).select("id", "a", "b")
    assert(read.as[(Long, Int, Int)].collect().toSet == rows.toSet)

    val files = read.inputFiles
    assert(files.length == 1, files.toSeq)
    val inFile = spark.read.parquet(files.head).coalesce(1)
    val zs = inFile.withColumn("_z", ZOrder.zvalue(inFile, Seq("a", "b")))
      .select("_z").as[Long].collect()
    assert(zs.length == 256)
    assert(zs.sliding(2).forall { case Array(x, y) => x <= y; case _ => true },
      s"file not z-sorted: ${zs.take(20).toSeq} ...")
    val ab = inFile.select("a", "b").as[(Int, Int)].collect().toSeq
    assert(ab != ab.sortBy(identity), "zorderBy produced a lexicographic layout")
  }

  test("scoped z-ordered rewrite: only the selected partition re-sorts") {
    import graft.core.{Filter, Filters}
    val dir = tempDir("ice-zorder-s").toString + "/t"
    val rows = for { p <- 0 until 2; a <- 0 until 8; b <- 0 until 8 }
      yield ((p * 64 + a * 8 + b).toLong, a, b, p)
    // two appends so the target partition has something to compact
    IcebergWrite.append(spark, rows.filter(_._1 % 2 == 0L).toDF("id", "a", "b", "p"),
      dir, Seq("p"))
    IcebergWrite.append(spark, rows.filter(_._1 % 2 == 1L).toDF("id", "a", "b", "p"),
      dir, Seq("p"))
    IcebergMaintenance.rewriteDataFiles(spark, dir,
      where = Filters.normalize(Seq(Filter("p", "=", 0))),
      zorderBy = Seq("a", "b"))
    val read = new IcebergTable("t", dir)(spark, ReadArgs.empty)
    assert(read.select("id").as[Long].collect().toSet == rows.map(_._1).toSet)
    val p0Files = new IcebergTable("t", dir)(
      spark, ReadArgs.where(Filter("p", "=", 0))).inputFiles
    assert(p0Files.length == 1, p0Files.toSeq)
    val zs = spark.read.parquet(p0Files.head).coalesce(1)
      .withColumn("_z", ZOrder.zvalue(
        spark.read.parquet(p0Files.head), Seq("a", "b")))
      .select("_z").as[Long].collect()
    assert(zs.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
  }
}
