package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IcebergSortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def shuffled(ids: Seq[Long]) =
    new scala.util.Random(7).shuffle(ids).map(i => (i, s"v$i")).toDF("id", "v")

  private def metaJson(root: String) = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = IcebergMeta.currentVersion(fs, root)
    val in = fs.open(new org.apache.hadoop.fs.Path(root, s"metadata/v$v.metadata.json"))
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
  }

  private def fileIds(f: String): Seq[Long] =
    spark.read.parquet(f).coalesce(1).select("id").as[Long].collect().toSeq

  test("sortBy declares a default sort order; later appends honor it") {
    val root = tempDir("ice-sort").toString + "/t"
    IcebergWrite.append(spark, shuffled(0L until 50L).repartition(1),
      root, sortBy = Seq("id"))

    val m1 = metaJson(root)
    assert(m1.path("default-sort-order-id").asInt() == 1)
    val order = IcebergMeta.elements(m1.path("sort-orders"))
      .find(_.path("order-id").asInt() == 1).get
    val f = order.path("fields").get(0)
    assert(f.path("transform").asText() == "identity" &&
      f.path("direction").asText() == "asc" &&
      f.path("null-order").asText() == "nulls-first")

    val t = new IcebergTable("t", root)
    val files1 = t(spark, ReadArgs.empty).inputFiles
    assert(files1.length == 1)
    assert(fileIds(files1.head) == (0L until 50L), "first append not sorted")

    // NO flag on the second append — the declared default applies
    IcebergWrite.append(spark, shuffled(100L until 150L).repartition(1), root)
    val files2 = t(spark, ReadArgs.empty).inputFiles.filterNot(files1.contains)
    assert(files2.length == 1)
    assert(fileIds(files2.head) == (100L until 150L), "declared order not honored")
    // re-declaring the same order reuses its id
    IcebergWrite.append(spark, shuffled(200L until 210L).repartition(1),
      root, sortBy = Seq("id"))
    assert(IcebergMeta.elements(metaJson(root).path("sort-orders")).size == 2)
  }

  test("unknown sort columns refuse") {
    val root = tempDir("ice-sort-bad").toString + "/t"
    intercept[IllegalArgumentException] {
      IcebergWrite.append(spark, shuffled(0L until 5L), root, sortBy = Seq("nope"))
    }
  }
}
