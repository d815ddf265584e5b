package graft.sinks

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Point-lookup parquet: bloom filters land in the footers, answer
  * membership correctly, and reads with equality probes stay exact.
  */
class BloomSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeWithBloomFilters puts a working bloom filter in the footer") {
    val dir = tempDir("bloom").toString + "/t"
    val ids = (0L until 5000L).map(i => (i * 7L, s"v$i"))
    Sinks.writeWithBloomFilters(ids.toDF("id", "v").coalesce(1), dir,
      Map("id" -> 5000L))

    val conf = spark.sparkContext.hadoopConfiguration
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.toString), conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cc = block.getColumns.asScala
        .find(_.getPath.toDotString == "id").get
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
      assert(bloom != null, "no bloom filter written for id")
      // every present value answers "might contain"
      Seq(0L, 7L, 4900L * 7L).foreach { v =>
        assert(bloom.findHash(bloom.hash(v)), s"present value $v reported absent")
      }
      // absent values mostly answer "definitely not" (allow the
      // bloom's false-positive rate, but 100 misses all passing would
      // mean the filter is degenerate)
      val absentHits = (1L to 100L).count(i => bloom.findHash(bloom.hash(i * 7L + 3L)))
      assert(absentHits < 20, s"$absentHits/100 absent values reported present")
      // the un-bloomed column has no filter
      val vcc = block.getColumns.asScala.find(_.getPath.toDotString == "v").get
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(vcc) == null)
    } finally reader.close()

    // equality probes through Spark read stay exact
    val got = spark.read.parquet(dir).where($"id" === 49L).as[(Long, String)].collect()
    assert(got.toSeq == Seq((49L, "v7")))
    assert(spark.read.parquet(dir).where($"id" === 50L).count() == 0L)
  }

  test("refusals: unknown column, empty spec") {
    val df = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Sinks.writeWithBloomFilters(df, tempDir("bloom-bad").toString, Map("nope" -> 10L))
    }
    intercept[IllegalArgumentException] {
      Sinks.writeWithBloomFilters(df, tempDir("bloom-bad2").toString, Map.empty)
    }
  }
}
