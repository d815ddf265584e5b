package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Dev probe: how does Spark 4 serialize collated string fields in
  * schema JSON, and does DataType.fromJson round-trip them?
  */
object CollationProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val collated = StringType("UTF8_LCASE")
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", collated),
      StructField("nested", StructType(Seq(StructField("t", StringType("UNICODE_CI")))))))
    val json = schema.json
    println(s"[probe] json: $json")
    val back = DataType.fromJson(json).asInstanceOf[StructType]
    println(s"[probe] roundtrip equal: ${back == schema}")
    println(s"[probe] s type: ${back("s").dataType}; collation: " +
      back("s").dataType.asInstanceOf[StringType].typeName)
    val df = spark.sql("SELECT collate('A', 'UTF8_LCASE') AS s")
    println(s"[probe] df schema json: ${df.schema.json}")
    spark.stop()
  }
}
