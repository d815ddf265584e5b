package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VARIANT columns in Delta tables (`variantType` table feature, per
  * the public protocol) + schema-derived feature declaration for
  * `timestampNtz`: the protocol must gate foreign readers that cannot
  * decode the physical encodings.
  */
class DeltaVariantSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)

  test("variant column round-trips; first commit declares the variantType feature") {
    val dir = tempDir("delta-var").toString + "/t"
    val df = Seq(
      (1L, """{"a":1,"nest":{"b":"x"}}"""),
      (2L, """{"a":2,"nest":{"b":"y"}}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    DeltaWrite.append(spark, df, dir)

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minReaderVersion == 3 && snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    assert(snap.protocol.writerFeatures.exists(_.contains("variantType")))
    // legacy-implied writer features survive the feature-protocol jump
    assert(snap.protocol.writerFeatures.exists(_.contains("appendOnly")))

    val got = t(dir)(spark, ReadArgs())
      .select(col("id"),
        variant_get(col("v"), "$.a", "bigint").as("a"),
        variant_get(col("v"), "$.nest.b", "string").as("b"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "x"), (2L, 2L, "y")))
  }

  test("evolving a variant column onto an existing table upgrades the protocol in the same commit") {
    val dir = tempDir("delta-var-evolve").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "s"), dir)
    assert(DeltaLog.snapshot(spark, dir).protocol.minReaderVersion == 1)

    DeltaWrite.append(spark,
      Seq((2L, "b", """{"k":9}"""))
        .toDF("id", "s", "js")
        .select(col("id"), col("s"), parse_json(col("js")).as("v")),
      dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minReaderVersion == 3)
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    assert(snap.protocol.writerFeatures.exists(_.contains("variantType")))
    // pre-evolution rows read the evolved column as null
    val got = t(dir)(spark, ReadArgs())
      .select(col("id"), variant_get(col("v"), "$.k", "bigint").as("k"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got == Set((1L, None), (2L, Some(9L))))
  }

  test("timestamp_ntz schema declares the timestampNtz feature on first commit") {
    val dir = tempDir("delta-ntz").toString + "/t"
    val df = Seq((1L, "2024-05-06T07:08:09"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))
    DeltaWrite.append(spark, df, dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minReaderVersion == 3)
    assert(snap.protocol.readerFeatures.exists(_.contains("timestampNtz")))
    val got = t(dir)(spark, ReadArgs()).select(col("ts").cast("string")).as[String].head()
    assert(got == "2024-05-06 07:08:09")
  }

  test("variant columns are excluded from file stats but numRecords still lands") {
    val dir = tempDir("delta-var-stats").toString + "/t"
    val df = Seq((1L, """{"a":1}"""), (2L, """{"a":2}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    DeltaWrite.append(spark, df.coalesce(1), dir)
    val stats = DeltaLog.snapshot(spark, dir).files.head.stats.get
    assert(stats.contains("\"numRecords\":2"))
    assert(stats.contains("\"id\"") && !stats.contains("\"v\""))
  }

  test("checkpoint + replay preserve the variant protocol and data") {
    val dir = tempDir("delta-var-cp").toString + "/t"
    val df = Seq((1L, """{"a":5}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    DeltaWrite.append(spark, df, dir)
    DeltaWrite.append(spark,
      Seq((2L, """{"a":6}""")).toDF("id", "js")
        .select(col("id"), parse_json(col("js")).as("v")), dir)
    DeltaWrite.checkpoint(spark, dir)
    DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    val got = t(dir)(spark, ReadArgs())
      .select(variant_get(col("v"), "$.a", "bigint")).as[Long].collect().toSet
    assert(got == Set(5L, 6L))
  }
}
