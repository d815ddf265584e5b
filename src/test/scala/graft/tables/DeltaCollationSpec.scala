package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Collated Delta schema columns, per the public collated-strings
  * preview: the collation rides the schema's `__COLLATIONS` field
  * metadata (exactly what Spark 4's StructType.json emits), gated by
  * the `collations-preview` WRITER feature — the reader protocol
  * stays down because the physical encoding is a plain string.
  */
class DeltaCollationSpec extends SparkSpec {
  import spark.implicits._

  private val Lcase = StringType("UTF8_LCASE")

  private def collatedDf: DataFrame =
    Seq((1L, "Alpha"), (2L, "ALPHA"), (3L, "beta")).toDF("id", "name")
      .select(col("id"), col("name").cast(Lcase).as("name"))

  test("collated column declares the writer feature; readers stay v1") {
    val dir = tempDir("coll").toString + "/t"
    DeltaWrite.append(spark, collatedDf, dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minReaderVersion == 1,
      s"collations must not raise the reader protocol: ${snap.protocol}")
    assert(snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.writerFeatures.exists(_.contains("collations-preview")))
    // schemaString round-trips the collation (__COLLATIONS metadata)
    assert(snap.metadata.schemaString.contains("__COLLATIONS"))
    assert(snap.metadata.schema("name").dataType == Lcase)
  }

  test("reads honor the declared collation (case-insensitive grouping)") {
    val dir = tempDir("coll-read").toString + "/t"
    DeltaWrite.append(spark, collatedDf, dir)
    val t = new DeltaTable("t", dir)
    val grouped = t(spark, ReadArgs())
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    // Alpha and ALPHA collapse under UTF8_LCASE; beta stands alone
    assert(grouped == Seq(1L, 2L), s"grouping was not collation-aware: $grouped")
  }

  test("collated columns are excluded from min/max file stats") {
    val dir = tempDir("coll-stats").toString + "/t"
    DeltaWrite.append(spark, collatedDf, dir)
    val stats = DeltaLog.snapshot(spark, dir).files.flatMap(_.stats)
    assert(stats.nonEmpty)
    stats.foreach { s =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      // binary min/max on a collated column would let file skipping
      // prune rows a collation-aware predicate still matches
      assert(!node.path("minValues").has("name"), s)
      assert(node.path("minValues").has("id"), s)
      assert(node.path("numRecords").asLong() > 0)
    }
  }

  test("schema evolution onto a plain table upgrades the writer protocol only") {
    val dir = tempDir("coll-evolve").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "x")).toDF("id", "v"), dir)
    assert(DeltaLog.snapshot(spark, dir).protocol.minWriterVersion == 2)
    // evolve: add a collated column
    val evolved = Seq((2L, "y", "Tag")).toDF("id", "v", "tag")
      .select(col("id"), col("v"), col("tag").cast(Lcase).as("tag"))
    DeltaWrite.append(spark, evolved, dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minReaderVersion == 1, snap.protocol.toString)
    assert(snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.writerFeatures.exists(_.contains("collations-preview")))
    assert(snap.metadata.schema("tag").dataType == Lcase)
    // both batches read; pre-evolution rows see null tag
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).count() == 2)
  }

  test("collated partition columns refuse") {
    val dir = tempDir("coll-part").toString + "/t"
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, collatedDf, dir, partitionBy = Seq("name"))
    }
    assert(e.getMessage.contains("collation"))
  }

  test("second append does not re-emit the protocol") {
    val dir = tempDir("coll-again").toString + "/t"
    DeltaWrite.append(spark, collatedDf, dir)
    DeltaWrite.append(spark, collatedDf, dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == 1L)
    assert(snap.protocol.writerFeatures.exists(_.contains("collations-preview")))
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).count() == 6)
  }
}
