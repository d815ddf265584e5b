package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Hudi ADDITIVE schema evolution: data-bearing commits record the
  * writer's Avro schema in commit metadata (upstream's `schema` key),
  * snapshot reads widen to the declared schema so pre-evolution files
  * null-fill instead of silently dropping columns, COW upserts
  * null-fill rewritten groups, MOR log upserts carry the new column
  * in the log writer schema, and narrowing frames refuse loudly.
  */
class HudiEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def read(dir: String) =
    new HudiTable("t", dir)(spark, ReadArgs.empty)

  test("commits record the writer schema; latestTableSchema round-trips types") {
    val dir = tempDir("hudi-evo-schema").toString + "/t"
    val df = Seq((1L, "a", java.sql.Date.valueOf("2026-01-01"), BigDecimal("1.50")))
      .toDF("id", "v", "d", "m")
      .select(col("id"), col("v"), col("d"), col("m").cast("decimal(10,2)").as("m"))
    HudiWrite.bulkInsert(spark, df, dir, "id")
    val declared = HudiWrite.latestTableSchema(fsOf(dir), dir)
    assert(declared.nonEmpty)
    val byName = declared.get.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(byName == Map("id" -> "bigint", "v" -> "string",
      "d" -> "date", "m" -> "decimal(10,2)"))
    assert(!declared.get.fieldNames.exists(_.startsWith("_hoodie")))
  }

  test("COW upsert ADDS a column: untouched groups read null-filled, rewritten groups too") {
    val dir = tempDir("hudi-evo-cow").toString + "/t"
    // two partitions → two file groups; the upsert touches only part=0
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    HudiWrite.upsert(spark,
      Seq((1L, "A", 0, 10L), (9L, "new", 0, 90L)).toDF("id", "v", "part", "score"), dir)
    val got = read(dir).select("id", "v", "part", "score")
      .as[(Long, String, Int, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, "A", 0, Some(10L)),   // updated row carries the new column
      (2L, "b", 0, None),        // survivor of the rewritten group: null-filled
      (3L, "c", 1, None),        // UNTOUCHED group: declared-schema read widens it
      (9L, "new", 0, Some(90L))))
    // the declared schema now carries the new column
    val declared = HudiWrite.latestTableSchema(fsOf(dir), dir).get
    assert(declared.fieldNames.contains("score"))
  }

  test("MOR log upsert ADDS a column; merged read serves it; compaction preserves it") {
    val dir = tempDir("hudi-evo-mor").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((2L, "B", 7L)).toDF("id", "v", "score"), dir)
    def state() = read(dir).select("id", "v", "score")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(state() == Set((1L, "a", None), (2L, "B", Some(7L))))
    // compaction folds the evolved log into evolved base files
    assert(HudiWrite.compact(spark, dir).nonEmpty)
    assert(state() == Set((1L, "a", None), (2L, "B", Some(7L))))
  }

  test("a frame MISSING a table column refuses loudly (COW and MOR)") {
    for (tt <- Seq("COPY_ON_WRITE", "MERGE_ON_READ")) {
      val dir = tempDir(s"hudi-evo-narrow-$tt").toString + "/t"
      HudiWrite.bulkInsert(spark,
        Seq((1L, "a", 5L)).toDF("id", "v", "score"), dir, "id", tableType = tt)
      val e = intercept[IllegalArgumentException] {
        HudiWrite.upsert(spark, Seq((1L, "A")).toDF("id", "v"), dir)
      }
      assert(e.getMessage.contains("missing table column"), e.getMessage)
      assert(e.getMessage.contains("score"), e.getMessage)
    }
  }

  test("tables without a recorded schema keep the sampled-footer read (foreign fallback)") {
    val dir = tempDir("hudi-evo-foreign").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")
    // simulate a foreign writer: strip the schema key from every commit
    val fs = fsOf(dir)
    val hoodie = new Path(dir, ".hoodie")
    fs.listStatus(hoodie).filter(_.getPath.getName.endsWith(".commit")).foreach { st =>
      val in = fs.open(st.getPath)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(txt).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val em = root.path("extraMetadata")
      em match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode => o.remove("schema")
        case _ =>
      }
      val out = fs.create(st.getPath, true)
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    }
    assert(HudiWrite.latestTableSchema(fs, dir).isEmpty)
    assert(read(dir).select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
  }

  test("the changelog across an evolution still replays (widest-schema union)") {
    val dir = tempDir("hudi-evo-chg").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a")).toDF("id", "v"), dir, "id", tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A", 3L)).toDF("id", "v", "score"), dir)
    val chg = new HudiTable("t", dir).changes(spark, i1)
      .select(col("id").as[Long], col("score").as[Option[Long]],
        col(HudiTable.ChangeTypeCol).as[String]).collect().toSet
    assert(chg == Set((1L, None, "delete"), (1L, Some(3L), "insert")))
  }
}
