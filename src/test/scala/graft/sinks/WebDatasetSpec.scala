package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WebDataset tar shards: round trip, deterministic bytes, shard
  * assignment parity with the portable hash, interop with GNU tar,
  * and refusal semantics.
  */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha text", "web"),
    (2L, "beta", "books"),
    (3L, "gamma gamma", "web"),
    (4L, "delta", "code"),
    (5L, "epsilon!", "web"),
    (6L, "zeta", "books")
  ).toDF("doc_id", "text", "source")

  test("round trip: every non-null entry comes back with its bytes") {
    val dir = tempDir("wds").toString
    WebDataset.writeShards(docs, dir, "doc_id",
      Seq("txt" -> "text", "src" -> "source"), numShards = 3)
    val back = WebDataset.readShards(spark, dir)
      .select(col("shard"), col("key"), col("ext"), col("payload").cast("string"))
      .as[(Int, String, String, String)].collect().toSet
    val expect = docs.select(
      Sinks.shardOf(col("doc_id"), 3).as("s"),
      col("doc_id").cast("string"), col("text"), col("source"))
      .as[(Int, String, String, String)].collect()
      .flatMap { case (s, k, t, src) => Seq((s, k, "txt", t), (s, k, "src", src)) }
      .toSet
    assert(back == expect)
  }

  test("tar bytes are deterministic and shards are dense") {
    val dir1 = tempDir("wds-a").toString
    val dir2 = tempDir("wds-b").toString
    WebDataset.writeShards(docs, dir1, "doc_id", Seq("txt" -> "text"), 4)
    WebDataset.writeShards(docs.repartition(5), dir2, "doc_id", Seq("txt" -> "text"), 4)
    def digests(d: String): Seq[(String, String)] =
      new java.io.File(d).listFiles().toSeq
        .filter(_.getName.endsWith(".tar")).sortBy(_.getName).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }
    val (d1, d2) = (digests(dir1), digests(dir2))
    // dense 0..3 even if some shard is empty; byte-identical across
    // input partitionings
    assert(d1.map(_._1) == (0 until 4).map(i => f"shard-$i%06d.tar"))
    assert(d1 == d2)
  }

  test("a sample may lack a modality: NULL payloads are skipped, not written") {
    val dir = tempDir("wds-null").toString
    val withNull = Seq((1L, Some("has text"), Option.empty[String]),
      (2L, Some("both"), Some("meta"))).toDF("id", "text", "meta")
    WebDataset.writeShards(withNull, dir, "id",
      Seq("txt" -> "text", "json" -> "meta"), 1)
    val back = WebDataset.readShards(spark, dir)
      .select("key", "ext").as[(String, String)].collect().toSet
    assert(back == Set(("1", "txt"), ("2", "txt"), ("2", "json")))
  }

  test("GNU tar reads the shards (format interop)") {
    val dir = tempDir("wds-gnu").toString
    WebDataset.writeShards(docs, dir, "doc_id", Seq("txt" -> "text"), 1)
    import scala.sys.process._
    val listed = Seq("tar", "-tf", s"$dir/shard-000000.tar").!!.trim
      .split("\n").toSeq.sorted
    assert(listed == (1 to 6).map(i => s"$i.txt").sorted)
    // extraction returns the exact payload
    val out = tempDir("wds-x").toString
    assert(Seq("tar", "-xf", s"$dir/shard-000000.tar", "-C", out).! == 0)
    val got = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "1.txt")), "UTF-8")
    assert(got == "alpha text")
  }

  test("within-shard order is the portable shuffle hash (loader-visible order)") {
    val dir = tempDir("wds-ord").toString
    WebDataset.writeShards(docs, dir, "doc_id", Seq("txt" -> "text"), 1)
    import scala.sys.process._
    val names = Seq("tar", "-tf", s"$dir/shard-000000.tar").!!.trim.split("\n").toSeq
    val expect = docs.select(col("doc_id").cast("string"),
      graft.functions.PortableHash.md5Mod(
        concat_ws("|", lit("shard"), col("doc_id").cast("string"))).as("h"))
      .as[(String, Long)].collect().sortBy { case (k, h) => (h, k) }
      .map { case (k, _) => s"$k.txt" }.toSeq
    assert(names == expect)
  }

  test("keys too long for ustar refuse; entries without columns refuse") {
    val dir = tempDir("wds-bad").toString
    val longKey = Seq(("x" * 120, "t")).toDF("id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      WebDataset.writeShards(longKey, dir, "id", Seq("txt" -> "text"), 1)
    }
    assert(e.getMessage.contains("ustar") ||
      Option(e.getCause).exists(_.getMessage.contains("ustar")))
    intercept[IllegalArgumentException] {
      WebDataset.writeShards(docs, dir, "doc_id", Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      WebDataset.writeShards(docs, dir, "doc_id", Seq("txt" -> "text"), 0)
    }
  }

  test("partial consumption does not break the import (stream closed at task end)") {
    val dir = tempDir("wds-partial").toString
    WebDataset.writeShards(docs, dir, "doc_id", Seq("txt" -> "text"), 2)
    // limit() stops the iterator mid-archive; the task-completion
    // listener must close the handle and the rows still be exact
    val one = WebDataset.readShards(spark, dir).limit(1).collect()
    assert(one.length == 1)
    // no in-progress temp files survive a successful write
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains("inprogress")))
  }

  test("import handles multi-block payloads and empty shards") {
    val dir = tempDir("wds-big").toString
    val big = Seq((1L, "x" * 1500), (2L, "y" * 513)).toDF("id", "text")
    WebDataset.writeShards(big, dir, "id", Seq("txt" -> "text"), 2)
    val back = WebDataset.readShards(spark, dir)
      .select(col("key"), length(col("payload")).cast("int"))
      .as[(String, Int)].collect().toMap
    assert(back == Map("1" -> 1500, "2" -> 513))
  }
}
