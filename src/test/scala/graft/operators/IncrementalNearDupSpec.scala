package graft.operators

import graft.SparkSpec
import graft.tables.{DeltaTable, ReadArgs}
import org.apache.spark.sql.functions._

/** Persistent LSH band index: probe-before-append batch dedup,
  * batch-order-independent index contents, cross-batch detection.
  */
class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark engines shuffle partitioned data across executors for joins"
  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a batch finds its near-dups in the indexed corpus, not unrelated docs") {
    val dir = tempDir("ndidx").toString + "/index"
    val corpus = docs(
      1L -> base,
      2L -> "completely different content about cooking pasta at home tonight",
      3L -> "yet another unrelated string of words regarding gardening tips")
    IncrementalNearDup.appendToIndex(spark, corpus, "doc_id", "text", dir)

    val batch = docs(
      100L -> (base + " quickly"), // near-dup of 1
      101L -> "nothing like anything indexed before in any conceivable way")
    val hits = IncrementalNearDup.check(
      spark, batch, corpus, "doc_id", "text", dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hits.map(h => (h._1, h._2)) == Seq((100L, 1L)))
    assert(hits.head._3 >= 0.5)
  }

  test("index contents are batch-order independent (A then B == union at once)") {
    val a = docs(1L -> base, 2L -> "some cooking text here with pasta")
    val b = docs(3L -> (base + " now"), 4L -> "gardening again with tulips")
    val dirSplit = tempDir("ndidx-s").toString + "/index"
    IncrementalNearDup.appendToIndex(spark, a, "doc_id", "text", dirSplit)
    IncrementalNearDup.appendToIndex(spark, b, "doc_id", "text", dirSplit)
    val dirOnce = tempDir("ndidx-o").toString + "/index"
    IncrementalNearDup.appendToIndex(spark, a.unionByName(b), "doc_id", "text", dirOnce)
    def contents(d: String) =
      new DeltaTable("i", d)(spark, ReadArgs.empty)
        .as[(Long, Int, String)].collect().toSet
    assert(contents(dirSplit) == contents(dirOnce))
  }

  test("re-checking an already-appended batch reports no self-duplicates") {
    val dir = tempDir("ndidx-self").toString + "/index"
    val batch = docs(1L -> base, 2L -> "unique cooking text with many words here")
    IncrementalNearDup.appendToIndex(spark, batch, "doc_id", "text", dir)
    // loader retry past its checkpoint: same batch checked again
    val hits = IncrementalNearDup.check(spark, batch, batch, "doc_id", "text", dir)
    assert(hits.count() == 0L, hits.collect().mkString(", "))
  }

  test("check-then-append: a later batch detects dups of an earlier batch") {
    val dir = tempDir("ndidx-seq").toString + "/index"
    val corpus0 = docs(1L -> "original corpus content about databases and queries and indexes")
    IncrementalNearDup.appendToIndex(spark, corpus0, "doc_id", "text", dir)

    val b1 = docs(10L -> base)
    assert(IncrementalNearDup.check(spark, b1, corpus0, "doc_id", "text", dir).count() == 0L)
    IncrementalNearDup.appendToIndex(spark, b1, "doc_id", "text", dir)

    // batch 2 near-duplicates a BATCH-1 doc — the corpus lookup now
    // spans corpus + batch 1, the real incremental flow
    val known = corpus0.unionByName(b1)
    val b2 = docs(20L -> (base + " fast"))
    val hits = IncrementalNearDup.check(spark, b2, known, "doc_id", "text", dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hits.map(h => (h._1, h._2)) == Seq((20L, 10L)))
  }
}
