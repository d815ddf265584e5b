package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // stream a: 300 + 300 + 12 tokens, budget 256
    ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 12L),
    // stream b: exact-boundary doc then one more
    ("b", 1L, 256L), ("b", 2L, 10L)
  ).toDF("src", "id", "n")

  test("concatChunks assigns exact spans, boundary docs flagged") {
    val got = Packing.concatChunks(docs, "src", "id", "n", budget = 256L)
      .select("src", "id", "tok_start", "chunk_first", "chunk_last", "crosses_boundary")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(("a", 1L)) == ((0L, 0L, 1L, true)))    // 0..299 spans chunks 0-1
    assert(got(("a", 2L)) == ((300L, 1L, 2L, true)))  // 300..599 spans 1-2
    assert(got(("a", 3L)) == ((600L, 2L, 2L, false)))
    // doc ending exactly on the boundary stays in its chunk
    assert(got(("b", 1L)) == ((0L, 0L, 0L, false)))   // 0..255
    assert(got(("b", 2L)) == ((256L, 1L, 1L, false)))
  }

  test("streams pack independently and the plan is partitioning-invariant") {
    val plan1 = Packing.concatChunks(docs, "src", "id", "n", 256L)
      .select("src", "id", "tok_start").as[(String, Long, Long)].collect().toSet
    val plan2 = Packing.concatChunks(docs.repartition(7), "src", "id", "n", 256L)
      .select("src", "id", "tok_start").as[(String, Long, Long)].collect().toSet
    assert(plan1 == plan2)
    // stream b is unaffected by stream a's totals
    assert(plan1.contains(("b", 1L, 0L)))
  }

  test("chunkStats counts chunks and boundary docs per stream") {
    val stats = Packing.chunkStats(docs, "src", "id", "n", 256L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(stats("a") == ((3L, 612L, 3L, 2L))) // 612 tokens -> chunks 0..2
    assert(stats("b") == ((2L, 266L, 2L, 0L)))
  }

  test("a stream of only zero-token documents packs into zero examples") {
    val d = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 1L, 3L)).toDF("src", "id", "n")
    val stats = Packing.chunkStats(d, "src", "id", "n", 4L)
      .select("src", "n_chunks").as[(String, Long)].collect().toMap
    assert(stats("a") == 0L) // nothing to train on
    assert(stats("b") == 1L)
  }

  test("trailing zero-token doc on a budget boundary does not inflate n_chunks") {
    // 8 tokens fill chunks 0..1 exactly (budget 4); the zero-token doc's
    // tok_start = 8 indexes chunk 2, which holds no data.
    val d = Seq(("a", 1L, 8L), ("a", 2L, 0L)).toDF("src", "id", "n")
    val stats = Packing.chunkStats(d, "src", "id", "n", 4L)
      .select("src", "n_chunks").as[(String, Long)].collect().toMap
    assert(stats("a") == 2L)
  }

  test("a zero-token document occupies no span and never crosses") {
    val d = Seq(("a", 1L, 0L), ("a", 2L, 5L)).toDF("src", "id", "n")
    val got = Packing.concatChunks(d, "src", "id", "n", 4L)
      .select("id", "tok_start", "chunk_first", "chunk_last", "crosses_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L, false)))
    assert(got(2L) == ((2L, 0L, 0L, 1L, true))) // 0..4 with budget 4 crosses
  }

  test("lengthBucketBatches: power-of-two bins, bounded padded cost, (len,id) fill") {
    val docs = Seq(
      (1L, 3L), (2L, 4L), (3L, 5L),       // bins: 4 (cap 16), 4 (16), 4? no: len 5 → bin 3→ floored 4
      (4L, 17L), (5L, 30L), (6L, 33L),    // bin 5 (cap 32), 5, 6 (cap 64)
      (7L, 100L), (8L, 0L), (9L, 200L)    // bin 7 (cap 100, clamped), dropped, >budget dropped
    ).toDF("doc_id", "len")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "len", budget = 100L, minBin = 4)
      .select("doc_id", "bin", "bin_cap", "batch", "padded")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!got.contains(8L) && !got.contains(9L))
    // bin 4 (cap 16, capacity 100 div 16 = 6): docs 1,2,3 in batch 0
    assert(got(1L) == ((4, 16L, 0L)) && got(2L) == ((4, 16L, 0L)) && got(3L) == ((4, 16L, 0L)))
    // bin 5 (cap 32, capacity 3): docs 4,5 batch 0
    assert(got(4L) == ((5, 32L, 0L)) && got(5L) == ((5, 32L, 0L)))
    // bin 6 (cap 64, capacity 1): doc 6 alone
    assert(got(6L) == ((6, 64L, 0L)))
    // bin 7 clamps its cap to the 100 budget
    assert(got(7L) == ((7, 100L, 0L)))
    // padded cost of every batch stays within budget
    val full = Packing.lengthBucketBatches(docs, "doc_id", "len", budget = 100L, minBin = 4)
    val over = full.groupBy("bin", "batch")
      .agg(count(lit(1)).as("n"), min("bin_cap").as("cap"))
      .where(col("n") * col("cap") > 100)
    assert(over.count() == 0)
  }

  test("lengthBucketBatches capacity splits batches deterministically") {
    // lens 65..74 → all bin 7 (cap 128); budget 256 → capacity 2
    val docs = (1L to 10L).map(i => (i, 64L + i)).toDF("doc_id", "len")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "len", budget = 256L)
      .select("doc_id", "batch").as[(Long, Long)].collect().toMap
    // (len,id) order = id order here; capacity = 256 div 128 = 2
    (1L to 10L).foreach(i => assert(got(i) == (i - 1) / 2, s"doc $i → ${got(i)}"))
  }
}
