package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeNoveltySpec extends SparkSpec {
  import spark.implicits._

  // ---------------- int8 quantization ----------------

  private def vecs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),      // all-zero: degenerate scale
    (3L, Array(-2.0f, 2.0f, 0.5f)),
    (4L, Array(0.003f, -0.001f, 0.002f)) // tiny magnitudes
  ).toDF("vec_id", "embedding")

  test("int8 codes stay in [-127,127], hit the range anchor, reconstruct within scale") {
    val p = Quantize.int8Profile(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("maxabs"), col("scale"), col("codes"))
      .as[(Long, Double, Double, Seq[Long])].collect().map(r => r._1 -> r).toMap

    p.values.foreach { case (id, maxabs, scale, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes $codes")
      if (maxabs > 0) {
        // the max-magnitude element quantizes to ±127 (or -127 via floor)
        assert(codes.exists(c => math.abs(c) >= 126), s"vec $id never hits the anchor")
        assert(scale === maxabs / 127.0)
      } else assert(codes.forall(_ == 0L))
    }
    // spot-check the exact floor arithmetic
    assert(p(1L)._4 == Seq(127L, -64L, 31L)) // 1.0→127, -0.5→floor(-63.5)=-64, 0.25→31
    assert(p(2L)._4 == Seq(0L, 0L, 0L))
  }

  test("reconstruction error is bounded by one quantization step") {
    val s = Quantize.int8Summary(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("maxabs"), col("max_err"))
      .as[(Long, Double, Double)].collect()
    s.foreach { case (id, maxabs, err) =>
      val step = maxabs / 127.0
      assert(err <= step + 1e-9, s"vec $id err $err exceeds step $step")
    }
  }

  test("quantization is partitioning-invariant (pure scan)") {
    val a = Quantize.int8Summary(vecs, "vec_id", "embedding").collect().toSet
    val b = Quantize.int8Summary(vecs.repartition(7), "vec_id", "embedding").collect().toSet
    assert(a == b)
  }

  // ---------------- gram novelty ----------------

  private def docs = Seq(
    (1L, "s1", "the quick brown fox jumps over the lazy dog"),
    (2L, "s1", "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "s2", "an entirely different set of words goes right here"),
    (4L, "s2", "short text") // < n tokens: no grams
  ).toDF("doc_id", "source", "text")

  test("first document is fully novel, an exact duplicate fully stale") {
    val got = Novelty.gramNovelty(docs, "doc_id", "source", "text", n = 5)
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // s1: doc 1 owns every gram (ratio includes doc 2's zero)
    val (_, n1, g1, v1, r1) = got("s1")
    assert(n1 == 2) // the dup carries grams, the short doc is s2's
    assert(g1 == v1 * 2) // doc2 repeats doc1's grams exactly, none novel
    assert(r1 == 0.5)
    // s2: the one gram-bearing doc is first for all its grams
    val (_, n2, _, _, r2) = got("s2")
    assert(n2 == 1) // "short text" has < 5 tokens -> excluded
    assert(r2 == 1.0)
  }

  test("novelty is partitioning-invariant") {
    val a = Novelty.gramNovelty(docs, "doc_id", "source", "text", 5).collect().toSet
    val b = Novelty.gramNovelty(docs.repartition(5), "doc_id", "source", "text", 5)
      .collect().toSet
    assert(a == b)
  }
}
