package graft.operators

import graft.SparkSpec
import graft.functions.Srp
import org.apache.spark.sql.functions._

class SrpSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val matrix = Srp.signMatrix(16, dim)

  test("sign matrix is deterministic, ±1, and seed-sensitive") {
    assert(Srp.signMatrix(16, dim) == matrix)
    assert(matrix.flatten.forall(s => s == 1 || s == -1))
    assert(Srp.signMatrix(16, dim, seed = "other") != matrix)
    // hyperplanes are not degenerate: no all-ones / all-minus rows
    assert(matrix.forall(row => row.contains(1) && row.contains(-1)))
  }

  test("native SrpSignature matches the declarative HOF twin on real embeddings") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val both = emb.select(
      Srp.signature(col("embedding"), matrix).as("n"),
      Srp.signatureDeclarative(col("embedding"), matrix).as("d"))
    assert(both.where(col("n") =!= col("d")).count() == 0)
  }

  test("identical vectors share signatures; negated vectors flip every decisive bit") {
    val v = (1 to dim).map(i => math.sin(i.toDouble).toFloat)
    val df = Seq(
      (1L, v), (2L, v), (3L, v.map(x => -x))
    ).toDF("id", "vec")
      .withColumn("sig", Srp.signature(col("vec").cast("array<float>"), matrix))
    val sigs = df.orderBy("id").collect().map(_.getAs[Long]("sig"))
    assert(sigs(0) == sigs(1))
    // -v has every dot negated; no dot of this vector rounds to 0, so
    // all 16 bits flip
    assert((sigs(0) ^ sigs(2)) == 0xFFFFL)
  }

  test("srpPairs finds planted near-duplicates and verifies with exact cosine") {
    val base = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // plant near-dups: ids 10000+i are tiny perturbations of ids i<10
    val planted = base.where(col("vec_id") < 10)
      .select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + when(i % 2 === 0, lit(0.001f)).otherwise(lit(-0.001f))).cast("float"))
          .as("embedding"))
    val corpus = base.union(planted)

    val pairs = Similarity.srpPairs(corpus, "vec_id", "embedding",
      dim = dim, nbits = 16, bands = 4, threshold = 0.9)
      .collect()
    // every planted pair is near-identical (cos ≈ 1) → band collision
    // probability ~1; all 10 must surface, ordered a < b
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(found.contains((i.toLong, i + 10000L)), s"missing planted pair $i")
    }
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
    }
    NearDup.releaseCaches()
  }

  test("srpPairs never emits pairs below the cosine threshold") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val pairs = Similarity.srpPairs(emb, "vec_id", "embedding",
      dim = dim, nbits = 16, bands = 4, threshold = 0.4).collect()
    pairs.foreach(r => assert(r.getDouble(2) >= 0.4))
    NearDup.releaseCaches()
  }
}
