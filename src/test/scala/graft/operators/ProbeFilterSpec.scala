package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom filter + two-phase probe join: the no-false-negative
  * guarantee (the soundness the bypass branch rests on), determinism
  * of the serialized filter across partitionings, a false-positive
  * sanity bound, exact parity of bloomJoin with the plain semi/anti
  * joins, and SQL registration.
  */
class ProbeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, and the filter bytes are partition-invariant") {
    val keys = (0L until 2000L).map(k => k * 2654435761L % 1000003L)
    val bits = ProbeFilter.bitsFor(keys.size)
    def blob(parts: Int): Array[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(ProbeFilter.bloomFilterAgg(col("k"), bits).as("b"))
        .head().getAs[Array[Byte]]("b")
    val b1 = blob(1)
    assert(java.util.Arrays.equals(b1, blob(7)), "merge order changed the bits")
    keys.foreach(k => assert(graft.functions.BloomFilters.mightContain(b1, k),
      s"false negative for $k"))
  }

  test("false-positive rate stays near the design point") {
    val member = (0L until 1000L).toSet
    val bits = ProbeFilter.bitsFor(1000) // 10 bits/key, 7 hashes ≈ 1% fpp
    val blob = member.toSeq.toDF("k")
      .agg(ProbeFilter.bloomFilterAgg(col("k"), bits).as("b"))
      .head().getAs[Array[Byte]]("b")
    val probes = (1000000L until 1010000L)
    val fp = probes.count(k => graft.functions.BloomFilters.mightContain(blob, k))
    assert(fp < 300, s"$fp false positives in ${probes.size} probes (expect ~1%)")
  }

  test("bloomJoin semi and anti match the exact joins") {
    val corpus = (0L until 3000L).map(i => (i, s"row$i")).toDF("k", "v")
    // probe overlaps ~1/3 of the corpus and has keys outside it
    val probe = (1000L until 2000L).map(i => (i, "p")).toDF("k", "p")
      .unionByName((90000L until 90500L).map(i => (i, "p")).toDF("k", "p"))
    val bits = ProbeFilter.bitsFor(1500)

    val semi = ProbeFilter.bloomJoin(corpus, probe, "k", bits)
      .select("k", "v").collect().toSet
    val semiExact = corpus.join(probe.select("k").distinct(), Seq("k"), "left_semi")
      .select("k", "v").collect().toSet
    assert(semi == semiExact)

    val anti = ProbeFilter.bloomJoin(corpus, probe, "k", bits, negate = true)
      .select("k", "v").collect().toSet
    val antiExact = corpus.join(probe.select("k").distinct(), Seq("k"), "left_anti")
      .select("k", "v").collect().toSet
    assert(anti == antiExact)
    assert(semi.size == 1000 && anti.size == 2000) // and together they tile
  }

  test("bloom functions are callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("bloom_keys")
    val rows = spark.sql(
      """WITH f AS (SELECT graft_bloom_filter(k, 1024, 5) AS b FROM bloom_keys)
        |SELECT graft_bloom_might_contain(b, 2) AS hit,
        |  graft_bloom_might_contain(b, 99999) AS miss99999
        |FROM f""".stripMargin).head()
    assert(rows.getAs[Boolean]("hit"))
    // 99999 is overwhelmingly likely a miss at 1024 bits / 3 keys; if
    // this ever flakes the seed constants changed, which is the point
    assert(!rows.getAs[Boolean]("miss99999"))
  }
}
