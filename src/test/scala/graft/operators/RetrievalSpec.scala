package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums rounded reciprocals; ids absent from a list contribute nothing") {
    val lex = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, vec), "id", "rank", k = 60)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val r1 = BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r2 = BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r1, 1L)))            // only lexical
    assert(got(2L) == ((r2 + r1, 2L)))       // both lists
    assert(got(3L) == ((r2, 1L)))            // only vector
    // id 2 (rank 2 + rank 1) outranks id 1 (rank 1 alone): fusion
    // rewards agreement across lists
    assert(got(2L)._1 > got(1L)._1)
  }

  test("rrfFuse is partitioning-invariant") {
    val a = (1L to 100L).map(i => (i, i.toInt)).toDF("id", "rank")
    val b = (1L to 100L).map(i => (i, (101 - i).toInt)).toDF("id", "rank")
    val x = Retrieval.rrfFuse(Seq(a, b), "id", "rank").collect().map(_.toSeq).toSet
    val y = Retrieval.rrfFuse(Seq(a.repartition(13), b.repartition(7)), "id", "rank")
      .collect().map(_.toSeq).toSet
    assert(x == y)
  }

  test("weighted fusion boosts the weighted list's ordering") {
    val lex = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val vec = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    // unweighted: perfectly symmetric -> tie
    val even = Retrieval.rrfFuse(Seq(lex, vec), "id", "rank")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(even(1L) == even(2L))
    // lexical tower weighted 2x -> its top item wins
    val boosted = Retrieval.rrfFuseWeighted(Seq(lex -> 2.0, vec -> 1.0), "id", "rank")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(boosted(1L) > boosted(2L))
  }
}
