package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stars, cliques, chains, and isolated pairs get component-min labels") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // clique {1,2,3}
      (10L, 11L), (11L, 12L),       // chain {10,11,12}
      (20L, 21L)                    // pair
    )
    val got = labelMap(pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("matches min-label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
      val df = pairs.toDF("a_id", "b_id")
      val expect = NearDup.dupClusters(df, "a_id", "b_id", maxIter = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = ConnectedComponents.labels(df, "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial diverged")
    }
  }

  test("long path converges in O(log n) rounds, far under the diameter") {
    val n = 256
    val path = (0L until (n - 1)).map(i => (i, i + 1))
    val (df, rounds) = ConnectedComponents.labelsWithRounds(
      path.toDF("a", "b"), "a", "b", maxIter = 50)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
    assert(rounds <= 15, s"took $rounds rounds on a diameter-$n path")
  }

  test("high-degree hub re-attaches in few rounds") {
    val hub = (1L to 500L).map(v => (250L, v)).filter(p => p._1 != p._2)
    val (df, rounds) = ConnectedComponents.labelsWithRounds(
      hub.toDF("a", "b"), "a", "b", maxIter = 50)
    val labels = df.select(countDistinct("cluster_id")).as[Long].head()
    assert(labels == 1L)
    assert(df.where(col("cluster_id") =!= 1L).count() == 0)
    assert(rounds <= 6)
  }

  test("string ids work (ordering is lexicographic)") {
    val pairs = Seq(("docB", "docA"), ("docB", "docC"), ("docX", "docY"))
    val got = ConnectedComponents.labels(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "docX" -> "docX", "docY" -> "docX"))
  }
}
