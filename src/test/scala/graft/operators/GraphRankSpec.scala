package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank: hand-checked arithmetic, bit-level
  * determinism across partitionings, and the dangling-loss mass bound.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("one iteration matches the hand-computed fixed-point arithmetic") {
    // A=0 -> B=1, A -> C=2, B -> A; C dangles.
    // n=3: r0 = 1e12/3 = 333333333333, teleport = (15e10)/3 = 50000000000
    // contrib(A->*) = r0 div 2 = 166666666666, contrib(B->A) = r0
    // rA = teleport + (85*333333333333) div 100 = 50e9 + 283333333333
    // rB = rC = teleport + (85*166666666666) div 100 = 50e9 + 141666666666
    val r = ranksOf(Seq((0L, 1L), (0L, 2L), (1L, 0L)), iters = 1)
    assert(r == Map(0L -> 333333333333L, 1L -> 191666666666L, 2L -> 191666666666L))
  }

  test("authority flows: a node cited by everyone outranks the rest") {
    val edges = (1L to 9L).map(i => (i, 0L)) ++ Seq((0L, 1L))
    val r = ranksOf(edges, iters = 3)
    assert(r(0L) == r.values.max)
    assert((1L to 9L).forall(i => r(0L) > r(i)))
  }

  test("bit-identical across partitionings (integer arithmetic is order-free)") {
    val edges = (0L until 400L).map(i => (i % 23, (i * 7 + 3) % 23))
    val df = edges.toDF("src", "dst")
    val a = GraphRank.pageRank(df.repartition(13), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphRank.pageRank(df.repartition(2), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("total mass never exceeds the initial Base (dangling loss only shrinks it)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)) // 4 dangles
    val df = edges.toDF("src", "dst")
    val masses = (1 to 4).map { k =>
      GraphRank.pageRank(df, "src", "dst", k)
        .agg(sum("rank")).as[Long].head()
    }
    masses.foreach(m => assert(m <= GraphRank.Base))
    // monotone non-increasing as iterations stack
    masses.sliding(2).foreach { case Seq(x, y) => assert(y <= x); case _ => }
  }

  test("self-loops and duplicate edges are dropped before ranking") {
    val clean = ranksOf(Seq((0L, 1L), (1L, 0L)), 2)
    val noisy = ranksOf(Seq((0L, 1L), (0L, 1L), (1L, 0L), (0L, 0L), (1L, 1L)), 2)
    assert(clean == noisy)
  }

  test("converged mode stops at a fixed point and matches the fixed-K result there") {
    val edges = (0L until 300L).map(i => (i % 17, (i * 5 + 2) % 17))
    val df = edges.toDF("src", "dst")
    val conv = GraphRank.pageRankConverged(df, "src", "dst",
      maxIterations = 200, tolScaled = 0L) // exact fixed point
      .as[(Long, Long)].collect().toMap
    // once movement hits zero, one more fixed-K step changes nothing:
    // feed the converged count via a large K and compare
    val deep = GraphRank.pageRank(df, "src", "dst", 40)
      .as[(Long, Long)].collect().toMap
    assert(conv == deep)
    // determinism: converging twice gives bit-identical ranks
    val again = GraphRank.pageRankConverged(df, "src", "dst", 200, 0L)
      .as[(Long, Long)].collect().toMap
    assert(again == conv)
  }
}
