package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def build(rows: Seq[(Int, Long, Long, String)]) =
    Scd2.build(
      rows.toDF("k", "t", "ord", "attr").withColumn("t", timestamp_micros(col("t"))),
      "k", "t", "ord", Seq("attr"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toSeq

  test("consecutive same-attribute observations collapse into one version") {
    val got = build(Seq(
      (1, 10L, 1L, "a"), (1, 20L, 2L, "a"), (1, 30L, 3L, "b"),
      (1, 40L, 4L, "b"), (1, 50L, 5L, "a")))
    assert(got == Seq(
      (1, "a", 10L, Some(30L), 1L),
      (1, "b", 30L, Some(50L), 2L),
      (1, "a", 50L, None, 3L)))
  }

  test("simultaneous observations order by the declared tiebreak column") {
    // same ts: ord decides; attr flips a→b at ord 2
    val got = build(Seq((1, 10L, 2L, "b"), (1, 10L, 1L, "a")))
    assert(got == Seq((1, "a", 10L, Some(10L), 1L), (1, "b", 10L, None, 2L)))
  }

  test("keys version independently") {
    val got = build(Seq((1, 10L, 1L, "a"), (2, 10L, 2L, "x"), (2, 20L, 3L, "y")))
    assert(got == Seq(
      (1, "a", 10L, None, 1L),
      (2, "x", 10L, Some(20L), 1L), (2, "y", 20L, None, 2L)))
  }

  test("the whole build plans ONE shuffle (key partitioning reused end to end)") {
    // AQE hides the inner plan from collect — build with it off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Scd2.build(
        Seq((1, 10L, 1L, "a"), (1, 20L, 2L, "b"), (2, 30L, 3L, "c"))
          .toDF("k", "t", "ord", "attr")
          .withColumn("t", timestamp_micros(col("t"))),
        "k", "t", "ord", Seq("attr"))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.length == 1,
        s"expected one exchange, got ${shuffles.length}:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("intervals tile the key's observed span with no gaps or overlaps") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      (i % 4, rnd.nextInt(1000).toLong, i.toLong, s"v${rnd.nextInt(3)}"))
    val got = build(rows)
    got.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._5)
      assert(sorted.map(_._5) == (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), s"version ${a._5} must end where ${b._5} starts")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
      // adjacent versions always differ in the tracked attribute —
      // that's what defines a version boundary
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 != b._2)
        case _ =>
      }
    }
  }
}
