package graft.catalog

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize profiles counts, nulls, distincts, and rendered bounds") {
    val df = Seq(
      (1L, Some("a"), Some(1.55551)),
      (2L, None, Some(-2.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(9.125))).toDF("id", "tag", "x")
    val got = Profile.summarize(df, Seq("id", "tag", "x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")))
    // float bounds render through DECIMAL(18,4): round(1.55551,4)=1.5555
    assert(got("x") == ((4L, 1L, 3L, "-2.0000", "9.1250")))
  }

  test("approx mode profiles without the distinct expand; counts stay exact") {
    val df = (1L to 500L).map(i => (i, i % 37)).toDF("id", "m")
    val got = Profile.summarize(df, Seq("m"), exact = false)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got._1 == 500L && got._2 == 0L)
    assert(math.abs(got._3 - 37L) <= 4, s"approx distinct ${got._3} far from 37")
  }
}
