package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))

  test("asOfBackward picks the latest right row at or before each left ts") {
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(100), 101.0), (1L, ts(200), 102.0),
      (2L, ts(50), 50.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts(100), "exact-match"),   // right row at the same ts matches
      (1L, ts(150), "between"),       // matches the 100s quote
      (1L, ts(999), "after-all"),     // matches the 200s quote
      (2L, ts(10), "before-any")      // no quote yet -> null
    ).toDF("key", "tts", "label")

    val got = AsOfJoin.asOfBackward(trades, quotes,
      keys = Seq("key"), leftTs = "tts", rightTs = "qts", rightPayload = Seq("price"))
      .select("label", "asof_price").as[(String, Option[Double])].collect().toMap

    assert(got("exact-match").contains(101.0))
    assert(got("between").contains(101.0))
    assert(got("after-all").contains(102.0))
    assert(got("before-any").isEmpty)
  }

  test("asOfForward picks the earliest right row at or after each left ts") {
    val quotes = Seq((1L, ts(100), 101.0), (1L, ts(200), 102.0)).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts(100), "exact"), (1L, ts(150), "between"), (1L, ts(999), "after-all")
    ).toDF("key", "tts", "label")
    val got = AsOfJoin.asOfForward(trades, quotes,
      Seq("key"), "tts", "qts", Seq("price"))
      .select("label", "asof_price").as[(String, Option[Double])].collect().toMap
    assert(got("exact").contains(101.0))
    assert(got("between").contains(102.0))
    assert(got("after-all").isEmpty)
  }

  test("keys never match across groups") {
    val right = Seq((1L, ts(0), 1.0)).toDF("key", "qts", "v")
    val left  = Seq((2L, ts(100), "x")).toDF("key", "tts", "tag")
    val got = AsOfJoin.asOfBackward(left, right, Seq("key"), "tts", "qts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("tolerance nulls out matches older than the window (merge_asof shape)") {
    val right = Seq((1L, ts(0), 1.0), (1L, ts(90), 2.0)).toDF("key", "qts", "v")
    val left = Seq((1L, ts(30), "near"), (1L, ts(80), "far"), (1L, ts(95), "snap"))
      .toDF("key", "tts", "tag")
    val got = AsOfJoin.asOfBackward(left, right, Seq("key"), "tts", "qts", Seq("v"),
      toleranceUs = Some(40L * 1000000L))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got("near").contains(1.0))  // gap 30s <= 40s
    assert(got("far").isEmpty)         // gap 80s  > 40s → treated as no match
    assert(got("snap").contains(2.0))  // gap 5s
  }

  test("forward tolerance symmetric: too-distant future matches drop") {
    val right = Seq((1L, ts(100), 9.0)).toDF("key", "qts", "v")
    val left = Seq((1L, ts(90), "near"), (1L, ts(10), "far")).toDF("key", "tts", "tag")
    val got = AsOfJoin.asOfForward(left, right, Seq("key"), "tts", "qts", Seq("v"),
      toleranceUs = Some(30L * 1000000L))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got("near").contains(9.0) && got("far").isEmpty)
  }
}
