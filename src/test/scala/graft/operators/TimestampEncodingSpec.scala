package graft.operators

import graft.SparkSpec
import graft.functions.TimeFns.tsUs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the engine's tolerance of BOTH parquet timestamp encodings.
  *
  * Parquet `timestamp[us]` comes in two flavors: `isAdjustedToUTC=true`
  * (an instant; Spark reads TIMESTAMP) and `isAdjustedToUTC=false`
  * (wall-clock; Spark reads TIMESTAMP_NTZ). Real lakes contain both,
  * and the testdata generator has shipped both across rounds. Every
  * time-arithmetic operator must produce identical results on either
  * encoding — this suite writes the same event log both ways and
  * asserts Sessionize / RangeJoin / AsOfJoin agree row-for-row.
  * It fails at analysis time if the `TimeFns.tsUs` NTZ-tolerant cast
  * is ever reverted to a bare `unix_micros`.
  */
class TimestampEncodingSpec extends SparkSpec {

  import org.apache.spark.sql.types._

  // Event log with sub-gap and super-gap deltas, two users, ties.
  private def rawEvents: DataFrame = {
    val rows = Seq(
      (1L, "u1", "2024-03-01 10:00:00", 1.5),
      (2L, "u1", "2024-03-01 10:10:00", 2.0), // same session (10 min)
      (3L, "u1", "2024-03-01 11:30:00", 0.5), // new session (80 min gap)
      (4L, "u2", "2024-03-01 10:05:00", 3.0),
      (5L, "u2", "2024-03-01 12:00:00", 1.0), // new session
      (6L, "u2", "2024-03-01 12:29:59", 4.5)  // boundary: just inside gap
    )
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts_str", "value")
  }

  /** Write the log as parquet in the given encoding, read it back. */
  private def eventsAs(ntz: Boolean): DataFrame = {
    val target = if (ntz) TimestampNTZType else TimestampType
    val df = rawEvents.withColumn("ts", col("ts_str").cast(target)).drop("ts_str")
    val dir = tempDir(s"enc-${if (ntz) "ntz" else "ltz"}").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("written encodings really differ (LTZ vs NTZ round-trip)") {
    val ltz = eventsAs(ntz = false).schema("ts").dataType
    val ntz = eventsAs(ntz = true).schema("ts").dataType
    assert(ltz == TimestampType, s"expected TIMESTAMP, got $ltz")
    assert(ntz == TimestampNTZType, s"expected TIMESTAMP_NTZ, got $ntz")
  }

  test("tsUs yields identical epoch micros on both encodings") {
    val a = eventsAs(ntz = false).select(col("event_id"), tsUs(col("ts")).as("us"))
    val b = eventsAs(ntz = true).select(col("event_id"), tsUs(col("ts")).as("us"))
    assert(collectSorted(a) == collectSorted(b))
  }

  test("Sessionize.rollup agrees across encodings") {
    def roll(df: DataFrame): Seq[String] = collectSorted(
      Sessionize.rollup(df, "user_id", "ts", "value", gapSeconds = 1800)
        .select(col("user_id"), col("session_seq"),
          tsUs(col("session_start")).as("s"), tsUs(col("session_end")).as("e"),
          col("n_events"), col("sum_value")))
    val ltz = roll(eventsAs(ntz = false))
    val ntz = roll(eventsAs(ntz = true))
    assert(ltz.nonEmpty && ltz == ntz)
    // boundary check: u2's 12:00:00 and 12:29:59 share a session (gap < 30m)
    val u2 = Sessionize.assign(eventsAs(ntz = true), "user_id", "ts", 1800)
      .where(col("user_id") === "u2").select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u2(5L) == u2(6L) && u2(4L) != u2(5L))
  }

  test("RangeJoin.pointInInterval agrees across encodings") {
    def joined(df: DataFrame): Seq[String] = {
      val sessions = Sessionize
        .rollup(df, "user_id", "ts", "value", gapSeconds = 1800)
        .select(col("user_id"), col("session_seq"), col("session_start"), col("session_end"))
      collectSorted(RangeJoin.pointInInterval(
        df.select(col("user_id"), col("ts"), col("event_id")), sessions,
        key = "user_id", tsCol = "ts",
        startCol = "session_start", endCol = "session_end",
        bucketWidthUs = 1800L * 1000000L)
        .select(col("event_id"), col("user_id"), col("session_seq")))
    }
    val ltz = joined(eventsAs(ntz = false))
    val ntz = joined(eventsAs(ntz = true))
    // every event lands in exactly its own session
    assert(ltz.length == 6 && ltz == ntz)
  }

  test("AsOfJoin backward+forward agree across encodings") {
    def asof(df: DataFrame): Seq[String] = {
      val hourly = df
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hts"))
        .agg(count(lit(1)).as("n"))
      val back = AsOfJoin.asOfBackward(
        df.select(col("event_id"), col("user_id"), col("ts")), hourly,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "hts",
        rightPayload = Seq("n"))
        .select(col("event_id"), tsUs(col("asof_hts")).as("h"), col("asof_n"))
      val fwd = AsOfJoin.asOfForward(
        df.select(col("event_id"), col("user_id"), col("ts")), hourly,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "hts",
        rightPayload = Seq("n"))
        .select(col("event_id"), tsUs(col("asof_hts")).as("h"), col("asof_n"))
      collectSorted(back.unionByName(fwd))
    }
    val ltz = asof(eventsAs(ntz = false))
    val ntz = asof(eventsAs(ntz = true))
    assert(ltz.nonEmpty && ltz == ntz)
  }
}
