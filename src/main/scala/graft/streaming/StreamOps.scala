package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators mirroring the batch semantics of
  * graft.operators (E14 in SURVEY.md §2).
  *
  * Every transform here takes a DataFrame that may be a streaming or a
  * batch frame — the plan is identical, which is how the engine keeps
  * one definition of "sessionization" or "windowed rollup" across the
  * lake and the live stream. State management (watermarks, session
  * windows, mapGroupsWithState) follows Spark's event-time model:
  * watermark bounds state size, so a 1000-executor cluster ingesting
  * an unbounded stream holds only the open windows.
  */
object StreamOps {

  /** Event-time tumbling/sliding windowed rollup with a watermark.
    * Late data beyond `watermarkDelay` is dropped (state stays
    * bounded); exact decimal sums as in the batch q_event_buckets.
    */
  def windowedRollup(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String = "10 minutes",
      slideDuration: Option[String] = None
  ): DataFrame = {
    val w = slideDuration
      .map(s => window(col(tsCol), windowDuration, s))
      .getOrElse(window(col(tsCol), windowDuration))
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(w.as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast(DecimalType(18, 4))).cast("double"), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization on a stream via Spark's native
    * session_window — the streaming analog of
    * graft.operators.Sessionize (same gap semantics; session bounds
    * close `gap` after the last event once the watermark passes).
    */
  def sessionRollup(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      valueCol: String,
      gap: String,
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("s"), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast(DecimalType(18, 4))).cast("double"), 4).as("sum_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col(userCol), col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state: running per-user totals via
    * mapGroupsWithState (the escape hatch for state machines the
    * built-in windows can't express). Pass an idle timeout in
    * production so inactive users are evicted and state stays bounded;
    * None keeps state forever (fine for tests / bounded key spaces).
    */
  def runningTotals(
      events: Dataset[UserEvent],
      idleTimeout: Option[String] = Some("1 hour")
  ): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
            val (n, s) = batch.foldLeft((prev.n_events, prev.sum_value)) {
              case ((cn, cs), e) => (cn + 1, cs + e.value)
            }
            val next = UserRunning(userId, n, math.rint(s * 10000) / 10000)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Per-user running totals on the transformWithState API (Spark 4's
    * arbitrary-state processor model — typed state handles with
    * per-state TTL, timers, and RocksDB-only execution). Same
    * semantics as [[runningTotals]]; the agreement between the two
    * APIs is spec-tested. `ttl` evicts idle users' state without a
    * timeout dance — the knob that keeps unbounded-key streams
    * bounded.
    */
  def runningTotalsTws(
      events: Dataset[UserEvent],
      ttl: Option[java.time.Duration] = None
  ): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    // TTL state is only legal under ProcessingTime time mode (Spark
    // rejects it in TimeMode.None) — the mode follows the knob
    val timeMode =
      if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor(
          ttl.map(org.apache.spark.sql.streaming.TTLConfig(_))
            .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)),
        timeMode,
        OutputMode.Update())
  }

  /** Watermarked stream-stream equi-join with an event-time range:
    * a right event matches a left event with the same key when
    * `rightTs ∈ [leftTs, leftTs + within]` (the ad-impression→click
    * shape). Both sides carry watermarks and the join carries the time
    * constraint, which is exactly what lets Spark bound the join state
    * on an unbounded stream: buffered rows older than
    * watermark − within are evicted. `joinType` inner or left_outer
    * (outer rows emit once the watermark proves no match can arrive).
    * Works identically on batch frames (same plan — the agreement is
    * spec-tested).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      within: String,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"
  ): DataFrame = {
    require(leftTs != rightTs,
      "rename the two event-time columns distinctly before joining")
    val rKey = s"__${keyCol}_r"
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay).withColumnRenamed(keyCol, rKey)
    l.join(r,
        col(keyCol) === col(rKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
        joinType)
      .drop(rKey)
  }

  /** Streaming deduplication: drop events whose key combination was
    * already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state holds one entry per key
    * seen in the horizon and is evicted as the watermark advances, so
    * an unbounded stream keeps bounded dedup state; plain
    * dropDuplicates on a stream would grow state forever).
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Default streaming sink config for append-mode windowed outputs. */
  /** Stream-static enrichment: every micro-batch joins against the
    * bounded dimension frame (explicitly broadcast — the classic
    * fact-stream × dim shape; no watermark is needed because the
    * static side never grows). At scale the dim rides the broadcast
    * to every executor once per plan, not once per row.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "inner"
  ): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, joinType)

  def defaultOutputMode: OutputMode = OutputMode.Update()

  /** Run stateful streaming on the RocksDB state store provider
    * instead of the default in-memory HDFS-backed one. At production
    * state sizes (streaming dedup over a high-cardinality key space,
    * wide session maps) the default provider holds every key in
    * executor heap — RocksDB spills to local SSD, bounds heap by block
    * cache, and with changelog checkpointing uploads per-batch deltas
    * instead of full snapshots, which is the configuration a
    * 1000-executor streaming job actually runs. The provider affects
    * queries STARTED after the conf is set (it is pinned into each
    * query's checkpoint at start).
    */
  def useRocksDbStateStore(
      spark: org.apache.spark.sql.SparkSession,
      changelogCheckpointing: Boolean = true
  ): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      changelogCheckpointing.toString)
  }

  /** Revert to the default state store provider (new queries only). */
  def useDefaultStateStore(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
}

/** transformWithState processor behind [[StreamOps.runningTotalsTws]]:
  * one ValueState per user, optional TTL eviction.
  */
class RunningTotalsProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, StreamOps.UserEvent, StreamOps.UserRunning] {

  @transient private var state:
    org.apache.spark.sql.streaming.ValueState[StreamOps.UserRunning] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[StreamOps.UserRunning](
      "totals", org.apache.spark.sql.Encoders.product[StreamOps.UserRunning], ttl)

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamOps.UserEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues
  ): Iterator[StreamOps.UserRunning] = {
    val prev =
      if (state.exists()) state.get()
      else StreamOps.UserRunning(key, 0L, 0.0)
    val (n, s) = rows.foldLeft((prev.n_events, prev.sum_value)) {
      case ((cn, cs), e) => (cn + 1, cs + e.value)
    }
    val next = StreamOps.UserRunning(key, n, math.rint(s * 10000) / 10000)
    state.update(next)
    Iterator.single(next)
  }
}
