package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the `events` shape — SURVEY.md §2.10.
  *
  * Each transform takes a DataFrame and so runs identically on a batch frame
  * (`spark.read.parquet`) and a streaming one (`spark.readStream` /
  * `MemoryStream`): the logical plan is the same, only the sink differs.
  * Batch parity is asserted in the sbt suite; the batch twins of the window
  * aggregations are registered (oracle-checked) as q17/q18.
  *
  * Watermarking bounds state: with a 10-minute watermark the tumbling-window
  * state store retains only open windows, and events arriving later than the
  * watermark are dropped — both behaviors pinned by tests. At scale this is
  * what keeps a 100 TB/day stream's state finite.
  */
object EventPipelines {

  /** Tumbling per-type counts with late-data eviction. Append mode emits a
    * window only once its watermark passes — exactly-once per window. */
  def tumblingCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding windows: 10-minute span every 5 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Tumbling distinct-user estimates via HLL++
    * (`approx_count_distinct`): the streaming cardinality pattern — exact
    * distinct per window needs per-key state linear in the number of
    * distinct users, the HLL register array is a few KB per (window, type)
    * regardless of cardinality, and it merges incrementally across
    * micro-batches like any partial aggregate. rsd 1% keeps the estimate
    * exact on fixture-sized windows (suite asserts exact equality there
    * and batch parity always). */
  def approxUniques(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("approx_users"))

  /** Gap-based session windows per user (native session_window). */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Tumbling OHLC bars per event type with late-data eviction — the
    * streaming twin of the t03 batch bars (`graft.queries.TimeSeries`):
    * open/close are selected by struct-min/-max ordered by (ts, event_id),
    * a total order, so the whole bar is ONE mergeable aggregation state per
    * (window, type) — no sort, no per-bar shuffle, and the same partial
    * states work incrementally here and map-side in batch. */
  def ohlcBars(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("_o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("_c"),
        min("value").as("low"),
        max("value").as("high"),
        count(lit(1)).as("n_events"))
      .select(
        col("w.start").as("window_start"), col("event_type"),
        col("_o.value").as("open"), col("high"), col("low"),
        col("_c.value").as("close"), col("n_events"))

  /** Stream-static enrichment join: the static side is planned per
    * micro-batch (broadcast when small), the stream side never buffers. */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(users, events("user_id") === users("id"), "left_outer")
      .select(events("*"), users("segment"))

  /** Streaming exact dedup bounded by the watermark: duplicates of
    * (event_id) arriving within the watermark horizon are dropped; state is
    * evicted once the watermark passes, keeping it finite on an unbounded
    * stream — the streaming twin of d01's batch dedup. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: click→purchase attribution within an
    * `horizon` of the click. Both inputs are watermarked and the join
    * condition bounds event time in BOTH directions, which is what lets the
    * engine evict buffered rows from each side's state store once the
    * watermark passes — without the time bound a stream-stream join must
    * buffer an unbounded past. The same transform on two batch frames is
    * the parity oracle in the suite. */
  def attributePurchases(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes", horizon: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Stream-stream LEFT OUTER interval join: every click emits exactly
    * once — either attributed to a purchase inside the horizon, or
    * null-padded as UNCONVERTED once the watermark proves no matching
    * purchase can still arrive. The null emission is watermark-driven
    * state eviction: an unmatched click is buffered until
    * `click_ts + horizon` falls behind the watermark, then released with
    * nulls — so "conversion rate per window" is computable on an infinite
    * stream with bounded state. Same condition shape as
    * [[attributePurchases]]; only the join type differs, and the batch
    * twin (`left_outer` on static frames) is the parity oracle. */
  def attributeWithUnconverted(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes", horizon: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_ts"), col("purchase_ts"),
        col("value"), col("purchase_ts").isNull.as("unconverted"))
  }

  // ---- Custom state: transformWithState running totals ----

  final case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

  /** Spark 4 arbitrary-state API (`transformWithState`): per-user running
    * totals in a `ValueState`, emitted on every update. Unlike
    * `flatMapGroupsWithState` the state schema is declared to the store
    * (RocksDB provider required), enabling per-state TTL and schema
    * evolution — the modern rung for custom streaming state. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotal] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}

    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      totals = getHandle.getValueState[(Long, Double)]("totals", TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotal] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      totals.update((n, sum))
      Iterator.single(UserTotal(key, n, sum))
    }
  }

  /** Per-user running totals via the transformWithState processor. */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ---- Custom state: flatMapGroupsWithState sessionizer ----

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Long, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization with an explicit gap, closing sessions
    * via processing of newer events (event-time ordered within a group).
    * Demonstrates the arbitrary-state API; the declarative `session_window`
    * above is preferred when the built-in semantics fit. */
  def statefulSessions(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var sessions = state.getOption.getOrElse(Nil)
          val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime
            sessions match {
              case cur :: rest if t - cur.lastTs < gapMs =>
                sessions = cur.copy(lastTs = t, n = cur.n + 1, sum = cur.sum + e.value) :: rest
              case cur :: rest =>
                closed += SessionOut(user, cur.start, cur.n, cur.sum)
                sessions = SessionState(t, t, 1, e.value) :: rest
              case Nil =>
                sessions = SessionState(t, t, 1, e.value) :: Nil
            }
          }
          state.update(sessions)
          closed.iterator
      }
  }
}
