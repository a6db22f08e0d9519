package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series preparation operators: calendar gap-fill with
  * carry-forward interpolation, and exponentially-weighted smoothing —
  * the two transforms between raw event tables and any forecasting or
  * trend pipeline.
  */
object TimeSeries {

  /** Calendar gap-fill + last-observation-carried-forward: per-nation daily
    * urgent-order revenue over a fixed window, densified so every
    * (nation, day) exists — days with no orders get `n_orders = 0`,
    * `is_gap = true`, and revenue carried forward from the last trading day
    * (null before a nation's first).
    *
    * The dense calendar is built per-key with `sequence` + `explode` — a
    * narrow per-row fan-out of |days| rows per nation, NOT a driver-side
    * date loop — and joined broadcast (keys × days ≪ fact). The
    * carry-forward is one window per nation ordered by day: at 100 TB the
    * state per group is a single value, and the partitioning key is the
    * series key, never global time order.
    */
  val t01GapFill = Q(
    "t01_gap_fill",
    (s, dir) => {
      val d1 = "1995-01-01"
      val d2 = "1995-02-28"
      val actual = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate").between(d1, d2))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderdate").as("d"))
        .agg(count(lit(1)).as("n_orders"), Q.dsum(col("o_totalprice")).as("rev"))
      val calendar = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nationkey"),
          explode(sequence(lit(d1).cast("date"), lit(d2).cast("date"))).as("d"))
      val w = Window.partitionBy("c_nationkey").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendar.join(actual, Seq("c_nationkey", "d"), "left")
        .select(
          col("c_nationkey").as("n_nationkey"), col("d"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          last(col("rev"), ignoreNulls = true).over(w).as("rev_filled"),
          col("rev").isNull.as("is_gap"))
        .orderBy("n_nationkey", "d")
    },
    Some("""WITH actual AS (
        SELECT c_nationkey, o_orderdate AS d, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-02-28'
        GROUP BY 1, 2),
      calendar AS (
        SELECT n_nationkey, CAST(g.d AS DATE) AS d
        FROM nation, generate_series(DATE '1995-01-01', DATE '1995-02-28',
          INTERVAL 1 DAY) AS g(d))
      SELECT c.n_nationkey, c.d,
        COALESCE(a.n_orders, 0) AS n_orders,
        last_value(a.rev IGNORE NULLS) OVER (
          PARTITION BY c.n_nationkey ORDER BY c.d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_filled,
        a.rev IS NULL AS is_gap
      FROM calendar c LEFT JOIN actual a
        ON c.n_nationkey = a.c_nationkey AND c.d = a.d
      ORDER BY c.n_nationkey, c.d"""))

  /** EWMA trend smoothing: monthly revenue per region, smoothed with a
    * 6-term exponentially-weighted moving average (α = 1/2, weights
    * 1, 1/2, …, 1/32 — exact powers of two, so every product is an exact
    * double and both engines compute bit-identical sums in the written
    * operand order). Early months renormalize over the lags that exist.
    *
    * One window per region ordered by month — fixed 6-row lookback, no
    * growing frame state. A 100 TB version partitions by series key the
    * same way; the lag depth, not history length, bounds per-row work.
    */
  val t02Ewma = Q(
    "t02_ewma",
    (s, dir) => {
      val monthly = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("r_regionkey"),
          trunc(col("o_orderdate"), "month").as("mon"))
        .agg(Q.dsum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy("r_regionkey").orderBy("mon")
      def lg(i: Int) = lag(col("rev"), i).over(w)
      def wt(i: Int) = lit(math.pow(0.5, i))
      val num = (0 to 5).map(i =>
        if (i == 0) col("rev") else coalesce(lg(i) * wt(i), lit(0.0)))
        .reduce(_ + _)
      val den = (0 to 5).map(i =>
        if (i == 0) lit(1.0) else when(lg(i).isNotNull, wt(i)).otherwise(lit(0.0)))
        .reduce(_ + _)
      monthly
        .select(col("r_regionkey"), col("mon"), col("rev"),
          (num / den).as("ewma"))
        .orderBy("r_regionkey", "mon")
    },
    Some("""WITH monthly AS (
        SELECT n_regionkey AS r_regionkey,
          date_trunc('month', o_orderdate) AS mon,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT r_regionkey, mon, rev,
        (rev
          + COALESCE(lag(rev, 1) OVER w * 0.5, 0.0)
          + COALESCE(lag(rev, 2) OVER w * 0.25, 0.0)
          + COALESCE(lag(rev, 3) OVER w * 0.125, 0.0)
          + COALESCE(lag(rev, 4) OVER w * 0.0625, 0.0)
          + COALESCE(lag(rev, 5) OVER w * 0.03125, 0.0))
        / (1.0
          + CASE WHEN lag(rev, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END
          + CASE WHEN lag(rev, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END
          + CASE WHEN lag(rev, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END
          + CASE WHEN lag(rev, 4) OVER w IS NOT NULL THEN 0.0625 ELSE 0.0 END
          + CASE WHEN lag(rev, 5) OVER w IS NOT NULL THEN 0.03125 ELSE 0.0 END)
        AS ewma
      FROM monthly
      WINDOW w AS (PARTITION BY r_regionkey ORDER BY mon)
      ORDER BY r_regionkey, mon"""))

  /** OHLC downsampling: per (event_type, day) open/high/low/close bars over
    * the event value stream — the standard raw-ticks → bar-series compaction
    * of any metrics or market pipeline.
    *
    * Open/close are selected by a single struct-min/-max aggregate ordered
    * by (ts, event_id) — a total order, so both engines pick the identical
    * row without a sort: the aggregate is one map-side-combined groupBy on
    * the bar key, no window and no per-bar shuffle-sort anywhere. At 100 TB
    * this is the shape that matters — downsampling must be a single
    * partial-aggregable pass, because the raw tick stream is the biggest
    * table in the lake. (The oracle uses row_number windows instead —
    * DuckDB's arg_min can't take a composite ordering key — but semantics
    * are identical under the total order.) */
  val t03OhlcBars = Q(
    "t03_ohlc_bars",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("_o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("_c"),
          min("value").as("low"),
          max("value").as("high"),
          count(lit(1)).as("n_events"))
        .select(
          col("event_type"), col("d"),
          col("_o.value").as("open"), col("high"), col("low"),
          col("_c.value").as("close"), col("n_events"))
        .orderBy("event_type", "d")
    },
    Some("""WITH e AS (
        SELECT event_type, date_trunc('day', ts) AS d, ts, event_id, value
        FROM events),
      r AS (
        SELECT *,
          row_number() OVER (PARTITION BY event_type, d
            ORDER BY ts, event_id) AS rf,
          row_number() OVER (PARTITION BY event_type, d
            ORDER BY ts DESC, event_id DESC) AS rl
        FROM e)
      SELECT event_type, d,
        max(CASE WHEN rf = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rl = 1 THEN value END) AS close,
        count(*) AS n_events
      FROM r GROUP BY event_type, d ORDER BY event_type, d"""))

  /** Rolling one-hour event-time window via a RANGE frame over timestamps:
    * per event, the count and exact-decimal value sum of all same-type
    * events in the trailing hour. The time-INTERVAL range frame is the
    * sliding aggregation that needs NO explode/fan-out (contrast q37's
    * overlapping-bucket explode): one hash partition per series key, one
    * sort, and the frame slides per row. At 100 TB the state is a two-
    * pointer window over each partition — memory bounded by the densest
    * hour, never the partition. Spark's DSL frame unit is the ordering
    * column's type, so the ordering key is the MICROSECOND epoch (the
    * timestamps' full precision — a seconds-granularity key would admit
    * rows up to a second outside the hour) and the frame is 3.6e9 µs,
    * physically identical to the oracle's RANGE INTERVAL 1 HOUR. */
  /** t04's registered body over any events frame — shared with
    * `ScaleProbe`'s `rolling_hour` shape. */
  def rollingHourWindowPlan(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(
        col("event_id"), col("event_type"), col("ts"),
        count(lit(1)).over(w).as("n_trailing_hr"),
        sum(Q.dec2(col("value"))).over(w).cast("double").as("sum_trailing_hr"))
      .orderBy("event_id")
  }

  /** t05's body: identical semantics through the ghost-replicated bucketed
    * rewrite ([[graft.operators.BoundedRangeWindow]]) — (type × hour)-way
    * parallel instead of one task per event_type. */
  def rollingHourBucketed(events: DataFrame): DataFrame =
    graft.operators.BoundedRangeWindow.trailingCountSum(
        events, Seq("event_type"), unix_micros(col("ts")),
        rangeMicros = 3600000000L, value = Q.dec2(col("value")),
        outCount = "n_trailing_hr", outSum = "_sum_dec")
      .select(
        col("event_id"), col("event_type"), col("ts"),
        col("n_trailing_hr"),
        col("_sum_dec").cast("double").as("sum_trailing_hr"))
      .orderBy("event_id")

  val t04RollingHour = Q(
    "t04_rolling_hour",
    (s, dir) => rollingHourWindowPlan(Tables.events(s, dir)),
    Some("""SELECT event_id, event_type, ts,
        count(*) OVER w AS n_trailing_hr,
        CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
          AS sum_trailing_hr
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** The scale-out form of t04 (same oracle, byte-identical output): at
    * low key cardinality Spark's window execution serializes each key into
    * ONE task; the ghost-replicated bucket rewrite restores (keys × hours)
    * parallelism with a per-task working set of two buckets. See
    * [[graft.operators.BoundedRangeWindow]] for the exactness argument;
    * the `rolling_hour` vs `rolling_hour_bucketed` ScaleProbe shapes
    * measure the serialization this removes. */
  val t05RollingHourBucketed = Q(
    "t05_rolling_hour_bucketed",
    (s, dir) => rollingHourBucketed(Tables.events(s, dir)),
    t04RollingHour.oracle)

  val all: Seq[Q] =
    Seq(t01GapFill, t02Ewma, t03OhlcBars, t04RollingHour, t05RollingHourBucketed)
}
