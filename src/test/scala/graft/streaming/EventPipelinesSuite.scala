package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Deterministic MemoryStream tests for the streaming slice (SURVEY M4):
  * watermark late-data drop, tumbling/session windows, batch parity, and
  * the flatMapGroupsWithState sessionizer.
  */
/** Top-level so Spark can derive an Encoder (inner classes need outer scope). */
case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
case class EvId(event_id: Long, ts: Timestamp, value: Double)
case class EvO(event_id: Long, ts: Timestamp, event_type: String, value: Double)

class EventPipelinesSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private def runStream(
      input: MemoryStream[Ev],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode,
      batches: Seq[Seq[Ev]]): Seq[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.nanoTime()}"
    val q = build(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling windows with watermark drop events later than the watermark") {
    val input = MemoryStream[Ev]
    val rows = runStream(
      input, df => EventPipelines.tumblingCounts(df), OutputMode.Append(),
      Seq(
        // window [10:00,10:05): two events; then advance event time far
        // enough that the watermark (max ts - 10m) passes 10:05.
        Seq(Ev(ts(0, 10), "click", 1.0, 1), Ev(ts(2, 0), "click", 2.0, 1)),
        Seq(Ev(ts(20, 0), "view", 1.0, 1)),
        // late straggler for the already-finalized [10:00,10:05) window —
        // beyond watermark (20:00 - 10m = 10:10 > 10:05) ⇒ dropped.
        Seq(Ev(ts(1, 0), "click", 99.0, 1)),
        // push watermark past [10:20,10:25) so the view window also emits.
        Seq(Ev(ts(40, 0), "click", 1.0, 1))))
    val byKey = rows.map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey(("2024-01-01 10:00:00.0", "click")) === 2L,
      s"late event must not be counted: $byKey")
    assert(byKey(("2024-01-01 10:20:00.0", "view")) === 1L)
  }

  test("streaming tumbling counts equal the batch run of the same transform") {
    val events = Seq(
      Ev(ts(0, 30), "click", 1.0, 1), Ev(ts(1, 0), "click", 2.0, 2),
      Ev(ts(6, 0), "view", 3.0, 1), Ev(ts(7, 0), "click", 4.0, 3),
      Ev(ts(12, 0), "view", 5.0, 2))
    val input = MemoryStream[Ev]
    val streamed = runStream(
      input, df => EventPipelines.tumblingCounts(df), OutputMode.Complete(),
      Seq(events.take(2), events.drop(2)))
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventPipelines.tumblingCounts(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming approx distinct users equals batch, and truth, at fixture cardinality") {
    val events = Seq(
      Ev(ts(0, 30), "click", 1.0, 1), Ev(ts(1, 0), "click", 2.0, 2),
      Ev(ts(2, 0), "click", 2.5, 2), // same user twice in the window
      Ev(ts(6, 0), "view", 3.0, 1), Ev(ts(7, 0), "click", 4.0, 3),
      Ev(ts(12, 0), "view", 5.0, 2))
    val input = MemoryStream[Ev]
    val streamed = runStream(
      input, df => EventPipelines.approxUniques(df), OutputMode.Complete(),
      Seq(events.take(3), events.drop(3)))
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventPipelines.approxUniques(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // At rsd 1% and single-digit cardinalities HLL++ is exact: the
    // duplicated user collapses to 2 distinct in the first window.
    assert(batch.toSeq.map { case (_, t, n) => (t, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap ===
      Map("click" -> (2L + 1L), "view" -> (1L + 1L)))
  }

  test("streaming OHLC bars equal the batch run and pick open/close by (ts, event_id)") {
    val events = Seq(
      EvO(1, ts(0, 30), "click", 5.0), EvO(2, ts(1, 0), "click", 9.0),
      EvO(3, ts(4, 0), "click", 2.0),  // close of [10:00,10:05) and low
      EvO(4, ts(6, 0), "click", 7.0))
    val input = MemoryStream[EvO]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.ohlcBars(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    val streamed =
      try {
        input.addData(events.take(2)); q.processAllAvailable()
        input.addData(events.drop(2)); q.processAllAvailable()
        spark.table(name).collect().toSeq
      } finally q.stop()
    val got = streamed.map(r => (r.getTimestamp(0).toString, r.getString(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got === Set(
      ("2024-01-01 10:00:00.0", "click", 5.0, 9.0, 2.0, 2.0, 3L),
      ("2024-01-01 10:05:00.0", "click", 7.0, 7.0, 7.0, 7.0, 1L)))
    val batch = EventPipelines.ohlcBars(events.toDF())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(batch === got)
  }

  test("streaming OHLC drops a late event that would have re-opened a closed bar") {
    val input = MemoryStream[EvO]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.ohlcBars(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val rows =
      try {
        input.addData(Seq(EvO(10, ts(1, 0), "click", 4.0)))
        q.processAllAvailable()
        // advance the watermark past [10:00,10:05): 10:20 - 10m = 10:10
        input.addData(Seq(EvO(11, ts(20, 0), "click", 1.0)))
        q.processAllAvailable()
        // late event at 10:00:10 with a smaller (ts,event_id): would have
        // become the bar's open — beyond watermark ⇒ dropped.
        input.addData(Seq(EvO(9, ts(0, 10), "click", 99.0)))
        q.processAllAvailable()
        input.addData(Seq(EvO(12, ts(40, 0), "click", 1.0)))
        q.processAllAvailable()
        spark.table(name).collect().toSeq
      } finally q.stop()
    val first = rows.find(_.getTimestamp(0).toString == "2024-01-01 10:00:00.0")
    assert(first.isDefined, s"first bar never emitted: $rows")
    assert(first.get.getDouble(2) === 4.0, "late event must not set the open")
    assert(first.get.getLong(6) === 1L)
  }

  test("session windows merge events within the gap and split across it") {
    val input = MemoryStream[Ev]
    val rows = runStream(
      input, df => EventPipelines.sessionCounts(df), OutputMode.Complete(),
      Seq(Seq(
        Ev(ts(0, 0), "click", 1.0, 7), Ev(ts(4, 0), "click", 1.0, 7),
        Ev(ts(30, 0), "click", 1.0, 7),   // > 10m gap ⇒ new session
        Ev(ts(2, 0), "view", 1.0, 8))))
    val sessions = rows.map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(sessions === Set(
      (7L, "2024-01-01 10:00:00.0", 2L),
      (7L, "2024-01-01 10:30:00.0", 1L),
      (8L, "2024-01-01 10:02:00.0", 1L)))
  }

  test("flatMapGroupsWithState sessionizer closes sessions across batches") {
    import EventPipelines.{Event, SessionOut}
    val input = MemoryStream[Event]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.statefulSessions(input.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(7, ts(0, 0), 1.0), Event(7, ts(4, 0), 2.0))
      q.processAllAvailable()
      // second batch: an event past the gap closes the first session
      input.addData(Event(7, ts(30, 0), 5.0))
      q.processAllAvailable()
      val out = spark.table(name).as[SessionOut].collect().toSeq
      assert(out === Seq(SessionOut(7, ts(0, 0).getTime, 2, 3.0)))
    } finally q.stop()
  }

  test("stream-static join enriches events against a static dimension") {
    val users = Seq((1L, "gold"), (2L, "silver")).toDF("id", "segment")
    val input = MemoryStream[Ev]
    val rows = runStream(
      input, df => EventPipelines.enrichWithUsers(df, users), OutputMode.Append(),
      Seq(Seq(
        Ev(ts(0, 0), "click", 1.0, 1),
        Ev(ts(1, 0), "view", 2.0, 2),
        Ev(ts(2, 0), "click", 3.0, 99))))   // no matching user → null segment
    val seg = rows.map(r => r.getLong(3) -> Option(r.getString(4))).toMap
    assert(seg === Map(1L -> Some("gold"), 2L -> Some("silver"), 99L -> None))
  }

  test("dropDuplicatesWithinWatermark drops in-horizon duplicate event_ids") {
    val input = MemoryStream[EvId]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      input.addData(EvId(100L, ts(0, 0), 1.0), EvId(101L, ts(1, 0), 2.0))
      q.processAllAvailable()
      // same ids again within the watermark horizon → dropped
      input.addData(EvId(100L, ts(2, 0), 99.0), EvId(102L, ts(3, 0), 3.0))
      q.processAllAvailable()
      val ids = spark.table(name).select("event_id").as[Long].collect().sorted.toSeq
      assert(ids === Seq(100L, 101L, 102L))
    } finally q.stop()
  }

  test("checkpoint recovery: restarting the query resumes exactly-once into the file sink") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val input = MemoryStream[Ev]
    def start() = input.toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    try {
      input.addData(Ev(ts(0, 0), "click", 1.0, 1), Ev(ts(1, 0), "view", 2.0, 2))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restart from the same checkpoint: the committed batch must not be
    // re-emitted; new data lands exactly once.
    val q2 = start()
    try {
      input.addData(Ev(ts(2, 0), "click", 3.0, 3))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(outDir)
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(rows === Seq(1L, 2L, 3L), s"expected exactly-once output, got $rows")
  }

  test("foreachBatch sink: micro-batches land in a catalog table with batch ids") {
    import org.apache.spark.sql.{DataFrame, SaveMode}
    spark.sql("CREATE DATABASE IF NOT EXISTS stream_sink")
    spark.sql("DROP TABLE IF EXISTS stream_sink.events_fb")
    val input = MemoryStream[Ev]
    val q = input.toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The standard idempotent-sink pattern: batchId travels with the
        // rows so a replayed batch can be deduplicated/overwritten.
        batch.withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).saveAsTable("stream_sink.events_fb")
      }
      .start()
    try {
      input.addData(Ev(ts(0, 0), "click", 1.0, 1))
      q.processAllAvailable()
      input.addData(Ev(ts(1, 0), "view", 2.0, 2), Ev(ts(2, 0), "click", 3.0, 1))
      q.processAllAvailable()
      val rows = spark.table("stream_sink.events_fb")
        .select("event_type", "batch_id").as[(String, Long)].collect().toSeq
      assert(rows.length === 3)
      assert(rows.map(_._2).distinct.sorted === Seq(0L, 1L))
    } finally q.stop()
  }

  test("sliding windows overlap: one event lands in two 10m/5m windows") {
    val input = MemoryStream[Ev]
    val rows = runStream(
      input, df => EventPipelines.slidingCounts(df), OutputMode.Complete(),
      Seq(Seq(Ev(ts(7, 0), "click", 1.0, 1))))
    val starts = rows.map(_.getTimestamp(0).toString).toSet
    assert(starts === Set("2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0"))
  }

  test("transformWithState keeps per-user running totals across batches") {
    import EventPipelines.Event
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState requires the RocksDB state store provider.
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val name = s"mem_${System.nanoTime()}"
      val q = EventPipelines.runningTotals(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(Event(1L, ts(0, 0), 2.0), Event(1L, ts(1, 0), 3.0), Event(2L, ts(0, 0), 1.0))
        q.processAllAvailable()
        input.addData(Event(1L, ts(2, 0), 5.0))
        q.processAllAvailable()
        val rows = spark.table(name)
          .as[(Long, Long, Double)].collect()
        // Update mode emits one row per touched key per batch; the latest
        // row per user carries the accumulated state.
        val latest = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
        assert(latest(1L) === ((1L, 3L, 10.0)))
        assert(latest(2L) === ((2L, 1L, 1.0)))
        // state really crossed batches: batch 2's user-1 row is (3, 10.0)
        assert(rows.count(_._1 == 1L) === 2)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("file-source streaming: new parquet files are picked up incrementally") {
    import org.apache.spark.sql.types._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-filestream").toString
    val schema = new StructType()
      .add("ts", TimestampType).add("event_type", StringType)
      .add("value", DoubleType).add("user_id", LongType)
    // Seed one file BEFORE the stream starts, then drop a second mid-stream:
    // the file source must process both, each exactly once.
    Seq(Ev(ts(0, 0), "click", 1.0, 1)).toDF().write.mode("append").parquet(srcDir)
    val name = s"mem_${System.nanoTime()}"
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      Seq(Ev(ts(1, 0), "click", 2.0, 2), Ev(ts(2, 0), "view", 3.0, 3))
        .toDF().write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val counts = spark.table(name).as[(String, Long)].collect().toMap
      assert(counts === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to clicks within the horizon") {
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.attributePurchases(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Ev(ts(0, 0), "click", 0.0, 1),   // matched 5 min later
        Ev(ts(0, 0), "click", 0.0, 3))   // purchase arrives past the horizon
      purchases.addData(
        Ev(ts(5, 0), "purchase", 9.99, 1),
        Ev(ts(20, 0), "purchase", 5.0, 2),  // no click at all
        Ev(ts(15, 0), "purchase", 7.0, 3))  // 15 min after the click: outside
      q.processAllAvailable()
      val got = spark.table(name)
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      assert(got === Set((1L, 9.99)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unconverted clicks after the " +
    "watermark passes, exactly once") {
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.attributeWithUnconverted(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Ev(ts(0, 0), "click", 0.0, 1),  // converts 5 min later
        Ev(ts(0, 0), "click", 0.0, 3))  // never converts inside the horizon
      purchases.addData(
        Ev(ts(5, 0), "purchase", 9.99, 1),
        Ev(ts(15, 0), "purchase", 7.0, 3)) // 15 min out: beyond the horizon
      q.processAllAvailable()
      // Advance event time far past click_ts + horizon + watermark on BOTH
      // streams (the watermark is the min across inputs), so user 3's
      // buffered click must be evicted null-padded.
      clicks.addData(Ev(ts(120, 0), "click", 0.0, 99))
      purchases.addData(Ev(ts(120, 0), "purchase", 1.0, 98))
      q.processAllAvailable()
      val got = spark.table(name)
        .select("user_id", "unconverted").as[(Long, Boolean)].collect().toSeq
        .filter(r => r._1 != 99L && r._1 != 98L)
      assert(got.toSet === Set((1L, false), (3L, true)),
        s"expected one conversion and one watermark-evicted null row, got $got")
      assert(got.size === 2, s"a click emitted more than once: $got")

      // Batch twin on static frames agrees on the converted/unconverted split.
      val batch = EventPipelines.attributeWithUnconverted(
          Seq(Ev(ts(0, 0), "click", 0.0, 1), Ev(ts(0, 0), "click", 0.0, 3)).toDF(),
          Seq(Ev(ts(5, 0), "purchase", 9.99, 1), Ev(ts(15, 0), "purchase", 7.0, 3)).toDF())
        .select("user_id", "unconverted").as[(Long, Boolean)].collect().toSet
      assert(batch === Set((1L, false), (3L, true)))
    } finally q.stop()
  }

  test("stream-stream join equals the same transform on batch frames") {
    val clickRows = Seq(
      Ev(ts(0, 0), "click", 0.0, 1), Ev(ts(2, 0), "click", 0.0, 2),
      Ev(ts(0, 0), "click", 0.0, 3))
    val purchaseRows = Seq(
      Ev(ts(5, 0), "purchase", 9.99, 1), Ev(ts(11, 0), "purchase", 4.0, 2),
      Ev(ts(15, 0), "purchase", 7.0, 3))
    val batch = EventPipelines
      .attributePurchases(clickRows.toDF(), purchaseRows.toDF())
      .select("user_id", "value").as[(Long, Double)].collect().toSet

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val name = s"mem_${System.nanoTime()}"
    val q = EventPipelines.attributePurchases(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(clickRows)
      purchases.addData(purchaseRows)
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(batch === Set((1L, 9.99), (2L, 4.0)))
    } finally q.stop()
  }
}
