package graft.queries

import java.sql.Date

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TimeSeriesSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("t01 gap-fill densifies to the full nation x day calendar") {
    val rows = Tables.nation(spark, dir).count() * 59 // 1995-01-01..02-28
    val got = TimeSeries.t01GapFill.run(spark, dir)
    assert(got.count() === rows)
    // gap rows carry zero orders; activity rows carry at least one
    val bad = got.filter(
      ($"is_gap" && $"n_orders" =!= 0L) || (!$"is_gap" && $"n_orders" === 0L))
    assert(bad.count() === 0)
  }

  test("t01 carries the last observed revenue forward across gaps") {
    val got = TimeSeries.t01GapFill.run(spark, dir)
      .select($"n_nationkey", $"d".cast("date"), $"n_orders", $"rev_filled", $"is_gap")
      .as[(Int, Date, Long, Option[Double], Boolean)].collect()
      .groupBy(_._1)
    got.values.foreach { series =>
      var carried: Option[Double] = None
      series.sortBy(_._2.toLocalDate.toEpochDay).foreach {
        case (nation, d, _, filled, isGap) =>
          if (!isGap) {
            assert(filled.isDefined, s"nation $nation day $d: active day unfilled")
            carried = filled
          } else {
            assert(filled === carried, s"nation $nation day $d: carry mismatch")
          }
      }
    }
  }

  test("t02 EWMA is a convex combination of the trailing revenues") {
    val got = TimeSeries.t02Ewma.run(spark, dir)
      .select($"r_regionkey", $"mon".cast("date"), $"rev", $"ewma")
      .as[(Int, Date, Double, Double)].collect()
      .groupBy(_._1)
    got.values.foreach { series =>
      val ordered = series.sortBy(_._2.toLocalDate.toEpochDay).toSeq
      ordered.zipWithIndex.foreach { case ((region, mon, _, ewma), i) =>
        val lags = ordered.slice(math.max(0, i - 5), i + 1).map(_._3)
        val eps = 1e-9 * math.max(1.0, lags.map(math.abs).max)
        assert(ewma >= lags.min - eps && ewma <= lags.max + eps,
          s"region $region month $mon: ewma $ewma outside [${lags.min}, ${lags.max}]")
      }
      // a series head has no lags: ewma degenerates to the raw value
      assert(math.abs(ordered.head._4 - ordered.head._3) < 1e-9)
    }
  }

  test("t03 bars bound their own open/close and match a window-route replay") {
    val got = TimeSeries.t03OhlcBars.run(spark, dir)
    val n = got.count()
    assert(n > 0)
    assert(got.filter(
      $"low" > least($"open", $"close") || $"high" < greatest($"open", $"close") ||
        $"n_events" < 1).count() === 0)

    // Independent route: row_number windows (the oracle's shape) in Spark.
    val e = Tables.events(spark, dir)
      .select($"event_type", date_trunc("day", $"ts").as("d"),
        $"ts", $"event_id", $"value")
    val wf = Window.partitionBy("event_type", "d").orderBy($"ts", $"event_id")
    val wl = Window.partitionBy("event_type", "d")
      .orderBy($"ts".desc, $"event_id".desc)
    val replay = e
      .withColumn("rf", row_number().over(wf))
      .withColumn("rl", row_number().over(wl))
      .groupBy("event_type", "d")
      .agg(
        max(when($"rf" === 1, $"value")).as("open"),
        max($"value").as("high"), min($"value").as("low"),
        max(when($"rl" === 1, $"value")).as("close"),
        count(lit(1)).as("n_events"))
    assert(got.exceptAll(replay).count() === 0 &&
      replay.exceptAll(got).count() === 0)
  }

  test("t04 trailing-hour counts match a driver-side two-pointer replay") {
    val events = Tables.events(spark, dir)
      .select($"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect()
    val expected = events.groupBy(_._2).iterator.flatMap { case (_, g) =>
      val sorted = g.sortBy(_._3)
      sorted.iterator.map { case (id, _, us) =>
        id -> sorted.count(e => e._3 >= us - 3600000000L && e._3 <= us).toLong
      }
    }.toMap
    val got = TimeSeries.t04RollingHour.run(spark, dir)
      .select($"event_id", $"n_trailing_hr").as[(Long, Long)].collect()
    assert(got.length === events.length)
    got.foreach { case (id, n) =>
      assert(n === expected(id), s"event $id trailing-hour count")
    }
  }

  test("t05 bucketed rewrite is row-identical to t04, including exact " +
    "bucket-boundary and range-boundary events") {
    import org.apache.spark.sql.Row
    // Hand-built pathological rows: events exactly ON an hour-bucket edge,
    // exactly range-distant (inclusive), 1µs outside (exclusive), and a
    // frame spanning two buckets — plus a second key to prove isolation.
    val hr = 3600000000L
    val rows = Seq(
      (1L, "a", 0L, 1.00), (2L, "a", hr, 2.00),        // exactly 1h apart: inclusive
      (3L, "a", 2 * hr + 1L, 4.00),                    // 1µs past 2's hour: excluded
      (4L, "a", 2 * hr + hr / 2, 8.00),                // mid-bucket, sees 3
      (5L, "b", hr, 16.00))                            // other key, same instant as 2
    val df = spark.createDataFrame(rows).toDF("event_id", "event_type", "us", "value")
      .select($"event_id", $"event_type",
        timestamp_micros($"us").as("ts"), $"value")
    val t04 = TimeSeries.rollingHourWindowPlan(df).collect().toSeq
    val t05 = TimeSeries.rollingHourBucketed(df).collect().toSeq
    assert(t04 === t05)
    val byId = t05.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("t03 plans as one partial-aggregable pass (no window exchange)") {
    val plan = TimeSeries.t03OhlcBars.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(12).mkString("\n"))
  }
}
