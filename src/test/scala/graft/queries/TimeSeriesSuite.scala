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

  test("t03 plans as one partial-aggregable pass (no window exchange)") {
    val plan = TimeSeries.t03OhlcBars.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(12).mkString("\n"))
  }
}
