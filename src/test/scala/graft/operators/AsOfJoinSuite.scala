package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfJoinSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks the most recent right row at or before the left time, per key") {
    val left = Seq(
      (1L, 100L, t("2024-01-01 10:00:00")),
      (2L, 100L, t("2024-01-01 12:00:00")),
      (3L, 200L, t("2024-01-01 10:30:00")),
      (4L, 300L, t("2024-01-01 10:00:00"))) // key with no right rows
      .toDF("id", "key", "ts")
    val right = Seq(
      (100L, t("2024-01-01 09:00:00"), "a"),
      (100L, t("2024-01-01 11:00:00"), "b"),
      (100L, t("2024-01-01 13:00:00"), "c"),  // future: never matched
      (200L, t("2024-01-01 10:30:00"), "x"))  // exact tie: inclusive
      .toDF("key", "rts", "payload")
    val out = AsOfJoin.asOf(
      left, right,
      leftKey = col("key"), rightKey = col("key"),
      leftTime = col("ts"), rightTime = col("rts"),
      rightCols = Seq("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      1L -> Some("a"),   // 10:00 → latest ≤ is 09:00/a
      2L -> Some("b"),   // 12:00 → 11:00/b (13:00 is future)
      3L -> Some("x"),   // equal timestamps match inclusively
      4L -> None))       // no right rows for key 300
  }

  test("left columns are preserved verbatim") {
    val left = Seq((1L, 5L, t("2024-01-01 00:00:00"), "keepme")).toDF("id", "key", "ts", "tag")
    val right = Seq((5L, t("2023-12-31 00:00:00"), 42)).toDF("key", "rts", "v")
    val out = AsOfJoin.asOf(left, right, col("key"), col("key"), col("ts"), col("rts"), Seq("v"))
    assert(out.columns.toSeq === Seq("id", "key", "ts", "tag", "v"))
    assert(out.select("tag", "v").as[(String, Int)].head() === ("keepme", 42))
  }

  test("user columns named like the operator's internal columns don't clash") {
    // The internals (_k/_t/_side/_l/_r/_match) exist only at the top level
    // of the union frame; user columns ride inside the _l/_r structs, so
    // even exact name collisions with the internals must stay unambiguous.
    // Pins that invariant against refactors.
    val left = Seq((1L, 100L, t("2024-01-01 10:00:00"), "u"))
      .toDF("_side", "key", "ts", "_match")
    val right = Seq((100L, t("2024-01-01 09:00:00"), 7))
      .toDF("key", "rts", "_k")
    val out = AsOfJoin.asOf(left, right, col("key"), col("key"),
      col("ts"), col("rts"), Seq("_k"))
    assert(out.columns.toSeq === Seq("_side", "key", "ts", "_match", "_k"))
    assert(out.select("_side", "_match", "_k").as[(Long, String, Int)].head()
      === ((1L, "u", 7)))
  }
}
