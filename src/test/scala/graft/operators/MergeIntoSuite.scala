package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MergeIntoSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 100.0),
    (2L, "bob", 200.0),
    (3L, "carol", 300.0)).toDF("id", "name", "bal")

  test("all three MERGE branches: update, insert, keep") {
    val source = Seq(
      (2L, 50.0, "ignored"), // matched → update
      (9L, 900.0, "dave")) // not matched by target → insert
      .toDF("id", "delta", "new_name")
    val out = MergeInto.merge(
      target, source, "id",
      whenMatched = Map("bal" -> (col("t.bal") + col("s.delta"))),
      whenNotMatched = Some(Map(
        "id" -> col("s.id"), "name" -> col("s.new_name"),
        "bal" -> col("s.delta"))))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "alice", 100.0), // not matched by source → kept
      (2L, "bob", 250.0), // updated
      (3L, "carol", 300.0),
      (9L, "dave", 900.0))) // inserted
  }

  test("update-only merge (no insert clause) drops source-only rows") {
    val source = Seq((1L, 1.0), (9L, 9.0)).toDF("id", "delta")
    val out = MergeInto.merge(
      target, source, "id",
      whenMatched = Map("bal" -> (col("t.bal") + col("s.delta"))),
      whenNotMatched = None)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "alice", 101.0), (2L, "bob", 200.0), (3L, "carol", 300.0)))
  }

  test("unset insert columns become null") {
    val source = Seq((9L, 9.0)).toDF("id", "delta")
    val out = MergeInto.merge(
      target, source, "id",
      whenMatched = Map.empty,
      whenNotMatched = Some(Map("id" -> col("s.id"), "bal" -> col("s.delta"))))
    val inserted = out.filter(col("id") === 9L).collect().head
    assert(inserted.isNullAt(out.columns.indexOf("name")))
    assert(inserted.getDouble(out.columns.indexOf("bal")) === 9.0)
  }
}
