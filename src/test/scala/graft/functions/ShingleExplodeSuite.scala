package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ShingleExplodeSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("generator output equals the relational shingles() on the fixture corpus") {
    GraftFunctions.register(spark)
    val docs = graft.queries.Tables.documents(spark, SparkTestSession.sfDir)
    val viaGen = docs
      .select(col("doc_id"), expr("graft_shingles(text, 2)").as("shingle"))
      .as[(Long, String)].collect().toSet
    val viaRel = docs
      .select(col("doc_id"),
        explode(graft.operators.MinHashLsh.shingles(col("text"), 2)).as("shingle"))
      .as[(Long, String)].collect().toSet
    assert(viaGen === viaRel)
  }

  test("short documents and NULL text produce no rows, n=1 emits distinct tokens") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "one"), (2L, null.asInstanceOf[String]), (3L, "a b a b"))
      .toDF("id", "text")
    val bi = df.select(col("id"), expr("graft_shingles(text, 2)").as("s"))
      .as[(Long, String)].collect().toSet
    assert(bi === Set((3L, "a b"), (3L, "b a")))
    val uni = df.select(col("id"), expr("graft_shingles(text, 1)").as("s"))
      .as[(Long, String)].collect().toSet
    assert(uni === Set((1L, "one"), (3L, "a"), (3L, "b")))
  }

  test("n=3 emits true trigrams, matching the relational shingles()") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val viaGen = df.select(col("id"), expr("graft_shingles(text, 3)").as("s"))
      .as[(Long, String)].collect().toSet
    assert(viaGen === Set((1L, "a b c"), (1L, "b c d")))
    val viaRel = df.select(col("id"),
        explode(graft.operators.MinHashLsh.shingles(col("text"), 3)).as("s"))
      .as[(Long, String)].collect().toSet
    assert(viaGen === viaRel)
  }

  test("tabs and newlines tokenize exactly like the SQL route") {
    GraftFunctions.register(spark)
    // SQL trim() strips spaces only — a leading tab must survive into the
    // split on BOTH routes (java String.trim would strip it and diverge).
    val df = Seq((1L, "\tfoo bar\n")).toDF("id", "text")
    val viaGen = df.select(expr("graft_shingles(text, 2)").as("s"))
      .as[String].collect().toSet
    val viaRel = df.select(
        explode(graft.operators.MinHashLsh.shingles(col("text"), 2)).as("s"))
      .as[String].collect().toSet
    assert(viaGen === viaRel)
  }

  test("non-literal n and non-string input are rejected at analysis") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "x y")).toDF("id", "text")
    intercept[Exception] {
      df.select(expr("graft_shingles(text, id)")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_shingles(id, 2)")).collect()
    }
  }
}
