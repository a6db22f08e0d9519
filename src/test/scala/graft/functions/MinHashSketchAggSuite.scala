package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.MinHashLsh

class MinHashSketchAggSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the garden gate"),
    (2L, "spark shuffles partitions and broadcast joins with adaptive execution"),
    (3L, "a b"),
    (4L, "singletoken")).toDF("doc_id", "text")

  test("sketch aggregate equals the relational 64-min-column signatures bit-for-bit") {
    GraftFunctions.register(spark)
    val p = MinHashLsh.Params()
    // The explicit relational reference: the public entry now ROUTES the
    // default family through the sketch, so the parity claim must compare
    // against the 64-min-column form directly.
    val relational = MinHashLsh.signaturesRelational(
        docs.select(col("doc_id").as("id"),
          MinHashLsh.shingles(col("text"), p.shingleSize).as("shingles")), p)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    val sketch = docs
      .select(col("doc_id").as("id"),
        explode(MinHashLsh.shingles(col("text"), p.shingleSize)).as("s"))
      .groupBy("id")
      .agg(GraftFunctions.minhash(xxhash64(col("s"))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sketch === relational)
  }

  test("merge across partitions gives the same signature as single-partition") {
    GraftFunctions.register(spark)
    val exploded = docs
      .select(col("doc_id").as("id"),
        explode(MinHashLsh.shingles(col("text"), 2)).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val one = exploded.repartition(1).groupBy("id")
      .agg(GraftFunctions.minhash(col("h")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val many = exploded.repartition(7).groupBy("id")
      .agg(GraftFunctions.minhash(col("h")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(one === many)
  }

  test("row-local signature expression equals the relational form bit-for-bit, " +
      "drops zero-shingle docs, and plans with zero Exchange") {
    GraftFunctions.register(spark)
    val p = MinHashLsh.Params()
    // "" shingles to nothing (single empty token, bigram window empty):
    // the relational explode emits NO row for it and the row-local filter
    // must drop it identically.
    val withEmpty = docs.union(Seq((5L, "")).toDF("doc_id", "text"))
    val sh = withEmpty.select(col("doc_id").as("id"),
      MinHashLsh.shingles(col("text"), p.shingleSize).as("shingles"))
    val relational = MinHashLsh.signaturesRelational(sh, p)
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    val rowLocal = MinHashLsh.signaturesSketch(sh, p)
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    assert(rowLocal === relational)
    assert(!rowLocal.map(_._1).contains(5L))
    val plan = MinHashLsh.signaturesSketch(sh, p)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local signatures must not shuffle:\n$plan")
  }

  test("works through SQL after registration; empty group gives NULL") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash(xxhash64(s)) AS sig
         FROM (SELECT doc_id, explode(split(lower(text), ' ')) AS s FROM mh_docs)
         GROUP BY doc_id""")
    assert(viaSql.count() === 4)
    val empty = spark.sql(
      "SELECT graft_minhash(xxhash64(s)) FROM (SELECT 1L AS s WHERE false)")
    assert(empty.head.isNullAt(0))
  }
}
