package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MinHashLshSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches the garden gate"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog while the cat watches the garden fence"
  private val unrelated =
    "completely different words about spark shuffles partitions and broadcast joins here"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated),
    (4L, "another unrelated short text entirely")).toDF("doc_id", "text")

  test("nearDupPairs finds the planted pair and nothing else") {
    val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("signatures are deterministic across runs") {
    val p = MinHashLsh.Params()
    val s1 = MinHashLsh.signatures(docs, "doc_id", "text", p)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    val s2 = MinHashLsh.signatures(docs, "doc_id", "text", p)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(s1 === s2)
    assert(s1(1L).length === p.nPerms)
  }

  test("identical texts share the full signature; jaccard = 1.0") {
    val two = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val out = MinHashLsh.nearDupPairs(two, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("signature similarity estimates jaccard (planted pair ≫ unrelated)") {
    val p = MinHashLsh.Params()
    val sigs = MinHashLsh.signatures(docs, "doc_id", "text", p)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / p.nPerms
    assert(est(1L, 2L) > 0.7, s"near-dup estimate ${est(1L, 2L)}")
    assert(est(1L, 3L) < 0.2, s"unrelated estimate ${est(1L, 3L)}")
  }

  test("relational signatures equal the per-row expression form") {
    val p = MinHashLsh.Params()
    val rel = MinHashLsh.signatures(docs, "doc_id", "text", p)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    val expr = docs
      .select(
        col("doc_id"),
        MinHashLsh.signature(MinHashLsh.shingles(col("text"), p.shingleSize), p.nPerms))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rel === expr)
  }

  test("shingles are distinct word n-grams") {
    val g = Seq((1L, "a b a b c")).toDF("doc_id", "text")
      .select(MinHashLsh.shingles(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(g.toSet === Set("a b", "b a", "b c"))
  }
}
