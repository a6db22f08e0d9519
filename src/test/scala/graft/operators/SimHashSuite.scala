package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SimHashSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fingerprints(texts: (Long, String)*): Map[Long, Long] =
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), SimHash.simhash64(SimHash.tokens(col("text"))).as("h"))
      .as[(Long, Long)].collect().toMap

  private def hammingJvm(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("near-identical texts land within small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog near the old garden gate today"
    val fps = fingerprints(
      1L -> base,
      2L -> base.replace("gate", "fence"),
      3L -> "entirely different content about query engines and columnar storage formats")
    assert(hammingJvm(fps(1L), fps(2L)) <= 12,
      s"near-dup hamming ${hammingJvm(fps(1L), fps(2L))}")
    assert(hammingJvm(fps(1L), fps(3L)) >= 16,
      s"unrelated hamming ${hammingJvm(fps(1L), fps(3L))}")
  }

  test("simhash is deterministic and identical for identical text") {
    val t = "some stable text for determinism checks"
    val a = fingerprints(1L -> t, 2L -> t)
    assert(a(1L) === a(2L))
    val b = fingerprints(1L -> t)
    assert(a(1L) === b(1L))
  }

  test("relational simhashFrame equals the per-row expression form") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "spark shuffles and broadcast joins"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val rel = SimHash.simhashFrame(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val expr = docs
      .select(col("doc_id"), SimHash.simhash64(SimHash.tokens(col("text"))))
      .as[(Long, Long)].collect().toMap
    assert(rel === expr)
  }

  test("hamming column matches JVM bitCount") {
    val d = Seq((0x0FL, 0xF0L)).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b")).cast("int").as("h"))
      .as[Int].head()
    assert(d === 8)
  }
}
