package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test: the union-trick as-of join equals a naive per-row
  * reference computation on random datasets (random keys, times, ties,
  * matchless keys).
  */
class AsOfJoinPropertySuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def forAllSamples[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private case class Case(
      left: List[(Long, Long)],          // (key, timeOffsetSec)
      right: List[(Long, Long, Int)])    // (key, timeOffsetSec, payload)

  private val caseGen: Gen[Case] = for {
    nL <- Gen.choose(1, 25)
    nR <- Gen.choose(0, 25)
    left <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    right <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L), Gen.choose(0, 999)))
  } yield Case(left, right.map { case (k, t, p) => (k, t, p) })

  test("asOf equals the naive most-recent-match reference on random data") {
    forAllSamples(caseGen, n = 25) { c =>
      // Deduplicate right on (key, time) — the operator's documented
      // precondition; keep the max payload as the canonical row.
      val rightDedup = c.right.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList

      val leftDf = c.left.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(base + t * 1000)) }
        .toDF("id", "k", "ts")
      val rightDf = rightDedup
        .map { case (k, t, p) => (k, new Timestamp(base + t * 1000), p) }
        .toDF("k", "rts", "payload")

      val got = AsOfJoin.asOf(leftDf, rightDf,
        col("k"), col("k"), col("ts"), col("rts"), Seq("payload"))
        .select("id", "payload").as[(Long, Option[Int])].collect().toMap

      val want = c.left.zipWithIndex.map { case ((k, t), i) =>
        val matches = rightDedup.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.maxBy(_._2)._3))
      }.toMap

      assert(got === want, s"case: $c")
    }
  }
}
