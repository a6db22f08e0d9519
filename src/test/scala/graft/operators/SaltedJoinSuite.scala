package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SaltedJoinSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 10k rows of one hot key + a tail — the pathological shape.
    val large = ((1 to 10000).map(i => (7L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong % 5, s"tail$i"))).toDF("k", "payload")
    val small = Seq((7L, "seven"), (1L, "one"), (3L, "three")).toDF("k", "name")

    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted
    val salted = SaltedJoin.join(large, small, "k", buckets = 8)
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted
    assert(salted === plain)
    assert(plain.length === 10000 + 100 / 5 * 2)
  }

  test("small side is replicated buckets-fold before the join") {
    val small = Seq((1L, "a")).toDF("k", "v")
    val replicated = small.withColumn("_salt", explode(sequence(lit(0), lit(7))))
    assert(replicated.count() === 8)
    assert(replicated.select("_salt").as[Int].collect().sorted.toSeq === (0 to 7))
  }
}
