package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkylineSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("skyline keeps exactly the non-dominated points") {
    // (id, d1, d2) maximizing both dims.
    val pts = Seq(
      (1L, 5.0, 1.0),   // skyline (best d1)
      (2L, 3.0, 3.0),   // skyline
      (3L, 1.0, 5.0),   // skyline (best d2)
      (4L, 2.0, 2.0),   // dominated by 2
      (5L, 3.0, 1.0),   // dominated by 1 and 2
      (6L, 3.0, 3.0))   // tie with 2: mutually non-dominating → kept
      .toDF("id", "d1", "d2")
    val got = Skyline.skyline(pts, Seq("d1", "d2"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 6L))
  }

  test("matches brute-force dominance on random data across partitionings") {
    val r = new scala.util.Random(11)
    val data = (1L to 300L).map(i => (i, r.nextDouble(), r.nextDouble()))
    def brute: Set[Long] = data.filter { p =>
      !data.exists(q =>
        q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    }.map(_._1).toSet
    Seq(1, 4, 13).foreach { parts =>
      val got = Skyline.skyline(
        data.toDF("id", "d1", "d2").repartition(parts), Seq("d1", "d2"))
        .select("id").as[Long].collect().toSet
      assert(got === brute, s"partitions=$parts")
    }
  }

  test("wide inputs get a √P middle merge level; narrow inputs do not") {
    val pts = (1L to 100L).map(i => (i, i.toDouble, (101 - i).toDouble))
      .toDF("id", "d1", "d2") // anti-correlated: every point on the front
    def mapLevels(plan: String): Int = "MapPartitions".r.findAllIn(plan).size
    val widePlan = Skyline.skyline(pts.repartition(16), Seq("d1", "d2"))
      .queryExecution.optimizedPlan.toString
    assert(widePlan.contains("Repartition 4, true"),
      s"expected a √16 = 4-way middle merge:\n$widePlan")
    assert(mapLevels(widePlan) === 3, s"local + middle + final:\n$widePlan")
    val narrowPlan = Skyline.skyline(pts.repartition(2), Seq("d1", "d2"))
      .queryExecution.optimizedPlan.toString
    assert(mapLevels(narrowPlan) === 2,
      s"narrow input should skip the middle level:\n$narrowPlan")
    // Anti-correlated worst case still exact through the tree.
    val got = Skyline.skyline(pts.repartition(16), Seq("d1", "d2"))
      .count()
    assert(got === 100L)
  }

  test("single dimension degenerates to the max (with ties)") {
    val pts = Seq((1L, 2.0), (2L, 9.0), (3L, 9.0), (4L, 1.0)).toDF("id", "d")
    val got = Skyline.skyline(pts, Seq("d")).select("id").as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }
}
