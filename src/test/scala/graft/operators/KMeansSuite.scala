package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KMeansSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three well-separated 2-D blobs, 30 points each, deterministic jitter. */
  private def blobs = {
    val r = new scala.util.Random(7)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 10.0))
    centers.zipWithIndex.flatMap { case ((cx, cy), b) =>
      (0 until 30).map(i =>
        (b * 100L + i, Seq(cx + r.nextGaussian() * 0.5, cy + r.nextGaussian() * 0.5)))
    }.toDF("id", "vec")
  }

  test("recovers well-separated blobs exactly") {
    val out = KMeans.fit(blobs, "id", "vec", k = 3, iters = 5)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect()
    // Every blob maps to exactly one cluster and clusters don't mix.
    val byBlob = out.groupBy(_._1 / 100).map { case (b, xs) => b -> xs.map(_._2).toSet }
    assert(byBlob.values.forall(_.size == 1), s"mixed blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
  }

  test("assignments are identical across partitionings") {
    val base = blobs
    val runs = Seq(1, 4, 13).map { p =>
      KMeans.fit(base.repartition(p), "id", "vec", k = 3, iters = 3)
        .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2),
      "assignments flapped under repartitioning — centroid means are not order-free")
  }

  test("inertia is non-increasing over iterations") {
    def inertia(iters: Int): Double =
      KMeans.fit(blobs, "id", "vec", k = 3, iters = iters)
        .agg(sum(col("dist2").cast("decimal(28,10)")).cast("double")).head.getDouble(0)
    val seq = (0 to 3).map(inertia)
    seq.sliding(2).foreach { case scala.collection.Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: $seq")
    }
  }

  test("iters=0 equals plain nearest-centroid assignment to the seeds") {
    val seeds = blobs.orderBy("id").limit(3)
      .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i, v) }.toSeq
    val cents = seeds.toDF("cluster", "cvec")
    val direct = KMeans.assign(blobs, cents, "id", "vec")
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    val fitted = KMeans.fit(blobs, "id", "vec", k = 3, iters = 0)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    assert(direct == fitted)
  }

  test("assign() equals the brute-force argmin on random vectors") {
    val r = new scala.util.Random(23)
    val vecs = (1L to 80L).map(i => (i, Seq.fill(6)(r.nextDouble() * 4 - 2)))
    val cents = (0 until 5).map(c => (c, Seq.fill(6)(r.nextDouble() * 4 - 2)))
    val got = KMeans.assign(
        vecs.toDF("id", "vec"), cents.toDF("cluster", "cvec"), "id", "vec")
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    val brute = vecs.map { case (id, v) =>
      id -> cents.map { case (c, cv) =>
        (v.zip(cv).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }, c)
      }.min._2
    }.toMap
    assert(got === brute)
  }

  test("assignTwoLevel never loses vectors when coarse groups empty out") {
    // Duplicate centroid vectors: ties break to the lower coarse index,
    // so one coarse group ends Lloyd's with no member centroids. Its
    // stale center must not be a probe target — with nprobe=1 a vector
    // probing only that group would match nothing in the fine join and
    // silently vanish.
    val cents = Seq(
      (0, Seq(0.0, 0.0)), (1, Seq(0.0, 0.0)),
      (2, Seq(0.0, 0.0)), (3, Seq(10.0, 10.0))).toDF("cluster", "cvec")
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.1)), (3L, Seq(9.0, 9.0)))
      .toDF("id", "vec")
    val out = KMeans.assignTwoLevel(vecs, cents, "id", "vec", nprobe = 1)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L), s"lost vectors: $out")
    assert(out(1L) === 0 && out(2L) === 0 && out(3L) === 3)
  }

  test("assignTwoLevel on an empty centroid frame returns empty, like assign") {
    val cents = Seq.empty[(Int, Seq[Double])].toDF("cluster", "cvec")
    val vecs = Seq((1L, Seq(0.0, 0.0))).toDF("id", "vec")
    val out = KMeans.assignTwoLevel(vecs, cents, "id", "vec", nprobe = 2)
    assert(out.columns.toSeq === Seq("id", "vec", "cluster", "dist2"))
    assert(out.count() === 0L)
  }

  test("empty cluster keeps its previous centroid instead of crashing") {
    // k=3 over 2 distinct points: one seed never wins any point.
    val tiny = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(5.0, 5.0))).toDF("id", "vec")
    val out = KMeans.fit(tiny, "id", "vec", k = 3, iters = 2)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    assert(out.size == 3)
    assert(out(1L) == out(2L) && out(1L) != out(3L))
  }
}
