package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.{Similarity, Tables}

/** Pins [[SemanticDedup]] against a driver-side brute-force replay: the
  * greedy keep-first drop rule is simple enough to recompute exactly in
  * plain Scala over the collected sf0.001 corpus (500 × 64 doubles), which
  * makes the check independent of every Spark expression the operator
  * itself uses. */
class SemanticDedupSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  private val Tau = 0.35

  /** The operator thresholds on the 6-dp ROUNDED cosine (cross-engine ulp
    * discipline) — the replay must apply the identical rule. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val corpus: Map[Long, Array[Double]] =
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap

  /** Brute-force nearest-centroid assignment with the operator's contract:
    * argmin of round(dist, 6), ties to the lower cluster id. */
  private lazy val clusterOf: Map[Long, Int] = {
    val cents = corpus.filter(_._1 < 8).toSeq.sortBy(_._1)
      .zipWithIndex.map { case ((id, v), _) => (id.toInt, v) }
    corpus.map { case (id, v) =>
      val best = cents.map { case (c, cv) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
        (BigDecimal(math.sqrt(d)).setScale(6, BigDecimal.RoundingMode.HALF_UP), c)
      }.min
      id -> best._2
    }
  }

  test("sd01 drops exactly the vectors with a lower-id in-threshold cell neighbor") {
    val got = Similarity.sd01SemanticDedup.run(spark, dir)
      .select($"cluster", $"vec_id", $"dup_of", $"cosine")
      .as[(Int, Long, Long, Double)].collect().toSeq

    val ids = corpus.keys.toSeq.sorted
    val expected = ids.flatMap { b =>
      val lower = ids.filter(a => a < b && clusterOf(a) == clusterOf(b) &&
        r6(cosine(corpus(a), corpus(b))) >= Tau)
      lower.headOption.map(a => (clusterOf(b), b, a))
    }
    assert(got.map(r => (r._1, r._2, r._3)).sorted === expected.sorted)
    got.foreach { case (cl, id, dupOf, cos) =>
      assert(dupOf < id)
      assert(clusterOf(id) === cl && clusterOf(dupOf) === cl)
      // rounded pair cosine matches the brute-force value
      assert(math.abs(cos - r6(cosine(corpus(dupOf), corpus(id)))) < 1e-12,
        s"pair ($dupOf,$id)")
    }
  }

  test("survivors have no lower-id in-threshold neighbor in their cell") {
    val dropped = Similarity.sd01SemanticDedup.run(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    val ids = corpus.keys.toSeq.sorted
    ids.filterNot(dropped).foreach { b =>
      ids.filter(a => a < b && clusterOf(a) == clusterOf(b)).foreach { a =>
        assert(r6(cosine(corpus(a), corpus(b))) < Tau,
          s"survivor $b has in-threshold lower neighbor $a")
      }
    }
  }

  test("pairwise work is cell-local: no CartesianProduct in the plan") {
    val plan = Similarity.sd01SemanticDedup.run(spark, dir)
      .queryExecution.executedPlan.toString
    // The assignment pass is corpus × broadcast(8 centroids) — a bounded
    // BNLJ by design. The DISALLOWED shape is an unkeyed pair join.
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sd02 two-level: every drop is a true >= tau pair with a lower id") {
    val got = Similarity.sd02SemanticDedupIvf.run(spark, dir)
      .select($"vec_id", $"dup_of", $"cosine")
      .as[(Long, Long, Double)].collect().toSeq
    got.foreach { case (id, dupOf, cos) =>
      assert(dupOf < id)
      val truth = r6(cosine(corpus(dupOf), corpus(id)))
      assert(truth >= Tau, s"pair ($dupOf,$id) cosine $truth below tau")
      assert(math.abs(cos - truth) < 1e-12, s"pair ($dupOf,$id)")
    }
  }

  test("sd02 two-level agrees with flat sd01 on >= 90% of its drops") {
    val flat = Similarity.sd01SemanticDedup.run(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    val routed = Similarity.sd02SemanticDedupIvf.run(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    val agree = (flat & routed).size.toDouble / flat.size
    assert(agree >= 0.90, s"agreement $agree (flat ${flat.size}, routed ${routed.size})")
  }

  test("sd02 plan: no CartesianProduct, fine probe joined on the coarse key") {
    val plan = Similarity.sd02SemanticDedupIvf.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
