package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.Similarity

class SignLshNearDupSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("e08 pruned pairs equal the exact all-pairs answer (recall 1.0 on fixture)") {
    val pruned = Similarity.e08EmbeddingNearDupPruned.run(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // Exact all-pairs ground truth computed inline over the FULL corpus —
    // e05 is now bounded to an id sample (no registered O(n²) plan), so
    // the full-corpus brute force lives only here, at fixture scale.
    graft.functions.GraftFunctions.register(spark)
    val c = graft.queries.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val exact = c.select(col("vec_id").as("vec_a"), col("emb").as("ea"))
      .join(c.select(col("vec_id").as("vec_b"), col("emb").as("eb")),
        col("vec_a") < col("vec_b"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(pruned === exact)
  }

  test("e05 bounded sample: id filter reaches the parquet scan") {
    val plan = Similarity.e05EmbeddingNearDup.run(spark, dir)
      .queryExecution.executedPlan.toString
    // Both join inputs scan with the pushed vec_id bound — the registered
    // pairwise work is sample², never corpus².
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,300)]"),
      s"expected pushed vec_id<300 filter in:\n$plan")
  }

  test("e08 plan has no all-pairs operator (no CartesianProduct, no BNLJ)") {
    val plan = Similarity.e08EmbeddingNearDupPruned.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("SignBandKeys codegen expression matches the composable HOF form") {
    import org.apache.spark.sql.graftbridge.GraftPlanBridge
    val p = SignLshNearDup.Params()
    val c = graft.queries.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val planes = Similarity.hyperplanes(p.nPlanes, 64, p.seed)
    val fused = GraftPlanBridge.column(graft.functions.SignBandKeys(
      GraftPlanBridge.expression(col("emb")),
      planes.flatten.toArray, 64, p.bands, p.rowsPerBand))
    val planesLit = array(planes.map(pl => array(pl.map(lit): _*)): _*)
    val bits = transform(planesLit,
      pl => when(graft.functions.VectorOps.dot(col("emb"), pl) > 0, 1).otherwise(0))
    val hof = transform(
      sequence(lit(0), lit(p.bands - 1)),
      b => (0 until p.rowsPerBand).map { j =>
        element_at(bits, b * p.rowsPerBand + j + 1) * lit(1 << j)
      }.reduce(_ + _))
    val rows = c.select(col("vec_id"), fused.as("f"), hof.as("h"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f, h) => assert(f === h, s"vec $id") }
  }

  test("near-dup-regime banding prunes a clustered corpus and keeps exact recall") {
    // 40 clusters × 10 members: members are small perturbations of a base
    // vector (intra-cluster cos ≫ 0.9), bases are independent gaussians
    // (inter-cluster cos ≈ 0 at dim 64) — the shape of a REAL near-dup
    // corpus, where banding at near-dup thresholds discriminates.
    val r = new scala.util.Random(1234)
    def gauss(d: Int) = Seq.fill(d)(r.nextGaussian())
    val rows = (0 until 40).flatMap { c =>
      val base = gauss(64)
      (0 until 10).map { m =>
        val v = base.zip(gauss(64)).map { case (b, n) => b + 0.05 * n }
        (c * 10L + m, v)
      }
    }
    val df = rows.toDF("id", "vec")
    val p = SignLshNearDup.Params(bands = 16, rowsPerBand = 8, tau = 0.9, seed = 42L)

    val nCand = SignLshNearDup.candidatePairs(df, "id", "vec", p).count()
    val allPairs = 400L * 399 / 2
    // Background collision p≈0.5^8 per band ⇒ a few % of all pairs survive.
    assert(nCand < allPairs / 4, s"pruning did not engage: $nCand of $allPairs")

    val got = SignLshNearDup.pairs(df, "id", "vec", p)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val exact = df.select(col("id").as("id_a"), col("vec").as("va"))
      .join(df.select(col("id").as("id_b"), col("vec").as("vb")), col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.VectorOps.dot(col("va"), col("vb")) /
          (sqrt(graft.functions.VectorOps.sumSquares(col("va"))) *
            sqrt(graft.functions.VectorOps.sumSquares(col("vb")))))
      .filter(col("cos") >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 40 * 45 / 2, s"fixture degenerate: only ${exact.size} true pairs")
    assert(got === exact)
  }
}
