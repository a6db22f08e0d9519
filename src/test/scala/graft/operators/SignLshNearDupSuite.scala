package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.Similarity

class SignLshNearDupSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("e08 pruned pairs equal the exact all-pairs answer on its bounded sample") {
    val pruned = Similarity.e08EmbeddingNearDupPruned.run(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // Exact ground truth over the same vec_id < 300 sample (e08's bound —
    // the fixture-τ banding is oracle-gated on the sample; the production
    // regime runs full-corpus as e09).
    graft.functions.GraftFunctions.register(spark)
    val c = graft.queries.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 300)
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

  test("e05 and e08 bounded samples: id filter reaches the parquet scan") {
    // Loose match (ADVICE round 7): exact PushedFilters rendering is
    // engine-version-specific; assert the bound appears within a
    // PushedFilters clause rather than pinning the full bracketed list.
    val pushedBound = """PushedFilters: \[[^\]]*LessThan\(vec_id,300\)""".r
    Seq(Similarity.e05EmbeddingNearDup, Similarity.e08EmbeddingNearDupPruned)
      .foreach { q =>
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        assert(pushedBound.findFirstIn(plan).isDefined,
          s"expected pushed vec_id<300 filter in ${q.name}:\n$plan")
      }
  }

  test("e08/e09 plans have no all-pairs operator (no CartesianProduct, no BNLJ)") {
    Seq(Similarity.e08EmbeddingNearDupPruned, Similarity.e09EmbeddingNearDupProduction)
      .foreach { q =>
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"${q.name}: $plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"${q.name}: $plan")
      }
  }

  test("e09 runs the production band contract (key width >= 16 bits) and " +
    "recovers exactly the planted + background >= 0.8 pairs") {
    // The contract the round-7 probe measured sub-linear: 2^16 buckets per
    // band. A parameterization drift back to fixture-width keys would
    // silently re-register the anti-scaling shape.
    assert(Similarity.e09Params.rowsPerBand >= 16,
      s"e09 band-key width ${Similarity.e09Params.rowsPerBand} < 16 bits")
    assert(Similarity.e09Params.tau >= 0.8)

    val got = Similarity.e09EmbeddingNearDupProduction.run(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // Exact all-pairs ground truth over the same planted corpus, fixture
    // scale only (the brute force lives in the suite, not the registry).
    graft.functions.GraftFunctions.register(spark)
    val c = Similarity.plantedCorpus(spark, dir)
    val exact = c.select(col("vec_id").as("vec_a"), col("emb").as("ea"))
      .join(c.select(col("vec_id").as("vec_b"), col("emb").as("eb")),
        col("vec_a") < col("vec_b"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= Similarity.e09Params.tau)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    // Every planted twin qualifies and is found; nothing else collides.
    assert(exact.size >= 40, s"fixture degenerate: ${exact.size} true pairs")
    assert(got === exact)
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
