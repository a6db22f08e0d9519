package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded sign-LSH (random-hyperplane) pruning for embedding-cosine
  * near-duplicate pairs — SURVEY §2.12 "embedding-cosine near-dup", the
  * scale path that replaces the exact all-pairs self-join.
  *
  * Pipeline (mirrors [[MinHashLsh.nearDupPairs]]' proven shape):
  *
  *   embedding ──sign(dot(v, plane))──▶ bands·rowsPerBand sign bits
  *             ──r-bit slice per band──▶ (band_idx, band_key) rows
  *             ──self-join on band bucket──▶ candidate id pairs (distinct)
  *             ──exact cosine ≥ τ──▶ verified near-dup pairs
  *
  * The exact verify makes the output hash-family-independent: every emitted
  * pair provably satisfies the threshold, so a brute-force oracle stays
  * valid whenever banding recall is 1.0 on the data (the n02 precedent).
  *
  * Scale posture: sign bits are row-local — one whole-stage-codegen pass
  * over the plane matrix ([[graft.functions.SignBandKeys]]); the only
  * shuffles are the band-bucket equi-join (8-byte keys) and the pair
  * dedup — there is NO all-pairs operator in the plan at any data size.
  *
  * Regime honesty (measured on the fixture): hyperplane LSH discriminates
  * by the angular gap between qualifying and background pairs. At true
  * near-dup thresholds (cos ≥ 0.9, collision p≈0.86 vs 0.5 background)
  * candidates shrink to a few % of all pairs (SignLshNearDupSuite's
  * clustered-corpus test). The fixture corpus is isotropic (median pairwise
  * cos 0, planted tail barely over τ=0.4, p₁=0.63 vs p₂=0.5): by
  * concentration of measure NO sound-and-complete prune — metric cells,
  * grid projections, or LSH — beats brute force there (verified by probe:
  * triangle-inequality cell bounds admit 100% of cell pairs). The fixture
  * params therefore maximize recall margin, not pruning, and the exact
  * baseline twin (e05) remains the honest cost reference at that regime.
  *
  * Scale contract (measured, round 7 ScaleProbe): the banded self-join
  * emits ~bands·N²/2^rowsPerBand dissimilar-collision rows, so
  * `rowsPerBand` must grow like log₂N for the candidate set to stay
  * near-linear. The fixture defaults (3-bit keys, 8 buckets/band —
  * forced by τ=0.4's recall needs) measured 256× wall at ×10 data,
  * SLOWER than the exact all-pairs baseline; the production near-dup
  * regime (τ ≥ 0.8, affording bands=32/rowsPerBand=16 → 2¹⁶
  * buckets/band) measured 3.2× at ×10 and 15× at ×30 — sub-linear
  * (`signlsh_hi` in ScaleProbe, BASELINE.md). Both regimes are
  * oracle-gated registrations: e08 runs the fixture-τ defaults over a
  * bounded id sample (collision term capped at sample²), e09 runs the
  * production parameterization over the full corpus with planted
  * ground-truth pairs ([[graft.queries.Similarity.plantedCorpus]]).
  * Callers at scale size rowsPerBand to their corpus like e09 does.
  */
object SignLshNearDup {

  final case class Params(
      bands: Int = 48,
      rowsPerBand: Int = 3,
      tau: Double = 0.4,
      seed: Long = 42L) {
    def nPlanes: Int = bands * rowsPerBand
  }

  private def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  /** (id, band_idx, band_key) rows: one key per band, key = the band's
    * rowsPerBand sign bits packed little-endian, computed in one codegen'd
    * pass by [[graft.functions.SignBandKeys]]. Sign of `dot(v, plane)` is
    * scale-invariant, so vectors need no normalization. All row-local. */
  def bandKeys(embs: DataFrame, idCol: String, vecCol: String, p: Params,
      dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftPlanBridge
    val planes = graft.queries.Similarity.hyperplanes(p.nPlanes, dim, p.seed)
    val keys = GraftPlanBridge.column(graft.functions.SignBandKeys(
      GraftPlanBridge.expression(col(vecCol)),
      planes.flatten.toArray, dim, p.bands, p.rowsPerBand))
    embs
      .select(col(idCol).as("id"), posexplode(keys))
      .toDF("id", "band_idx", "band_key")
  }

  /** Distinct candidate pairs (id_a < id_b) sharing at least one band
    * bucket. Exposed separately so the suite can measure pruning. The band
    * frame is persisted: it feeds both sides of the self-join, and the
    * sign pass would otherwise run twice (MinHashLsh's shingle-frame
    * lesson). */
  def candidatePairs(embs: DataFrame, idCol: String, vecCol: String,
      p: Params): DataFrame = {
    val bk = bandKeys(embs, idCol, vecCol, p).persist()
    bk.as("x")
      .join(bk.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** Verified near-duplicate pairs: candidates from shared sign-LSH buckets,
    * then the exact cosine threshold. `embs` should carry double-precision
    * vectors; the verify cosine uses the engine's fused expression so values
    * are bit-comparable with the exact baseline (e05) and its oracle.
    *
    * Cache contract (same as [[MinHashLsh.nearDupPairs]]): the vector and
    * band frames are persisted because each feeds two plan branches; they
    * stay cached until the caller releases them (`spark.catalog
    * .clearCache()` — Verify/Bench do this per query) or the session ends. */
  def pairs(embs: DataFrame, idCol: String, vecCol: String,
      p: Params = Params()): DataFrame = {
    graft.functions.GraftFunctions.register(embs.sparkSession)
    val c = embs.select(col(idCol).as("id"), col(vecCol).as("_v")).persist()
    val va = c.select(col("id").as("id_a"), col("_v").as("_va"))
    val vb = c.select(col("id").as("id_b"), col("_v").as("_vb"))
    candidatePairs(c, "id", "_v", p)
      .join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", graft.functions.GraftFunctions.cosine(col("_va"), col("_vb")))
      .filter(col("cos") >= p.tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
