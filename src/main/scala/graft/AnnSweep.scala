package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-wall tuning sweep for the IVFADC operator (the e13/e14
  * production ANN path): `nProbe × shortlist`, measured as PROBES AGAINST A
  * PREBUILT PERSISTED INDEX (the deployment shape — [[graft.operators.PqAdc.searchStored]];
  * build cost is amortized and excluded), against exact brute-force ground
  * truth on the ×factor-amplified embedding corpus. The 100 TB deployment
  * gets a CURVE to pick its operating point from, not the single (4, 50)
  * sample the registrations pin.
  *
  * Two index regimes per sweep:
  *   - `fixture`: e13/e14's oracle-tractable parameters — 64 cells from the
  *     lowest vec_ids, 16 codewords. This regime exists for the hash-exact
  *     DuckDB gate, NOT retrieval quality; the sweep quantifies what that
  *     costs in recall.
  *   - `production`: 64 Lloyd's-refined cells ([[graft.operators.KMeans.fit]],
  *     3 iterations) and a 256-codeword codebook — the parameters a real
  *     index would ship.
  *
  * `runMain graft.AnnSweep [sfDir] [factor]` — CSV per grid point: regime,
  * config, probe wall (min of 2 after warm), recall@5 vs exact. Ground
  * truth computed once (`Similarity.bruteTopK`, the e02 body) over a fixed
  * panel (replica 1's lowest base ids, the ScaleProbe pick). Amplification
  * is ScaleProbe's norm/structure-preserving circular shift.
  *
  * FAILS LOUDLY if the production regime's recall at the chosen default
  * operating point drops below the calibrated floor — the default's
  * quality stays an assertion, not a one-time measurement.
  */
object AnnSweep {

  private val K = 5
  private val NQueries = 200
  private val NCells = 64
  private val DefaultNProbe = 8
  private val DefaultShortlist = 200
  /** Calibrated on sf0.1 ×10 (BASELINE.md ANN-sweep table); re-measure if
    * the corpus fixture or the amplification scheme changes. */
  private val DefaultRecallFloor = 0.55

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-ann-sweep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val amp = ScaleProbe.amplifyVecs(base, factor)
      .withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))
      .persist()
    val n = amp.count()
    val queryPick = pmod(col("vec_id"), lit(1000000000L)) < NQueries &&
      col("vec_id") < 2000000000L
    val queries = amp.filter(queryPick).persist()
    println(s"corpus=$n queries=${queries.count()} k=$K factor=$factor sf=$sfDir")

    // Exact ground truth, once: query_id -> its true top-k neighbor set.
    val truth = graft.queries.Similarity.bruteTopK(amp, queryPick, K)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    require(truth.nonEmpty, "empty ground truth — no queries matched the panel pick")

    val w0 = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    def rowCents: DataFrame = amp.orderBy("vec_id").limit(NCells)
      .select((row_number().over(w0) - 1).as("cell_id"),
        col("emb").as("cemb"), col("norm").as("cnorm"))
    def kmeansCents: DataFrame = graft.operators.KMeans
      .fitCentroids(amp, "vec_id", "emb", NCells, iters = 3)
      .select(col("cluster").as("cell_id"), col("cvec").as("cemb"),
        sqrt(graft.functions.VectorOps.sumSquares(col("cvec"))).as("cnorm"))

    val regimes = Seq(
      ("fixture", rowCents, 16),
      ("production", kmeansCents, 256))

    println("regime,nprobe,shortlist,probe_wall_s,recall_at_5")
    val results = regimes.flatMap { case (regime, centsDf, nCodewords) =>
      val cents = centsDf.persist()
      val seeds = amp.orderBy("vec_id").limit(nCodewords).persist()
      // The persisted index a deployment holds: routing + PQ codes.
      val codes = graft.operators.PqAdc
        .encodeIndex(amp, cents, seeds, nSub = 8, nCodewords = nCodewords)
        .persist()
      codes.count() // force the build outside the probe timings

      val rows = for {
        nProbe <- Seq(1, 2, 4, 8)
        shortlist <- Seq(10, 20, 50, 100, 200)
      } yield {
        def run(): (Double, Array[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val got = graft.operators.PqAdc.searchStored(
              codes, amp, queries, cents, seeds, nProbe = nProbe, k = K,
              nCodewords = nCodewords, shortlist = shortlist)
            .select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          ((System.nanoTime() - t0) / 1e9, got)
        }
        run() // warm
        val (t1, got) = run()
        val (t2, _) = run()
        val recall = got.count { case (q, nb) =>
          truth.get(q).exists(_.contains(nb)) }.toDouble / (truth.size * K)
        val wall = math.min(t1, t2)
        println(f"$regime,$nProbe,$shortlist,$wall%.2f,$recall%.4f")
        (regime, nProbe, shortlist, wall, recall)
      }
      codes.unpersist(); seeds.unpersist(); cents.unpersist()
      rows
    }

    val default = results.find(g => g._1 == "production" &&
      g._2 == DefaultNProbe && g._3 == DefaultShortlist).get
    if (default._5 < DefaultRecallFloor) sys.error(
      f"recall floor violated: production default (nProbe=$DefaultNProbe, " +
        f"shortlist=$DefaultShortlist) reached ${default._5}%.4f < " +
        f"$DefaultRecallFloor%.2f — retune the default or recalibrate the floor")
    println(f"default_ok regime=production nprobe=$DefaultNProbe " +
      f"shortlist=$DefaultShortlist recall=${default._5}%.4f " +
      f"floor=$DefaultRecallFloor%.2f")
    spark.stop()
  }
}
