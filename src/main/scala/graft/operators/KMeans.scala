package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<double>` embedding column —
  * the clustering step a training-data pipeline runs between embedding and
  * curation (topic balancing, diversity sampling, cluster-level dedup).
  *
  * Every stage is relational, in the same scale posture as [[IvfAnn]]:
  *
  *   - assignment is corpus ⨯ broadcast(centroids) → argmin-of-struct —
  *     linear in |corpus|·k, no shuffle of the corpus;
  *   - centroid recomputation is one shuffle of (cluster, dim, component)
  *     keyed on k·d keys, aggregated map-side first;
  *   - only the k·d centroid table ever reaches the driver (bounded by the
  *     model size, not the data size — the same boundedness argument as
  *     collecting `listTables`).
  *
  * Determinism, for the oracle/spec harness: centroids are seeded from the
  * k lowest-id vectors, distance ties break to the lower cluster id, and
  * per-dimension means are aggregated as exact DECIMALs (a plain double
  * `avg` is partition-order-dependent in its low bits, which would make
  * assignments flap across partitionings).
  */
object KMeans {

  /** Squared L2 as a left-to-right fold (same discipline as
    * [[graft.functions.VectorOps]] — deterministic summation order).
    * Backed by the codegen'd [[graft.functions.SquaredDistance]]: the
    * composable zip_with/aggregate form is CodegenFallback and made the
    * N·k assignment pass interpretation-bound (ScaleProbe sem_dedup was
    * 19.6× at 10× data before the swap). Bit-identical fold semantics.
    * Inputs must be `array<double>` (the [[graft.functions.CosineSimilarity]]
    * convention — no implicit numeric coercion, unlike the old fold):
    * callers reading the fixture's `array<float>` embeddings cast
    * explicitly via `.cast("array<double>")`. */
  def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.GraftPlanBridge.column(
      graft.functions.SquaredDistance(
        org.apache.spark.sql.graftbridge.GraftPlanBridge.expression(a),
        org.apache.spark.sql.graftbridge.GraftPlanBridge.expression(b)))

  /** Argmin-distance assignment of `vectors` (idCol, vecCol) to `centroids`
    * (cluster, cvec). Emits (idCol, vecCol, cluster, dist2). */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("dist2", sqDist(col(vecCol), col("cvec")))
      .groupBy(idCol)
      .agg(
        first(vecCol).as(vecCol),
        min(struct(col("dist2"), col("cluster"))).as("_m"))
      .select(
        col(idCol), col(vecCol),
        col("_m.cluster").as("cluster"), col("_m.dist2").as("dist2"))

  /** Two-level (IVF-style) nearest-centroid assignment — the scale path
    * for k ∝ N regimes where flat assignment's N·k distance evaluations
    * dominate (measured: the sem_dedup scaling probe's ×30 super-linearity
    * is entirely this term). The centroid set is itself clustered into
    * c = ⌈√k⌉ coarse groups (driver-side Lloyd's — the centroid table is
    * already bounded by model size); each vector then scans the c coarse
    * centers plus the fine centroids of its `nprobe` nearest groups:
    * N·(√k + nprobe·√k̄) evaluations instead of N·k.
    *
    * APPROXIMATE by design, exactly like [[IvfAnn]]: a vector whose true
    * nearest fine centroid lives in an unprobed coarse group is assigned
    * to its best probed one. The trade affects only cell BOUNDARIES —
    * downstream within-cell work (e.g. [[SemanticDedup]]'s pair stage) is
    * exact for whatever cells arrive. Determinism: coarse and fine argmins
    * compare (rounded distance, id); driver-side Lloyd's iterates in
    * cluster-id order with sequential double sums.
    *
    * Output schema matches [[assign]]: (idCol, vecCol, cluster, dist2).
    */
  def assignTwoLevel(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    // Accept any integral cluster column (int/long/short) — [[assign]] has
    // no type restriction on it, and the two paths' accepted schemas must
    // not silently diverge (a bigint cluster id would MatchError here).
    val cents: Seq[(Int, Array[Double])] = centroids.collect()
      .map { r =>
        (r.getAs[Number](0).intValue,
          r.getSeq[Double](1).toArray)
      }.toSeq.sortBy(_._1)
    val k = cents.length
    // Empty centroid set: match [[assign]]'s behavior (empty result, same
    // schema) rather than letting the Lloyd's seed indexing throw.
    if (k == 0) {
      return vectors.limit(0)
        .select(col(idCol), col(vecCol),
          lit(0).as("cluster"), lit(0.0).as("dist2"))
    }
    val c = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)

    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // Driver-side Lloyd's over the k centroid vectors (3 rounds is plenty
    // for a routing structure — coarse groups need only be balanced-ish,
    // not optimal). Deterministic: seeds are the c lowest cluster ids,
    // scans run in cluster-id order, ties break to the lower coarse index.
    var coarse: Array[Array[Double]] = cents.take(c).map(_._2.clone()).toArray
    var member: Map[Int, Int] = Map.empty
    (0 until 3).foreach { _ =>
      member = cents.map { case (id, v) =>
        id -> (0 until c).minBy(j => (sq(v, coarse(j)), j))
      }.toMap
      coarse = (0 until c).map { j =>
        val vs = cents.filter(t => member(t._1) == j).map(_._2)
        if (vs.isEmpty) coarse(j)
        else {
          val m = new Array[Double](vs.head.length)
          vs.foreach { v => var i = 0; while (i < m.length) { m(i) += v(i); i += 1 } }
          var i = 0; while (i < m.length) { m(i) /= vs.length; i += 1 }
          m
        }
      }.toArray
    }
    // Probe ranking and fine-group membership must use the SAME centers:
    // the loop updates `coarse` after computing `member`, so without this
    // final pass the probe would rank post-update centers while fineDf
    // groups by pre-update membership — a routing-quality inconsistency
    // in the approximate path.
    member = cents.map { case (id, v) =>
      id -> (0 until c).minBy(j => (sq(v, coarse(j)), j))
    }.toMap
    val spark = vectors.sparkSession
    import spark.implicits._
    // Only groups that OWN centroids are probe targets: an emptied group
    // keeps a stale center in `coarse` (harmless for the next Lloyd's
    // round) but must not be rankable in the probe — a vector whose
    // nprobe picks were all empty groups would match nothing in the fine
    // join and silently vanish from the output.
    val occupied = member.values.toSet
    val coarseDf = broadcast(
      coarse.toSeq.zipWithIndex.collect {
        case (v, j) if occupied(j) => (j, v.toSeq)
      }.toDF("coarse", "gvec"))
    val fineDf = broadcast(
      cents.map { case (id, v) => (member(id), id, v.toSeq) }
        .toDF("coarse", "cluster", "cvec"))

    // Coarse probe: per vector, the nprobe nearest groups. The probe list
    // is skinny (dist, coarse) structs; the vector itself rides once via
    // first(). collect_list is partition-order-dependent but array_sort
    // imposes a total order ((rounded dist, coarse) is unique per group).
    val probed = vectors
      .crossJoin(coarseDf)
      .withColumn("_cd", round(sqrt(sqDist(col(vecCol), col("gvec"))), 6))
      .groupBy(col(idCol))
      .agg(
        slice(array_sort(collect_list(struct(col("_cd"), col("coarse")))),
          1, nprobe).as("_probes"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol),
        explode(col("_probes").getField("coarse")).as("coarse"))

    probed
      .join(fineDf, "coarse")
      .withColumn("_d2", sqDist(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(
        min(struct(round(sqrt(col("_d2")), 6).as("rd"), col("cluster"),
          col("_d2").as("raw"))).as("_m"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol),
        col("_m.cluster").as("cluster"), col("_m.raw").as("dist2"))
  }

  /** `iters` rounds of Lloyd's algorithm; k seeded from the k lowest-id
    * vectors. Returns the final assignment (idCol, cluster, dist2). */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val v = vectors.persist()
    assign(v, fitCentroids(v, idCol, vecCol, k, iters), idCol, vecCol)
      .select(col(idCol), col("cluster"), col("dist2"))
  }

  /** The fitted MODEL itself — `(cluster, cvec)`, k·d driver-bounded — for
    * consumers that route against the centroids rather than needing the
    * corpus assignment (IVF index builds, the AnnSweep production regime).
    * Same seeding/iteration as [[fit]], so `fit ≡ assign ∘ fitCentroids`. */
  def fitCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val spark = vectors.sparkSession
    import spark.implicits._

    // Lloyd's makes iters+2 passes over the corpus (seed scan, one per
    // iteration, final assignment): materialize it once instead of
    // replaying the caller's scan pipeline each pass — the standard
    // cache-the-training-set discipline of every iterative fitter.
    val v = vectors.persist()

    def centroidDf(cents: Seq[(Int, Seq[Double])]): DataFrame =
      cents.toDF("cluster", "cvec")

    // Seed: k lowest ids — deterministic, and k·d-bounded on the driver.
    var centroids: Seq[(Int, Seq[Double])] = v
      .orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
      .toSeq

    var it = 0
    while (it < iters) {
      val assigned = assign(v, centroidDf(centroids), idCol, vecCol)
      // Exact per-dimension means: decimal sums are order-independent, so
      // the new centroids are identical under any partitioning.
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        // Scale 15 leaves 23 integer digits of headroom: component sums
        // stay exact-in-decimal up to ~1e23, beyond any realistic cluster
        // mass (38,25 would overflow — an ANSI-mode error — at ~1e13,
        // reachable at the operator's own claimed scale). The per-value
        // cast rounding is deterministic, which is all order-freedom needs.
        .agg((sum(col("v").cast("decimal(38,15)")).cast("double") / count(lit(1))).as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster"), transform(col("dm"), x => x.getField("m")).as("cvec"))
        .collect()
        .map { case Row(c: Int, v: scala.collection.Seq[_]) =>
          (c, v.asInstanceOf[scala.collection.Seq[Double]].toSeq)
        }
        .toMap
      // An emptied cluster keeps its previous centroid.
      centroids = centroids.map { case (c, v) => (c, means.getOrElse(c, v)) }
      it += 1
    }
    centroidDf(centroids)
  }
}
