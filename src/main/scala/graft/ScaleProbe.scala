package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: re-runs flagship shapes on N×-replicated inputs to
  * measure how wall time grows with data volume (the 100 TB question in
  * miniature). Usage: `runMain graft.ScaleProbe <sfDir> [factor] [shape…]`
  * (trailing shape names restrict the run — re-probing one shape at a
  * high factor shouldn't pay for the 6-minute containment join).
  * Prints one line per shape: base seconds, scaled seconds, ratio, plus
  * the shuffle-write and disk-spill bytes of each measured run — wall
  * growth says WHETHER a shape scales; the shuffle/spill columns say WHY
  * (a 100 TB bottleneck is almost always a shuffle that grew
  * super-linearly or started spilling, and the listener catches both).
  */
object ScaleProbe {

  /** Accumulates shuffle-write/spill totals between [[snapshot]] calls
    * from task-end events (the per-task metrics are always populated
    * there; StageInfo-level aggregates are not), summed across the
    * job(s) a measurement triggers — the same totals the UI shows. */
  private final class ShuffleTotals extends org.apache.spark.scheduler.SparkListener {
    private val shufWrite = new java.util.concurrent.atomic.AtomicLong
    private val spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
    /** (shuffleWriteBytes, spillBytes) since the last call, then reset. */
    def snapshot(): (Long, Long) =
      (shufWrite.getAndSet(0L), spill.getAndSet(0L))
  }

  private def amplify(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_dup", explode(sequence(lit(1), lit(factor)))).drop("_dup")

  /** Token-salted document replication for the JOIN shapes: replica r of a
    * document shares no shingles with replica r' (every token is suffixed
    * with the replica tag) and gets a fresh doc_id, so N× data carries N×
    * independent near-dup structure. Plain replication would make each
    * band bucket N× deeper in identical copies — an artificial N² pair
    * blowup that measures the amplifier, not the operator.
    *
    * New ids are `replica·10⁹ + doc_id`: the low decimal digits are the
    * ORIGINAL id's, so id-mod routing inside the probed operators (d10's
    * `doc_id % 10` train/holdout split) keeps its per-replica mix. A
    * `doc_id·factor + rep` scheme silently made the split depend only on
    * the replica — whole replicas landed on one side and the salted
    * cross-side join matched zero rows, timing an empty shuffle. */
  private[graft] def amplifyDocs(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_rep", explode(sequence(lit(1), lit(factor))))
      .select(
        (col("_rep").cast("long") * 1000000000L + col("doc_id")).as("doc_id"),
        array_join(
          transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit("_"), col("_rep"))), " ").as("text"))

  /** Embedding replication for the semantic-dedup shape: fresh ids (replica
    * in the high digits, like [[amplifyDocs]]) and a deterministic CIRCULAR
    * SHIFT of the components by the replica index — norm- and
    * pairwise-structure-preserving, so each replica is an independent copy
    * of the base geometry in a decorrelated orientation and N× data
    * carries N× structure. An earlier additive drift (+rep·0.01 per
    * component) moved every replica along the all-ones diagonal; past
    * ~rep 10 the shift dominated the inter-vector spacing and whole
    * replicas collapsed into the few most-diagonal cells — the ×30 probe
    * measured Σ|cell|² of that artificial pile-up (702 s), not the
    * operator. Shift caps at the embedding dim (rep % 64) — factors ≥ 64
    * would alias replica orientations, fine for the probed range. */
  private[graft] def amplifyVecs(df: DataFrame, factor: Int): DataFrame = {
    val shift = (col("_rep") % lit(64)).cast("int")
    df.withColumn("_rep", explode(sequence(lit(1), lit(factor))))
      .select(
        (col("_rep").cast("long") * 1000000000L + col("vec_id")).as("vec_id"),
        concat(
          slice(col("emb"), shift + 1, size(col("emb")) - shift),
          slice(col("emb"), lit(1), shift)).as("emb"))
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Partition-count knob: probing whether a spill is a plan defect or
    // just per-partition working set vs execution memory (a cluster
    // deployment sizes shuffle.partitions to the input; the fixture
    // default is 32).
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32").toInt
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-scale-probe",
        shufflePartitions = parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val docs = graft.queries.Tables.documents(spark, sfDir)

    def q01(d: DataFrame): DataFrame =
      d.groupBy("l_returnflag", "l_linestatus")
        .agg(graft.queries.Q.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

    def topk(d: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }

    val emb = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

    // Replicated vec_ids collapse in the argmin groupBy, but the dominant
    // cost — |rows|·k distance folds feeding a map-side partial argmin —
    // still scales with the amplification, which is what's being measured.
    def kmeansAssign(d: DataFrame): DataFrame = {
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster"), col("emb").as("cvec"))
      graft.operators.KMeans.assign(d, cents, "vec_id", "emb")
    }

    def tfidfTerms(d: DataFrame): DataFrame = {
      val (tf, _, dfreq) = graft.queries.Pipeline.termStats(d)
      tf.join(dfreq, "token")
    }

    // The two data-dependent-fan-out JOIN pipelines (round-4 verdict gap):
    // banded-LSH near-dup pairs and the shingle-keyed containment join.
    def lshBandJoin(d: DataFrame): DataFrame =
      graft.operators.MinHashLsh.nearDupPairs(d, "doc_id", "text",
        graft.operators.MinHashLsh.Params())

    // The registered d10 pipeline body itself (shared helper — the probe
    // must time the same plan the oracle gate checks, not a copy).
    def containJoin(d: DataFrame): DataFrame =
      graft.queries.TextOps.containmentPairs(d)

    // d17's capped regime under an ABSOLUTE df cutoff: token-salted
    // replication keeps per-shingle df constant as the corpus grows, so a
    // fractional cutoff (d17's registered form) stops binding at higher
    // factors — the absolute cap is the knob that stays engaged, bounding
    // every shingle's join fan-out at df_h·100 regardless of corpus size.
    def containCapped(d: DataFrame): DataFrame =
      graft.queries.TextOps.containmentPairs(d,
        stopDfCap = Some(graft.queries.TextOps.AbsoluteDf(100)))

    // The no-join-back duplicated-span scorer (round 6): linear shingle
    // volume, doc-level broadcast join only.
    def repeatedNgrams(d: DataFrame): DataFrame =
      graft.queries.TextOps.repeatedNgramFractions(d)

    // Positional span coverage (round 8, d18): gram-keyed df aggregate +
    // many-to-one join-back + doc-local island windows — expected linear
    // in token volume (the join-back produces one row per duplicated
    // window, no fan-out term).
    def dupSpans(d: DataFrame): DataFrame =
      graft.queries.TextOps.dupSpanCoverage(d)

    // Semantic dedup under the documented scale discipline: k ∝ N keeps
    // expected cell size constant, so Σ|cell|² — the pairwise term — grows
    // linearly. The probe measures exactly that contract: k derives from
    // the frame's size relative to the base corpus (8 cells at base,
    // 8·factor after amplification), seeded from the k lowest-id vectors.
    // Replicas are deterministically circular-shifted in embedding space
    // (see amplifyVecs) so they spread across cells instead of stacking
    // identical vectors into one cell (which would measure an artificial
    // N² of exact duplicates, not the operator).
    val embBaseN = emb.count()
    def semCents(d: DataFrame): DataFrame = {
      val k = math.max(8L, 8L * d.count() / math.max(1L, embBaseN)).toInt
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      d.orderBy("vec_id").limit(k)
        .select((row_number().over(w) - 1).as("cluster"), col("emb").as("cvec"))
    }
    def semDedup(d: DataFrame): DataFrame =
      graft.operators.SemanticDedup.drops(d, "vec_id", "emb", semCents(d), tau = 0.35)
    // The same contract through two-level assignment: N·(√k + nprobe·√k̄)
    // distance evaluations instead of flat N·k — the curve this probe
    // exists to compare against sem_dedup's.
    def semDedup2l(d: DataFrame): DataFrame =
      graft.operators.SemanticDedup
        .dropsTwoLevel(d, "vec_id", "emb", semCents(d), tau = 0.35, nprobe = 2)

    // Embedding near-dup, e05 vs e08 regimes: exact all-pairs baseline
    // (O(N²) by construction — probe it only at low factors) against the
    // sign-LSH banded prune. Both bodies are the REGISTERED pipelines
    // (`Similarity.exactNearDupPairs`, `SignLshNearDup.pairs`) — the
    // probe times the plan the oracle gate checks, not a copy.
    def neardupExact(d: DataFrame): DataFrame =
      graft.queries.Similarity.exactNearDupPairs(d)
    def signlshNeardup(d: DataFrame): DataFrame =
      graft.operators.SignLshNearDup.pairs(d, "vec_id", "emb")
    // The PRODUCTION near-dup regime: tau ≥ 0.8 admits 16-bit band keys
    // (2¹⁶ buckets/band), collapsing the dissimilar-collision term
    // bands·N²/2^r that makes the fixture-tau banding (3-bit keys, 8
    // buckets) quadratic-bound. Random-corpus output is ~empty at 0.8 —
    // the probe times the candidate machinery, which is the scale cost.
    def signlshNeardupHi(d: DataFrame): DataFrame =
      graft.operators.SignLshNearDup.pairs(d, "vec_id", "emb",
        graft.operators.SignLshNearDup.Params(
          bands = 32, rowsPerBand = 16, tau = 0.8))

    // ANN, e02 vs e06 regimes: a FIXED 2000-query panel (the base corpus;
    // under amplification, replica 1 — the pmod picks it without a sort)
    // against a growing corpus. Brute scans Q·N pairs; IVF holds 64 cells
    // fixed (e06's published contract scaled 4×) so both curves are linear
    // and the measured gap is the candidate-set constant nProbe/cells —
    // the cells ∝ N route with sub-linear assignment is measured
    // separately as sem_dedup_2l.
    val queryPick =
      pmod(col("vec_id"), lit(1000000000L)) < 2000 && col("vec_id") < 2000000000L
    def withNorm(d: DataFrame): DataFrame =
      d.withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))
    def knnBrute(d0: DataFrame): DataFrame =
      graft.queries.Similarity.bruteTopK(withNorm(d0), queryPick, k = 5)
    def knnIvf(d0: DataFrame): DataFrame = {
      val d = withNorm(d0)
      val w0 = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val cents = d.orderBy("vec_id").limit(64)
        .select((row_number().over(w0) - 1).as("cell_id"),
          col("emb").as("cemb"), col("norm").as("cnorm"))
      graft.operators.IvfAnn.search(d, d.filter(queryPick), cents, nProbe = 4, k = 5)
    }
    // The cells ∝ N regime (e10's registered parameterization): cells =
    // ⌈√N⌉ with two-level routing. Flat assignment at cells ∝ √N costs
    // N^1.5 evaluations — this shape exists to measure that the coarse
    // grouping keeps the curve sub-linear per element where the fixed-64
    // shape above only measures the candidate-set constant.
    def knnIvf2l(d0: DataFrame): DataFrame = {
      val d = withNorm(d0)
      val nCells = math.max(16, math.ceil(math.sqrt(d.count().toDouble)).toInt)
      val w0 = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val cents = d.orderBy("vec_id").limit(nCells)
        .select((row_number().over(w0) - 1).as("cell_id"),
          col("emb").as("cemb"), col("norm").as("cnorm"))
      graft.operators.IvfAnn.searchTwoLevel(d, d.filter(queryPick), cents,
        coarseProbe = 4, nProbe = 4, k = 5)
    }
    // IVFADC (e13): fixed 64-cell prune + PQ code scan + refinement. Same
    // candidate-set constant as knn_ivf; measures that swapping the
    // per-pair arithmetic from a 64-dim exact cosine to an 8-lookup ADC
    // (plus the |Q|·shortlist refinement reads) keeps the curve — the
    // byte-shrink itself only shows at memory scale, not wall at this SF.
    def knnIvfPq(d0: DataFrame): DataFrame = {
      val d = withNorm(d0)
      val w0 = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val cents = d.orderBy("vec_id").limit(64)
        .select((row_number().over(w0) - 1).as("cell_id"),
          col("emb").as("cemb"), col("norm").as("cnorm"))
      graft.operators.PqAdc.searchCellsSeeded(
        d, d.filter(queryPick), cents, d.orderBy("vec_id").limit(16),
        nProbe = 4, k = 5)
    }

    // The composed curation pipeline (p03): dedup anti-join + span cut +
    // row-local gating + mixture rates — the registered body itself, so
    // the probe certifies the COMPOSITION adds no super-linear seam on
    // top of its stages' individual curves (lsh_band_join, dup_span).
    def curation(d: DataFrame): DataFrame =
      graft.queries.Pipeline.curationPipeline(d)

    // Governance: big-big MERGE (m01's operator). Target = the replicated
    // customer table; source = a derived change batch over a third of the
    // keys (unique keys — the MERGE precondition). Cost is ONE full-outer
    // equi-join on the merge key; the probe certifies it stays linear with
    // both sides' growth (the copy-on-write join a table format plans).
    val cust = graft.queries.Tables.customer(spark, sfDir)
    def mergeUpsert(c: DataFrame): DataFrame = {
      val source = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), (col("c_acctbal") * 0.1).as("rev"))
      graft.operators.MergeInto.merge(
        target = c,
        source = source,
        key = "c_custkey",
        whenMatched = Map(
          "c_acctbal" -> (col("t.c_acctbal") + col("s.rev"))),
        whenNotMatched = None)
    }
    // Fresh custkeys per replica (high-digit replica tag, the amplifyDocs
    // id scheme): N× data carries N× independent merge keys — plain row
    // replication would collide every key N× and the full-outer join
    // would fan out N², measuring the amplifier, not the operator.
    def amplifyCust(df: DataFrame, factor: Int): DataFrame =
      df.withColumn("_rep", explode(sequence(lit(1), lit(factor))))
        .withColumn("c_custkey",
          col("_rep").cast("long") * 1000000000L + col("c_custkey"))
        .drop("_rep")

    // Consumer-side CDF + incremental view maintenance (m08/m09 operators)
    // over plain relations: cur = the book with a tenth of keys erased, a
    // third of balances repriced, and a full insert wave at fresh keys.
    // Cost is the diff's full-outer equi-join on the key plus the
    // group-key delta fold — certifies commit→CDF→maintenance stays
    // linear in |prev| + |cur| with no driver materialization.
    def cdfMaint(c: DataFrame): DataFrame = {
      val inserts = c.withColumn("c_custkey",
        col("c_custkey") + lit(100000000000L))
      val cur = c.filter(col("c_custkey") % 10 =!= 7)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal")))
        .unionAll(inserts)
      val feed = graft.operators.ChangeDataFeed
        .diff(c, cur, Seq("c_custkey"), commitVersion = 1L)
      val view = graft.operators.IncrementalMaintenance
        .initial(c, col("c_mktsegment"), col("c_acctbal"))
      graft.operators.IncrementalMaintenance.applyDeltas(view,
        graft.operators.IncrementalMaintenance.aggDeltas(feed,
          col("old_c_mktsegment"), col("old_c_acctbal"),
          col("new_c_mktsegment"), col("new_c_acctbal")))
    }

    // Graph family: the registered g02 triangle-census body. Fresh order
    // AND part keys per replica (the amplifyDocs id scheme on both
    // endpoints) make N× data carry N independent copies of the same graph
    // — plain replication would deepen every co-occurrence count N× and
    // the pair aggregate would measure the amplifier. Expected: the
    // O(m^{3/2}) wedge bound shows as mildly super-linear shuffle on an
    // m-linear input, bounded wall growth.
    val liGraph = li.select("l_orderkey", "l_partkey")
    def triangleCensus(d: DataFrame): DataFrame =
      graft.queries.Linkage.triangleCensusOverLineitem(d)
    // The sized form applies the measured-best remedy: wedgeTasks ∝
    // factor (sf0.1×30: 52.1 s → 32.0 s). The pipeline's residual spill
    // is the pair aggregate's task-memory contention (see
    // Linkage.coPurchasePairs — bounded by the fan-out stream, benign,
    // and NOT fixable by partition count; pairTasks relocates rather
    // than removes it). The spill bound below is that stream's linear
    // ceiling: the probe fails loudly if the spill ever grows
    // super-linearly or the census stages start spilling on top.
    def triangleCensusSized(d: DataFrame): DataFrame =
      graft.queries.Linkage.triangleCensusOverLineitem(d,
        wedgeTasks = Some(32 * factor))
    def graphPairs(d: DataFrame): DataFrame =
      graft.queries.Linkage.coPurchasePairs(d)
    def graphDistinct(d: DataFrame): DataFrame =
      d.select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    def graphFanout(d: DataFrame): DataFrame = {
      val li2 = graphDistinct(d)
      li2.toDF("okey", "u").join(li2.toDF("okey", "v"), "okey")
        .filter(col("u") < col("v"))
    }
    def amplifyGraph(df: DataFrame, factor: Int): DataFrame =
      df.withColumn("_rep", explode(sequence(lit(1), lit(factor))))
        .select(
          (col("_rep").cast("long") * 1000000000L + col("l_orderkey")).as("l_orderkey"),
          (col("_rep").cast("long") * 1000000000L + col("l_partkey")).as("l_partkey"))

    // Time-series family: t04's per-type trailing-hour RANGE window vs
    // t05's ghost-replicated bucket rewrite, SAME semantics. Amplification
    // keeps the 5 event types and the time span fixed (fresh event_ids,
    // deeper hours) — exactly how a real stream grows — so t04's
    // parallelism stays pinned at 5 tasks while t05's stays types × hours.
    // The frame evaluation is two-pointer linear in both; the measured gap
    // is the serialization.
    val events = graft.queries.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "ts", "value")
    def rollingHour(d: DataFrame): DataFrame =
      graft.queries.TimeSeries.rollingHourWindowPlan(d)
    def rollingHourBucketed(d: DataFrame): DataFrame =
      graft.queries.TimeSeries.rollingHourBucketed(d)
    def amplifyEvents(df: DataFrame, factor: Int): DataFrame =
      df.withColumn("_rep", explode(sequence(lit(1), lit(factor))))
        .withColumn("event_id",
          col("_rep").cast("long") * 1000000000L + col("event_id"))
        .drop("_rep")

    val docAmp = amplifyDocs _
    val rowAmp = amplify _
    val allShapes: Seq[(String, DataFrame => DataFrame, DataFrame, (DataFrame, Int) => DataFrame)] = Seq(
      ("agg_q01", q01 _, li, rowAmp),
      ("window_topk", topk _, li, rowAmp),
      ("minhash_sigs",
        (d: DataFrame) => graft.operators.MinHashLsh.signatures(d, "doc_id", "text",
          graft.operators.MinHashLsh.Params()),
        docs, rowAmp),
      ("tfidf_join", tfidfTerms _, docs, rowAmp),
      ("kmeans_assign", kmeansAssign _, emb, rowAmp),
      ("lsh_band_join", lshBandJoin _, docs, docAmp),
      ("contain_join", containJoin _, docs, docAmp),
      ("contain_capped", containCapped _, docs, docAmp),
      ("repeated_ngrams", repeatedNgrams _, docs, docAmp),
      ("dup_span", dupSpans _, docs, docAmp),
      ("sem_dedup", semDedup _, emb, amplifyVecs _),
      ("sem_dedup_2l", semDedup2l _, emb, amplifyVecs _),
      ("neardup_exact", neardupExact _, emb, amplifyVecs _),
      ("signlsh_neardup", signlshNeardup _, emb, amplifyVecs _),
      ("signlsh_hi", signlshNeardupHi _, emb, amplifyVecs _),
      ("knn_brute", knnBrute _, emb, amplifyVecs _),
      ("knn_ivf", knnIvf _, emb, amplifyVecs _),
      ("knn_ivf_2l", knnIvf2l _, emb, amplifyVecs _),
      ("knn_ivfpq", knnIvfPq _, emb, amplifyVecs _),
      ("curation_pipeline", curation _,
        docs.select("doc_id", "text"), docAmp),
      ("merge_upsert", mergeUpsert _, cust, amplifyCust _),
      ("cdf_maint", cdfMaint _, cust, amplifyCust _),
      ("triangle_census", triangleCensus _, liGraph, amplifyGraph _),
      ("triangle_census_sized", triangleCensusSized _, liGraph, amplifyGraph _),
      ("graph_pairs", graphPairs _, liGraph, amplifyGraph _),
      ("graph_distinct", graphDistinct _, liGraph, amplifyGraph _),
      ("graph_fanout", graphFanout _, liGraph, amplifyGraph _),
      ("rolling_hour", rollingHour _, events, amplifyEvents _),
      ("rolling_hour_bucketed", rollingHourBucketed _, events, amplifyEvents _))
    val wanted = args.drop(2).toSet
    val unknown = wanted -- allShapes.map(_._1).toSet
    // Reject rather than skip: a silently-dropped typo reads as "that
    // 6-minute probe ran" when it didn't.
    require(unknown.isEmpty,
      s"unknown shape(s) ${unknown.mkString(", ")}; known: ${allShapes.map(_._1).mkString(", ")}")
    val shapes =
      if (wanted.isEmpty) allShapes else allShapes.filter(s => wanted(s._1))

    // Warm codegen/scan once.
    shapes.foreach { case (_, f, base, _) => sink(f(base)); spark.catalog.clearCache() }
    val totals = new ShuffleTotals
    spark.sparkContext.addSparkListener(totals)
    // Stage-completion events land on the async listener bus; draining it
    // before each snapshot makes the per-measurement attribution exact by
    // construction (a fixed sleep bounded stragglers only on a quiet host —
    // round-7 ADVICE: under load a late task-end could credit bytes to the
    // next row).
    def settled(): (Long, Long) = {
      org.apache.spark.sql.graftbridge.GraftPlanBridge.drainListenerBus(spark)
      totals.snapshot()
    }
    def mb(bytes: Long): String = f"${bytes / 1048576.0}%.1f"
    // Attributed-bound assertions: shapes with a documented memory
    // attribution fail the probe loudly if the amplified run exceeds the
    // bound — the finding stays enforced, not prose. The census
    // pipeline's spill is the pair aggregate's contention spill, whose
    // ceiling is the WHOLE fan-out stream — linear in factor (the
    // spilled fraction rises with contention toward 1: measured sf0.1
    // 23 MB/× at ×30 → 36 MB/× at ×60). 48 MB × factor is that ceiling
    // with headroom; crossing it means genuinely super-linear spill
    // (a quadratic stage) or a previously spill-free census stage
    // regressed.
    val spillBounds = Map("triangle_census_sized" -> factor * (48L << 20))
    println(f"shape,base_s,x${factor}_s,ratio,base_shuf_mb,x${factor}_shuf_mb,base_spill_mb,x${factor}_spill_mb")
    shapes.foreach { case (name, f, base, amp) =>
      totals.snapshot()
      val b = time(sink(f(base)))
      val (bw, bsp) = settled()
      spark.catalog.clearCache()
      totals.snapshot()
      val s = time(sink(f(amp(base, factor))))
      val (xw, xsp) = settled()
      spark.catalog.clearCache()
      println(f"$name,$b%.2f,$s%.2f,${s / b}%.1f,${mb(bw)},${mb(xw)},${mb(bsp)},${mb(xsp)}")
      spillBounds.get(name).filter(_ < xsp).foreach(bound => sys.error(
        f"$name spilled ${mb(xsp)} MB at x$factor — over the ${mb(bound)} MB " +
          "attributed linear bound (calibrated on sf0.1); the spill went " +
          "super-linear or a previously spill-free stage regressed"))
    }
    spark.stop()
  }
}
