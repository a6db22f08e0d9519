package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.SnapshotStore

/** The incremental curation engine ([[IncrementalCuration]], `refresh:
  * incremental`): per-trigger O(changed)-shaped maintenance whose FINAL
  * state must be row-identical to the batch p03 composition over the same
  * corpus — near-dup components, maintained gram index (flips in BOTH
  * directions), maintained per-language aggregates, and replay safety. */
class IncrementalCurationSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsFrame = Tables.documents(spark, graft.Fixtures.sf0001)
    .select(col("doc_id").cast("long").as("doc_id"), col("text"))

  /** p03's gated set (doc_id, lang, n_tokens) recomputed from scratch. */
  private def batchGated(docs: org.apache.spark.sql.DataFrame) = {
    val drops = NearDup.dropIds(docs)
    val surv = docs.join(drops, docs("doc_id") === drops("id"), "left_anti")
      .select("doc_id", "text")
    TextOps.dupSpanRemoval(surv)
      .filter(TextOps.qualityScore(col("cleaned_text")) >= 0.5)
      .select(col("doc_id"),
        TextOps.predictedLang(col("cleaned_text")).as("lang"),
        TextOps.tokenCount(col("cleaned_text")).cast("long").as("n_tokens"))
  }

  private def specYaml(src: String, sink: String): String =
    s"""pipeline: inc_suite
       |source:
       |  table: $src
       |  changes: true
       |  max_versions_per_trigger: 1
       |  refresh: incremental
       |steps:
       |  - op: near_dup_drop
       |  - op: span_removal
       |  - op: quality_gate
       |    min_score: 0.5
       |  - op: lang_id
       |  - op: token_count
       |  - op: select
       |    cols: doc_id, lang, n_tokens
       |  - op: temperature_mix
       |sink:
       |  table: $sink
       |""".stripMargin

  private def runIncremental(tag: String, slices: Int): String = {
    val s = spark
    val src = s"graft_snap.incs.src_$tag"
    val sink = s"graft_snap.incs.sink_$tag"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.incs")
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    val docs = docsFrame
    (0 until slices).foreach(i =>
      docs.filter(col("doc_id") % slices === i).writeTo(src).append())
    val spec = graft.catalog.PipelineSpec.fromYaml(specYaml(src, sink))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-incs-$tag-" +
      java.util.UUID.randomUUID
    new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
    sink
  }

  test("3-sliced incremental run: gated content, maintained aggregates, and " +
      "sink all equal the batch p03 composition") {
    val sink = runIncremental("t3", 3)
    val docs = docsFrame

    // Gated table == batch p03's gated set.
    val inc = spark.table(s"${sink}_gated").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = batchGated(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(inc === batch)

    // Maintained per-language aggregates == direct aggregate over gated.
    val direct = spark.table(s"${sink}_gated").groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("toks"))
      .orderBy("lang").collect().toSeq
    val maintained = spark.table(s"${sink}_agg")
      .select(col("group_key").as("lang"), col("n_rows").as("n"),
        col("total").cast("long").as("toks"))
      .orderBy("lang").collect().toSeq
    assert(maintained === direct)

    // Sink == p03's full output (bit-identical p_incl included).
    val sinkRows = spark.table(sink)
      .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p")
      .orderBy("doc_id").collect().toSeq
    val p03Rows = Pipeline.curationPipeline(docs.select("doc_id", "text"))
      .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p")
      .orderBy("doc_id").collect().toSeq
    assert(sinkRows === p03Rows)
  }

  test("slicing independence: a 2-sliced run publishes the identical sink") {
    val sink2 = runIncremental("t2", 2)
    val sink3 = s"graft_snap.incs.sink_t3"
    // t3 ran in the previous test (suite order); if not, run it.
    if (!spark.catalog.tableExists(sink3)) runIncremental("t3", 3)
    val a = spark.table(sink2).orderBy("doc_id").collect().toSeq
    val b = spark.table(sink3).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  private def cappedYaml(src: String, sink: String, cap: Int): String =
    s"""pipeline: inc_suite_capped
       |source:
       |  table: $src
       |  changes: true
       |  max_versions_per_trigger: 1
       |  refresh: incremental
       |steps:
       |  - op: near_dup_drop
       |  - op: span_removal
       |    gram_cap: $cap
       |  - op: quality_gate
       |    min_score: 0.5
       |  - op: lang_id
       |  - op: token_count
       |  - op: select
       |    cols: doc_id, lang, n_tokens
       |  - op: temperature_mix
       |sink:
       |  table: $sink
       |""".stripMargin

  test("capped gram index (gram_cap): 2-sliced capped run publishes the " +
      "identical sink to the uncapped run") {
    val s = spark
    val src = "graft_snap.incs.src_cap"
    val sink = "graft_snap.incs.sink_cap"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.incs")
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    (0 until 2).foreach(i =>
      docsFrame.filter(col("doc_id") % 2 === i).writeTo(src).append())
    val spec = graft.catalog.PipelineSpec.fromYaml(cappedYaml(src, sink, 3))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-incs-cap-" +
      java.util.UUID.randomUUID
    new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
    val uncapped = s"graft_snap.incs.sink_t2"
    if (!spark.catalog.tableExists(uncapped)) runIncremental("t2", 2)
    val a = spark.table(sink).orderBy("doc_id").collect().toSeq
    val b = spark.table(uncapped).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // The saturated grams' pairs are OUT of the index: no pair may belong
    // to a gram the stat table marks sticky-saturated.
    val satJoined = spark.table(s"${sink}_grams")
      .join(spark.table(s"${sink}_gramstat").filter(col("sat")), Seq("gram"))
    assert(satJoined.isEmpty,
      "pairs of saturated grams must be evicted from the index")
  }

  test("saturated flip: a capped gram collapsing below 2 re-derives " +
      "holders from the corpus — output still exact") {
    val s = spark
    val src = "graft_snap.incs.src_sat"
    val sink = "graft_snap.incs.sink_sat"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.incs")
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    // Shared 8-token run G held by three unrelated kept docs (count 3 =
    // cap → sticky-saturated, pairs evicted); trigger 2's smaller-id
    // near-dups retract two holders WITHOUT carrying G, collapsing G to
    // ONE holder — the saturated down-flip whose holders only the corpus
    // re-derivation can find.
    val g = (1 to 8).map(i => s"g$i").mkString(" ")
    val baseA = (1 to 60).map(i => s"a$i").mkString(" ")
    val baseB = (1 to 60).map(i => s"b$i").mkString(" ")
    val baseU = (1 to 60).map(i => s"u$i").mkString(" ")
    val t1 = Seq(
      (5L, s"$baseU $g"), // unrelated holder of G
      (6L, s"$baseA $g"), // holder, retracted in trigger 2 by doc 2
      (8L, s"$baseB $g")) // holder, retracted in trigger 2 by doc 4
    val t2 = Seq(
      (2L, s"$baseA x1 x2 x3 x4 x5 x6 x7 x8"), // near-dup of 6, no G
      (4L, s"$baseB y1 y2 y3 y4 y5 y6 y7 y8")) // near-dup of 8, no G
    import s.implicits._
    t1.toDF("doc_id", "text").writeTo(src).append()
    t2.toDF("doc_id", "text").writeTo(src).append()
    val spec = graft.catalog.PipelineSpec.fromYaml(cappedYaml(src, sink, 3))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-incs-sat-" +
      java.util.UUID.randomUUID
    new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
    // The sticky flag survives the collapse (count 1, sat still true) and
    // its pairs stayed out of the index.
    val gStat = spark.table(s"${sink}_gramstat")
      .filter(col("gram").startsWith("g1 ") || col("gram") === "g1 g2 g3 g4 g5")
    assert(gStat.filter(col("sat") && col("n_docs") === 1).count() > 0,
      s"expected a sticky-saturated collapsed gram, got: " +
        s"${spark.table(s"${sink}_gramstat").collect().mkString(", ")}")
    // Exactness: gated set equals the batch p03 composition over the SAME
    // corpus — doc 5 keeps its G run (no longer duplicated), which only
    // the corpus fallback could have restored.
    val all = t1 ++ t2
    val inc = spark.table(s"${sink}_gated").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = batchGated(all.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(inc === batch)
    val doc5Tokens = inc.find(_._1 == 5L).map(_._3)
    val doc5Batch = batch.find(_._1 == 5L).map(_._3)
    assert(doc5Tokens === doc5Batch)
    assert(doc5Tokens.exists(_ == 68L),
      s"doc 5 must keep all 68 tokens (G restored by the fallback), " +
        s"got $doc5Tokens")
  }

  test("one-trigger flip-and-saturate: the PREVIOUS holder is still " +
      "re-cut (review finding: eviction must not race the holder lookup)") {
    val s = spark
    val src = "graft_snap.incs.src_race"
    val sink = "graft_snap.incs.sink_race"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.incs")
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    // Trigger 1: docA alone holds gram run G (count 1, pair indexed).
    // Trigger 2: docB and docC both add G -> count jumps 1 -> 3 = cap in
    // ONE trigger: G both FLIPS (crosses 2) and SATURATES. The old pair
    // (G, docA) is evicted this same trigger, so an index-based holder
    // lookup after the eviction would MISS docA and leave its G spans
    // uncut — the saturation route must re-derive holders instead.
    val g = (1 to 8).map(i => s"g$i").mkString(" ")
    val mk = (p: String) => (1 to 60).map(i => s"$p$i").mkString(" ")
    val t1 = Seq((1L, s"${mk("a")} $g"))
    val t2 = Seq((2L, s"${mk("b")} $g"), (3L, s"${mk("c")} $g"))
    import s.implicits._
    t1.toDF("doc_id", "text").writeTo(src).append()
    t2.toDF("doc_id", "text").writeTo(src).append()
    // NO quality_gate: the synthetic docs fail it in both modes, which
    // would mask the stale row this pin exists to catch.
    val spec = graft.catalog.PipelineSpec.fromYaml(
      s"""pipeline: inc_suite_race
         |source:
         |  table: $src
         |  changes: true
         |  max_versions_per_trigger: 1
         |  refresh: incremental
         |steps:
         |  - op: span_removal
         |    gram_cap: 3
         |  - op: token_count
         |  - op: select
         |    cols: doc_id, n_tokens
         |sink:
         |  table: $sink
         |""".stripMargin)
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-incs-race-" +
      java.util.UUID.randomUUID
    new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
    val inc = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // The decisive pin: docA (trigger 1's only holder of G) must be
    // re-cut to 60 tokens — G became duplicated the same trigger it
    // saturated, and only the corpus re-derivation can find docA.
    assert(inc.get(1L).contains(60L),
      s"doc 1 must be re-cut to 60 tokens (G removed), got ${inc.get(1L)}")
    assert(inc.get(2L).contains(60L) && inc.get(3L).contains(60L),
      s"batch docs also lose G, got ${inc.get(2L)}/${inc.get(3L)}")
  }

  test("replayed epoch is a no-op across every state table") {
    val s = spark
    val src = "graft_snap.incs.src_rp"
    val sink = "graft_snap.incs.sink_rp"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.incs")
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    val docs = docsFrame.filter(col("doc_id") < 100)
    docs.writeTo(src).append()
    val spec = graft.catalog.PipelineSpec.fromYaml(specYaml(src, sink))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-incs-rp-" +
      java.util.UUID.randomUUID
    val engine = new IncrementalCuration(s, spec, ckpt)
    engine.resetState()
    engine.ensureState()
    val batch = docs.withColumn("_change_type", lit("INSERT"))
      .withColumn("_commit_version", lit(1L))
      .withColumn("_commit_timestamp", current_timestamp())
    engine.processBatch(batch, 0L)
    def versions = Seq(s"${sink}_raw", s"${sink}_gated", s"${sink}_grams",
      s"${sink}_gramstat", s"${sink}_cc").map { t =>
      val parts = t.split('.')
      val st = SnapshotStore.stateOf(
        SnapshotStore.keyOf(parts.head, parts.tail.toSeq))
      t -> (if (st.snapshots.isEmpty) 0L else st.snapshots.last.version)
    }
    val before = versions
    val sinkBefore = s.table(sink).orderBy("doc_id").collect().toSeq
    engine.processBatch(batch, 0L) // replayed epoch
    assert(versions === before, "state tables must not advance on replay")
    assert(s.table(sink).orderBy("doc_id").collect().toSeq === sinkBefore)
  }
}
