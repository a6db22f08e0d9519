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
