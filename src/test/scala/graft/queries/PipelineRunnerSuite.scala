package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.catalog.PipelineSpec

/** The YAML pipeline runner: specs parse, ops compose the SAME shared
  * expressions the oracle gate pins (a spec replaying p03's stages is
  * row-identical to the registered composition), and misuse fails eagerly
  * with named ops/params/columns.
  */
class PipelineRunnerSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  private lazy val runner = new PipelineRunner(spark)

  private val curationYaml = """pipeline: curation_demo
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: near_dup_drop
  - op: span_removal
  - op: quality_gate
    min_score: 0.5
  - op: lang_id
  - op: token_count
  - op: temperature_mix
"""

  test("spec parses: name, source, ordered steps with params, optional sink") {
    val spec = PipelineSpec.fromYaml(curationYaml)
    assert(spec.name === "curation_demo")
    assert(spec.sourceTable === "documents")
    assert(spec.steps.map(_.op) === Seq("select", "near_dup_drop", "span_removal",
      "quality_gate", "lang_id", "token_count", "temperature_mix"))
    assert(spec.steps(3).param("min_score") === "0.5")
    assert(spec.sinkFormat.isEmpty && spec.sinkPath.isEmpty)
    // Sink must be both-or-neither.
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      curationYaml + "sink:\n  format: parquet\n"))
  }

  test("a spec replaying p03's stages is row-identical to the registered " +
    "curation pipeline") {
    val spec = PipelineSpec.fromYaml(curationYaml)
    val fromSpec = runner.build(spec, dir)
      .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p_incl")
      .collect().toSet
    val registered = Pipeline.curationPipeline(
        Tables.documents(spark, dir).select("doc_id", "text"))
      .collect().toSet
    assert(fromSpec === registered)
    assert(fromSpec.nonEmpty)
  }

  test("a spec-provisioned signature store probes row-identically to the " +
    "registered n08 store query") {
    // The registered build+probe first (it rebuilds the store itself)…
    val registered = graft.SparkEntry.queries("n08_neardup_store_probe")(spark, dir)
      .collect().toSet
    // …then the YAML plane provisions the SAME store (corpus split as a
    // plain filter step, sinkless: the stores are the output)…
    val spec = PipelineSpec.fromYaml(
      """pipeline: provision_sig_store
        |source: {table: documents}
        |steps:
        |  - op: filter
        |    expr: doc_id % 7 != 0
        |  - op: build_signature_store
        |""".stripMargin)
    runner.run(spec, dir)
    // …and the registered probe over the spec-built store answers
    // identically (same select/round/order as the gated query).
    val probed = graft.operators.MinHashLsh.nearDupAgainstStore(
        Tables.documents(spark, dir).filter(col("doc_id") % 7 === 0),
        spark.table(s"${NearDup.storeDb}.corpus_shingles"),
        spark.table(s"${NearDup.storeDb}.corpus_bands"),
        "doc_id", "text", NearDup.P)
      .select(col("batch_id").as("batch_doc"), col("corpus_id").as("corpus_doc"),
        round(col("jaccard"), 6).as("jaccard"))
      .collect().toSet
    assert(probed === registered)
    assert(probed.nonEmpty)
  }

  test("a spec-provisioned IVF store serves the registered e11 probe " +
    "row-identically") {
    val registered = graft.SparkEntry.queries("e11_knn_ivf_store")(spark, dir)
      .collect().toSet
    val spec = PipelineSpec.fromYaml(
      """pipeline: provision_ivf_store
        |source: {table: embeddings}
        |steps:
        |  - op: build_ivf_store
        |    coarse_probe: 4
        |""".stripMargin)
    runner.run(spec, dir)
    val c = Similarity.normalized(Tables.table(spark, dir, "embeddings"))
    val probed = graft.operators.IvfAnn.searchStored(
        spark.table(s"${NearDup.storeDb}.ivf_assign"),
        c.filter(col("vec_id") < 8),
        spark.table(s"${NearDup.storeDb}.ivf_centroids"),
        coarseProbe = 4, nProbe = 4, k = 5)
      .collect().toSet
    assert(probed === registered)
    assert(probed.nonEmpty)
  }

  test("near_dup_screen drops exactly the batch rows the persisted store " +
    "flags — the incremental near-dup step a changes-driven spec uses") {
    // Provision the store from the corpus slice (declaratively)…
    runner.run(PipelineSpec.fromYaml(
      """pipeline: screen_store
        |source: {table: documents}
        |steps:
        |  - op: filter
        |    expr: doc_id % 7 != 0
        |  - op: build_signature_store
        |""".stripMargin), dir)
    // …then screen the incoming batch against it via the spec op.
    val screened = runner.build(PipelineSpec.fromYaml(
      """pipeline: screen_batch
        |source: {table: documents}
        |steps:
        |  - op: filter
        |    expr: doc_id % 7 = 0
        |  - op: near_dup_screen
        |""".stripMargin), dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = Tables.documents(spark, dir).filter(col("doc_id") % 7 === 0)
    val flagged = graft.operators.MinHashLsh.nearDupAgainstStore(
        batch.select("doc_id", "text"),
        spark.table(s"${NearDup.storeDb}.corpus_shingles"),
        spark.table(s"${NearDup.storeDb}.corpus_bands"),
        "doc_id", "text", NearDup.P)
      .select("batch_id").collect().map(_.getLong(0)).toSet
    val expected = batch.select("doc_id").collect().map(_.getLong(0)).toSet -- flagged
    assert(screened === expected)
    assert(flagged.nonEmpty && screened.nonEmpty,
      s"degenerate fixture: flagged=${flagged.size} surviving=${screened.size}")
  }

  test("generic ops: filter, dedup, hash sampling compose and stay lazy") {
    val spec = PipelineSpec.fromYaml("""pipeline: slice
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: filter
    expr: doc_id % 2 = 0
  - op: dedup_exact
    cols: text
  - op: sample_hash
    rate: 0.5
""")
    val out = runner.build(spec, dir)
    val n = out.count()
    val evens = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
      .dropDuplicates("text").count()
    assert(n > 0 && n < evens, s"sampled $n of $evens")
  }

  test("catalog-table sink: each run lands as one auditable commit of a " +
    "versioned table; path+table sinks are mutually exclusive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
    spark.sql("DROP TABLE IF EXISTS graft_snap.pipe.slice_out")
    spark.sql("CREATE TABLE graft_snap.pipe.slice_out (doc_id BIGINT, text STRING)")
    val spec = PipelineSpec.fromYaml("""pipeline: to_table
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: filter
    expr: doc_id < 10
sink:
  table: graft_snap.pipe.slice_out
""")
    runner.run(spec, dir)
    runner.run(spec, dir) // append mode: second run = second commit
    assert(spark.table("graft_snap.pipe.slice_out").count() === 20L)
    assert(graft.sources.SnapshotCatalog
      .history("graft_snap", Seq("pipe", "slice_out")).map(_._1) === Seq(1L, 2L))

    // Overwrite mode truncates IN ONE COMMIT: history and tags survive.
    val ow = PipelineSpec.fromYaml("""pipeline: to_table_ow
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: filter
    expr: doc_id < 5
sink:
  table: graft_snap.pipe.slice_out
  mode: overwrite
""")
    runner.run(ow, dir)
    assert(spark.table("graft_snap.pipe.slice_out").count() === 5L)
    assert(graft.sources.SnapshotCatalog
      .history("graft_snap", Seq("pipe", "slice_out")).map(_._1) === Seq(1L, 2L, 3L),
      "overwrite must be a truncate COMMIT, not a drop+recreate that wipes history")

    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  format: parquet\n  path: /tmp/x\n  table: t\n"))
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: t\n  mode: truncate\n"))
    // Typoed sink keys fail loudly instead of degrading to a dry-run.
    val typo = intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  tabel: t\n"))
    assert(typo.getMessage.contains("unknown sink key"), typo.getMessage)
  }

  test("branch sink: the run stages on a branch and publishes (WAP in the " +
    "declarative plane); publish: false leaves it staged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
    spark.sql("DROP TABLE IF EXISTS graft_snap.pipe.wap_out")
    spark.sql("CREATE TABLE graft_snap.pipe.wap_out (doc_id BIGINT, text STRING)")
    def wapYaml(publish: String) = s"""pipeline: to_branch
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: filter
    expr: doc_id < 10
sink:
  table: graft_snap.pipe.wap_out
  branch: ingest
  publish: $publish
"""
    // Staged only: main untouched, rows audit-readable on the branch.
    runner.run(PipelineSpec.fromYaml(wapYaml("false")), dir)
    assert(spark.table("graft_snap.pipe.wap_out").count() === 0L)
    assert(spark.table("graft_snap.pipe.wap_out.branch_ingest").count() === 10L)
    // A second staged-run APPENDS to the same branch; publish releases all.
    runner.run(PipelineSpec.fromYaml(wapYaml("true")), dir)
    assert(spark.table("graft_snap.pipe.wap_out").count() === 20L)
    assert(graft.sources.SnapshotCatalog
      .history("graft_snap", Seq("pipe", "wap_out")).map(_._1) === Seq(1L, 2L),
      "each staged run must publish as its own auditable commit")
    // Validation: branch needs a table sink, append-only, publish needs branch.
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  format: parquet\n  path: /tmp/x\n  branch: b\n"))
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: t\n  branch: b\n  mode: overwrite\n"))
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: t\n  publish: true\n"))
    // A branch sink against a non-catalog-qualified table is loud.
    val e = intercept[Exception](runner.run(PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: just_a_table\n  branch: b\n"), dir))
    assert(e.getMessage.contains("catalog-qualified"), e.getMessage)
    // AUDIT gate: a failing constraint blocks publish, keeps the staging.
    spark.sql("DROP TABLE IF EXISTS graft_snap.pipe.audit_out")
    spark.sql("CREATE TABLE graft_snap.pipe.audit_out (doc_id BIGINT, text STRING)")
    def auditYaml(constraint: String) = s"""pipeline: audited
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
  - op: filter
    expr: doc_id < 10
sink:
  table: graft_snap.pipe.audit_out
  branch: gate
  audit: "$constraint"
"""
    val fail = intercept[IllegalArgumentException](
      runner.run(PipelineSpec.fromYaml(auditYaml("doc_id < 5")), dir))
    assert(fail.getMessage.contains("audit") &&
      fail.getMessage.contains("nothing staged"), fail.getMessage)
    assert(spark.table("graft_snap.pipe.audit_out").count() === 0L,
      "failed audit must not publish")
    // Pre-staging audit: a failed run stages NOTHING, so the retry below
    // cannot duplicate rows (and a violating row already in the BASE could
    // never block a valid new load).
    assert(!graft.sources.SnapshotStore.stateOf(
        graft.sources.SnapshotStore.keyOf("graft_snap", Seq("pipe", "audit_out")))
      .branches.get("gate").exists(_.snapshots.nonEmpty),
      "failed audit must stage nothing")
    // A passing constraint stages and publishes exactly this run's rows.
    runner.run(PipelineSpec.fromYaml(auditYaml("doc_id < 10 AND text IS NOT NULL")), dir)
    assert(spark.table("graft_snap.pipe.audit_out").count() === 10L)
    // audit requires a branch.
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: t\n  audit: \"doc_id IS NOT NULL\"\n"))

    // A REAL table shadowing the branch suffix must refuse the staging
    // write — name resolution would silently mis-route the rows into it.
    spark.sql("DROP TABLE IF EXISTS graft_snap.pipe.wap_out.branch_shad")
    spark.sql(
      "CREATE TABLE graft_snap.pipe.wap_out.branch_shad (doc_id BIGINT, text STRING)")
    val shadow = intercept[Exception](runner.run(PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: lang_id\n" +
        "sink:\n  table: graft_snap.pipe.wap_out\n  branch: shad\n"), dir))
    assert(shadow.getMessage.contains("shadows"), shadow.getMessage)
    spark.sql("DROP TABLE graft_snap.pipe.wap_out.branch_shad")
  }

  test("run() writes the sink; misuse fails eagerly with names") {
    val sink = java.nio.file.Files.createTempDirectory("graft-pipe").toString + "/out"
    val spec = PipelineSpec.fromYaml(s"""pipeline: to_parquet
source:
  table: documents
steps:
  - op: select
    cols: doc_id, text
sink:
  format: parquet
  path: $sink
""")
    runner.run(spec, dir)
    assert(spark.read.parquet(sink).count() ===
      Tables.documents(spark, dir).count())

    val unknown = intercept[RuntimeException](runner.build(
      PipelineSpec.fromYaml(
        "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: nope\n"), dir))
    assert(unknown.getMessage.contains("known:"), unknown.getMessage)

    val missingParam = intercept[RuntimeException](runner.build(
      PipelineSpec.fromYaml(
        "pipeline: p\nsource:\n  table: documents\nsteps:\n  - op: filter\n"), dir))
    assert(missingParam.getMessage.contains("missing required param 'expr'"))

    val missingCol = intercept[IllegalArgumentException](runner.build(
      PipelineSpec.fromYaml(
        "pipeline: p\nsource:\n  table: region\nsteps:\n  - op: lang_id\n"), dir))
    assert(missingCol.getMessage.contains("requires column"))
  }

  test("changes-source spec: rate-limited incremental curation refreshes the " +
    "sink to the batch answer; the checkpoint resumes past restarts") {
    val src = "graft_snap.pipe.chg_src"
    val sink = "graft_snap.pipe.chg_out"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
    Seq(src, sink, s"${sink}_mirror").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") < 90)
    docs.filter(col("doc_id") % 2 === 0).writeTo(src).append() // commit 1
    docs.filter(col("doc_id") % 2 === 1).writeTo(src).append() // commit 2
    val spec = PipelineSpec.fromYaml(
      s"""pipeline: chg_curation
         |source:
         |  table: $src
         |  changes: true
         |  max_versions_per_trigger: 1
         |steps:
         |  - op: quality_gate
         |    min_score: 0.4
         |  - op: lang_id
         |  - op: token_count
         |sink:
         |  table: $sink
         |""".stripMargin)
    assert(spec.sourceChanges && spec.sourceMaxVersionsPerTrigger === Some(1L))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-chg-ckpt-" +
      java.util.UUID.randomUUID
    new PipelineRunner(spark).runChanges(spec, ckpt).awaitTermination()
    def batchAnswer() = docs
      .filter(TextOps.qualityScore(col("text")) >= 0.4)
      .withColumn("lang", TextOps.predictedLang(col("text")))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
      .collect().toSet
    assert(spark.table(sink).collect().toSet === batchAnswer())
    assert(spark.table(sink).count() > 0)
    // A third commit lands while the stream is DOWN; resuming from the
    // checkpoint picks up exactly the new commit and refreshes again.
    val late = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") >= 90 && col("doc_id") < 120)
    late.writeTo(src).append() // commit 3
    new PipelineRunner(spark).runChanges(spec, ckpt).awaitTermination()
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") < 120)
      .filter(TextOps.qualityScore(col("text")) >= 0.4)
      .withColumn("lang", TextOps.predictedLang(col("text")))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
      .collect().toSet
    assert(spark.table(sink).collect().toSet === expected)
    // Source-key typos and misuse fail eagerly at parse.
    intercept[RuntimeException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: a.b.c\n  change: true\nsteps:\n  - op: lang_id\n"))
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: documents\n  changes: true\n" +
        "steps:\n  - op: lang_id\nsink:\n  table: a.b.c\n"))
    intercept[IllegalArgumentException](PipelineSpec.fromYaml(
      "pipeline: p\nsource:\n  table: a.b.c\n  changes: true\n" +
        "steps:\n  - op: lang_id\n"))
  }
}
