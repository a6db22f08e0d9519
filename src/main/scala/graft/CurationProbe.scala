package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{IncrementalCuration, Pipeline, PipelineRunner, Tables}

/** PER-TRIGGER COST of changes-driven curation: FULL refresh (p04's shape —
  * re-run the whole pipeline over the accumulated mirror every trigger)
  * vs INCREMENTAL maintenance (p05 — maintained near-dup components +
  * per-language aggregates, text work O(batch)). The scale claim under
  * test: full-refresh re-MinHashes and re-self-joins the whole corpus
  * every trigger, so its wall grows with the mirror; the incremental
  * engine hashes only the batch and probes the persisted signature store,
  * so its wall stays near-flat.
  *
  * The probed spec is `near_dup_drop → row-local → temperature_mix` — the
  * shape whose maintenance is genuinely sub-corpus per trigger.
  * `span_removal` is deliberately NOT probed: its maintained gram index is
  * exact (the p05 gate and IncrementalCurationSuite pin it) but the index
  * itself is ~gram-volume-sized, so per-trigger index scans cost the same
  * order as recomputing — maintaining it buys exact deltas and avoided
  * re-tokenization CPU, not an asymptotic class (documented at
  * [[graft.queries.IncrementalCuration]]).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.CurationProbe [slices]
  * [scaleK]` (defaults 6, 1). `scaleK > 1` overlays K INDEPENDENT salted
  * copies of the documents corpus (every token prefixed per copy, so
  * copies share no 5-grams or shingles): the corpus grows K× while each
  * trigger's batch is corpus/slices — pick slices ∝ K to hold the BATCH
  * constant while the MIRROR grows, the regime the flat-wall claim is
  * about. Prints one line per trigger per mode.
  */
object CurationProbe {

  def main(args: Array[String]): Unit = {
    val slices = args.headOption.map(_.toInt).getOrElse(6)
    val scaleK = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[${SessionFactory.defaultCores}]"),
        "graft-curation-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val one = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val docs = (0 until scaleK).map { k =>
      if (k == 0) one
      else one.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(lit(s"c$k"), x)), " ").as("text"))
    }.reduce(_ unionByName _).persist()
    val n = docs.count()
    println(s"[curationprobe] corpus $n docs, $slices slices, scale=$scaleK, dir=$dir")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.cprobe")

    def slice(i: Int): DataFrame = docs.filter(col("doc_id") % slices === i)

    // -- FULL refresh (p04's per-trigger shape) ---------------------------
    val fullSink = "graft_snap.cprobe.full_sink"
    val mirror = s"${fullSink}_mirror"
    Seq(fullSink, mirror).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    docs.limit(0).writeTo(mirror).create()
    val fullWalls = (0 until slices).map { i =>
      val t0 = System.nanoTime()
      slice(i).writeTo(mirror).append()
      val out = Pipeline.curationPipeline(
        spark.table(mirror).select("doc_id", "text"), span = false)
      if (!spark.catalog.tableExists(fullSink)) out.writeTo(fullSink).create()
      else out.writeTo(fullSink).overwrite(lit(true))
      (System.nanoTime() - t0) / 1e6
    }

    // -- INCREMENTAL maintenance (p05) ------------------------------------
    val incSink = "graft_snap.cprobe.inc_sink"
    val spec = graft.catalog.PipelineSpec.fromYaml(
      s"""pipeline: cprobe_inc
         |source:
         |  table: graft_snap.cprobe.src
         |  changes: true
         |  refresh: incremental
         |steps:
         |  - op: near_dup_drop
         |  - op: quality_gate
         |    min_score: 0.5
         |  - op: lang_id
         |  - op: token_count
         |  - op: select
         |    cols: doc_id, lang, n_tokens
         |  - op: temperature_mix
         |sink:
         |  table: $incSink
         |""".stripMargin)
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-cprobe-" +
      java.util.UUID.randomUUID
    val engine = new IncrementalCuration(spark, spec, ckpt)
    spark.sql("DROP TABLE IF EXISTS graft_snap.cprobe.src")
    spark.sql("CREATE TABLE graft_snap.cprobe.src (doc_id BIGINT, text STRING)")
    engine.resetState()
    engine.ensureState()
    val incWalls = (0 until slices).map { i =>
      val batch = slice(i).withColumn("_change_type", lit("INSERT"))
        .withColumn("_commit_version", lit(i.toLong + 1))
        .withColumn("_commit_timestamp", current_timestamp())
      val t0 = System.nanoTime()
      engine.processBatch(batch, i.toLong)
      (System.nanoTime() - t0) / 1e6
    }

    // Same published rows (sanity — the probe must compare equal work).
    val a = spark.table(fullSink).selectExpr("doc_id", "round(p_incl,6)")
      .orderBy("doc_id").collect().toSeq
    val b = spark.table(incSink).selectExpr("doc_id", "round(p_incl,6)")
      .orderBy("doc_id").collect().toSeq
    require(a == b, s"probe outputs diverged: full=${a.size} inc=${b.size} rows")

    (0 until slices).foreach { i =>
      println(f"[curationprobe] trigger=$i%2d mirrorDocs=${(i + 1) * n / slices}%6d " +
        f"fullMs=${fullWalls(i)}%9.1f incMs=${incWalls(i)}%9.1f " +
        f"ratio=${fullWalls(i) / incWalls(i)}%5.2f")
    }
    val growthFull = fullWalls.last / fullWalls.head
    val growthInc = incWalls.last / incWalls.head
    println(f"[curationprobe] wall growth first->last trigger: " +
      f"full=${growthFull}%5.2fx inc=${growthInc}%5.2fx (rows identical)")
    spark.stop()
  }
}
