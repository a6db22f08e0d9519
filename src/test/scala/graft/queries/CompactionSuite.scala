package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.catalog.{CatalogAutomation, CatalogProfile}
import graft.operators.MinHashLsh

/** Small-file compaction of the streamed-into signature store
  * ([[CatalogAutomation.compactTable]]): after a run of micro-batch
  * appends the bucketed store tables hold one file set per batch;
  * compaction must (1) cut the file count, (2) leave the probe's answer
  * byte-identical, (3) leave the probe's plan shape unchanged — the
  * bucketed store side still joins without a shuffle above its scan —
  * (4) reclaim ledger-orphan rows when asked, and (5) be idempotent.
  */
class CompactionSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def auto = new CatalogAutomation(spark, CatalogProfile.Builtin())

  /** compactTable serves V1 bucketed-parquet stores (the pre-round-20
    * store layout; the production LSH store now lives on the snapshot
    * catalog, whose compaction is rewrite_data_files — CompactionV2Suite
    * territory). This suite keeps the V1 feature pinned on a local
    * replica of that layout. */
  private val compactDb = "graft_store_v1"
  private val led = graft.operators.IngestLedger(compactDb, "ingest_commits")

  private def rmrfManaged(table: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val p = new org.apache.hadoop.fs.Path(wh, s"$compactDb.db/$table")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** The pre-migration V1 store build: bucketed parquet + ledger stamp. */
  private def buildV1Store(corpus: org.apache.spark.sql.DataFrame): Unit = {
    auto.ensureDatabase(compactDb)
    Seq("corpus_shingles", "corpus_bands", "ingest_commits").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $compactDb.$t")
      rmrfManaged(t)
    }
    val sh = corpus
      .select(col("doc_id").as("id"),
        MinHashLsh.shingles(col("text"), NearDup.P.shingleSize).as("shingles"))
      .persist()
    try {
      led.stamp(sh, -1L, "bulk").write.mode("overwrite")
        .bucketBy(MinHashLsh.StoreBuckets, "id").sortBy("id")
        .saveAsTable(s"$compactDb.corpus_shingles")
      led.stamp(MinHashLsh.bandFrame(
          MinHashLsh.signaturesFromShingles(sh, NearDup.P), NearDup.P), -1L, "bulk")
        .write.mode("overwrite")
        .bucketBy(MinHashLsh.StoreBuckets, "band_idx", "band_hash")
        .sortBy("band_idx", "band_hash")
        .saveAsTable(s"$compactDb.corpus_bands")
      led.commit(spark, -1L, "bulk")
    } finally { sh.unpersist(); () }
  }

  /** One V1 micro-batch append (what appendToStore did pre-migration). */
  private def appendV1(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    val attempt = graft.operators.IngestLedger.newAttempt()
    val sh = batch
      .select(col("doc_id").as("id"),
        MinHashLsh.shingles(col("text"), NearDup.P.shingleSize).as("shingles"))
      .persist()
    try {
      led.stamp(sh, batchId, attempt).write.mode("append")
        .bucketBy(MinHashLsh.StoreBuckets, "id").sortBy("id")
        .saveAsTable(s"$compactDb.corpus_shingles")
      led.stamp(MinHashLsh.bandFrame(
          MinHashLsh.signaturesFromShingles(sh, NearDup.P), NearDup.P),
          batchId, attempt)
        .write.mode("append")
        .bucketBy(MinHashLsh.StoreBuckets, "band_idx", "band_hash")
        .sortBy("band_idx", "band_hash")
        .saveAsTable(s"$compactDb.corpus_bands")
      led.commit(spark, batchId, attempt)
    } finally { sh.unpersist(); () }
    spark.catalog.refreshTable(s"$compactDb.corpus_shingles")
    spark.catalog.refreshTable(s"$compactDb.corpus_bands")
  }

  private def probe() = MinHashLsh.nearDupAgainstStore(
    Tables.documents(spark, dir).filter(col("doc_id") % 7 === 0),
    spark.table(s"$compactDb.corpus_shingles"),
    spark.table(s"$compactDb.corpus_bands"),
    "doc_id", "text", NearDup.P)

  private def noShuffleAboveStore(): Unit = {
    val sp = probe().queryExecution.sparkPlan
    def storeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(t =>
              t.table == "corpus_bands" || t.table == "corpus_shingles") => f
      }.isDefined
    assert(storeScan(sp), s"store tables not scanned:\n$sp")
    assert(sp.collect { case e: ShuffleExchangeLike if storeScan(e) => e }.isEmpty,
      s"store side shuffled despite bucketing:\n$sp")
  }

  test("compaction cuts the file count, keeps answers byte-identical and " +
    "the probe plan shuffle-free; reruns converge") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    buildV1Store(docs.filter(col("doc_id") % 7 =!= 0))
    // A run of streamed appends: three micro-batches of synthetic docs,
    // each its own file set per bucket — the small-file regime.
    (0 until 3).foreach { b =>
      appendV1(Seq(
        (10000L + 2 * b, s"streamed slice $b about shuffle free bucketed joins"),
        (10001L + 2 * b, s"another slice $b document on catalyst plan shapes"))
        .toDF("doc_id", "text"), b.toLong)
    }
    // One orphan row from a dead ingest attempt — invisible to readers,
    // reclaimable by compaction.
    led.stamp(
        Seq((99999L, Seq("orphan shingle"))).toDF("id", "shingles"),
        batchId = 9L, attempt = "dead-attempt")
      .write.mode("append")
      .bucketBy(MinHashLsh.StoreBuckets, "id").sortBy("id")
      .saveAsTable(s"$compactDb.corpus_shingles")
    spark.catalog.refreshTable(s"$compactDb.corpus_shingles")

    val answerBefore = probe().orderBy("batch_id", "corpus_id").collect().toSeq
    assert(answerBefore.nonEmpty)
    noShuffleAboveStore()

    val rBands = auto.compactTable(compactDb, "corpus_bands")
    val rShingles = auto.compactTable(compactDb, "corpus_shingles",
      keepOnly = led.committedOnly(spark, _))
    assert(rBands.filesAfter < rBands.filesBefore,
      s"bands: ${rBands.filesBefore} -> ${rBands.filesAfter}")
    assert(rShingles.filesAfter < rShingles.filesBefore,
      s"shingles: ${rShingles.filesBefore} -> ${rShingles.filesAfter}")
    assert(rBands.filesAfter <= MinHashLsh.StoreBuckets)

    // The dead attempt's orphan row was reclaimed (raw count, not just
    // the committed view)…
    assert(spark.table(s"$compactDb.corpus_shingles")
      .filter(col("attempt") === "dead-attempt").count() === 0L)
    // …the probe's answer is byte-identical, and its plan is still the
    // shuffle-free bucketed join.
    val answerAfter = probe().orderBy("batch_id", "corpus_id").collect().toSeq
    assert(answerAfter === answerBefore)
    noShuffleAboveStore()

    // Idempotent: a second pass converges (no growth, same answer).
    val again = auto.compactTable(compactDb, "corpus_bands")
    assert(again.filesAfter <= rBands.filesAfter)
    assert(probe().orderBy("batch_id", "corpus_id").collect().toSeq === answerBefore)

  }

  test("staging reclamation: local dead pids swept; foreign hosts only past TTL") {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    auto.ensureDatabase(compactDb)
    spark.sql(s"DROP TABLE IF EXISTS $compactDb.compact_stage")
    rmrfManaged("compact_stage")
    Seq((1L, "x")).toDF("id", "payload")
      .write.saveAsTable(s"$compactDb.compact_stage")
    val meta = org.apache.spark.sql.graftbridge.GraftPlanBridge
      .tableMetadata(spark, compactDb, "compact_stage")
    val parent = new Path(meta.location).getParent
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = ".compact_stage__compact_"

    def mk(name: String, mtime: Option[Long] = None): Path = {
      val p = new Path(parent, prefix + name)
      fs.mkdirs(p)
      mtime.foreach(t => fs.setTimes(p, t, -1))
      p
    }
    // A pid this host has certainly never assigned twice concurrently.
    val deadPid = (1 to 20).map(i => 4000000L + i * 7919)
      .find(p => !ProcessHandle.of(p).isPresent).get
    val host = graft.catalog.CatalogAutomation.localHost
    val localDead = mk(s"${host}_$deadPid")
    val foreignFresh = mk("otherhost_12345")
    val foreignStale = mk("otherhost_67890",
      mtime = Some(System.currentTimeMillis() - 48L * 3600 * 1000))
    val localLive =
      if (ProcessHandle.of(1L).isPresent) Some(mk(s"${host}_1")) else None

    auto.compactTable(compactDb, "compact_stage")
    assert(!fs.exists(localDead), "same-host dead-pid staging dir not reclaimed")
    assert(!fs.exists(foreignStale), "stale foreign-host staging dir not reclaimed")
    assert(fs.exists(foreignFresh),
      "fresh foreign-host staging dir deleted — could be a live run's only copy")
    localLive.foreach(p =>
      assert(fs.exists(p), "same-host LIVE-pid staging dir deleted"))
    (Seq(foreignFresh) ++ localLive).foreach(p => fs.delete(p, true))
  }

  test("unbucketed tables compact to size-targeted coalesced files") {
    import spark.implicits._
    auto.ensureDatabase(compactDb)
    spark.sql(s"DROP TABLE IF EXISTS $compactDb.compact_plain")
    rmrfManaged("compact_plain")
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"row $i")).toDF("id", "payload")
        .write.mode("append").saveAsTable(s"$compactDb.compact_plain")
    }
    val before = spark.table(s"$compactDb.compact_plain")
      .orderBy("id").collect().toSeq
    val r = auto.compactTable(compactDb, "compact_plain")
    assert(r.filesAfter === 1, s"expected 1 coalesced file, got ${r.filesAfter}")
    assert(r.filesAfter < r.filesBefore)
    assert(spark.table(s"$compactDb.compact_plain")
      .orderBy("id").collect().toSeq === before)
  }
}
