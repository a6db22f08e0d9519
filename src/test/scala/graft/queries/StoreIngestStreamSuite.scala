package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.MinHashLsh

/** Top-level so Spark can derive an Encoder (inner classes need outer scope). */
case class StreamDoc(doc_id: Long, text: String)

/** Streaming ingest of the n08 signature store
  * ([[MinHashLsh.appendToStore]] as a `foreachBatch` body): the store
  * grows per micro-batch, and a subsequent probe sees corpus docs that
  * arrived through the stream — the loop between the streaming slice and
  * the dedup store, closed. The batch build (`NearDup.buildCorpusStore`)
  * provisions the bucketed layout once; each micro-batch appends
  * same-bucket-spec files, so the probe's shuffle-free store join is
  * unchanged.
  */
class StoreIngestStreamSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("store grows per micro-batch and the probe sees streamed corpus docs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Provision the store layout over an empty corpus; the stream fills it.
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir).limit(0))
    // The appends happen on foreachBatch's cloned micro-batch session;
    // this (parent) session's FileStatusCache must be refreshed before
    // each read or it serves the listing cached at the previous count —
    // the documented cross-session contract on appendToStore.
    def refreshStore(): Unit = {
      spark.catalog.refreshTable(s"${NearDup.storeDb}.corpus_bands")
      spark.catalog.refreshTable(s"${NearDup.storeDb}.corpus_shingles")
    }
    def bandCount(): Long = {
      refreshStore()
      spark.table(s"${NearDup.storeDb}.corpus_bands").count()
    }
    assert(bandCount() === 0L)

    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "a completely different document about spark catalyst planning"
    val input = MemoryStream[StreamDoc]
    val q = input.toDF().writeStream
      .foreachBatch(
        MinHashLsh.appendToStore(NearDup.storeDb, "doc_id", "text", NearDup.P) _)
      .start()
    try {
      input.addData(StreamDoc(1L, textA), StreamDoc(2L, textB))
      q.processAllAvailable()
      val n1 = bandCount()
      assert(n1 > 0L, "first micro-batch wrote no band rows")

      input.addData(StreamDoc(3L, "yet another unrelated corpus document entirely"))
      q.processAllAvailable()
      val n2 = bandCount()
      assert(n2 > n1, s"store did not grow across micro-batches ($n1 -> $n2)")

      // Probe: a new batch doc that duplicates the STREAMED doc 1 must
      // surface as a near-dup pair against the store.
      refreshStore()
      val batch = Seq((100L, textA)).toDF("doc_id", "text")
      val pairs = MinHashLsh.nearDupAgainstStore(
        batch,
        spark.table(s"${NearDup.storeDb}.corpus_shingles"),
        spark.table(s"${NearDup.storeDb}.corpus_bands"),
        "doc_id", "text", NearDup.P)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((100L, 1L)),
        s"probe missed the streamed near-dup: $pairs")
      assert(!pairs.exists(_._2 == 2L), s"false pair against unrelated doc: $pairs")
    } finally q.stop()
    // Leave the store in the normal full-corpus state for later suites.
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0))
  }

  test("screen-and-ingest loop: each slice screens against prior slices, " +
    "then joins the corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir).limit(0))
    spark.sql(s"DROP TABLE IF EXISTS ${NearDup.storeDb}.screen_pairs")

    val textA = "one shared crawl document text that will recur across slices"
    val input = MemoryStream[StreamDoc]
    val q = input.toDF().writeStream
      .foreachBatch(MinHashLsh.screenAndIngest(
        NearDup.storeDb, "screen_pairs", "doc_id", "text", NearDup.P) _)
      .start()
    try {
      // Slice 1: nothing ingested yet — screening must log no pairs.
      input.addData(StreamDoc(10L, textA),
        StreamDoc(11L, "some unrelated filler document about window functions"))
      q.processAllAvailable()
      spark.catalog.refreshTable(s"${NearDup.storeDb}.screen_pairs")
      assert(spark.table(s"${NearDup.storeDb}.screen_pairs").count() === 0L,
        "first slice screened against an empty store must log nothing")
      // Slice 2: re-crawls doc 10's text — the screen must catch it
      // against the slice-1 corpus BEFORE ingesting slice 2.
      input.addData(StreamDoc(20L, textA))
      q.processAllAvailable()
      spark.catalog.refreshTable(s"${NearDup.storeDb}.screen_pairs")
      val logged = spark.table(s"${NearDup.storeDb}.screen_pairs")
        .select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(logged === Set((20L, 10L)),
        s"expected exactly the cross-slice pair (20,10), got $logged")
    } finally q.stop()
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0))
  }

  test("replayed batchId no-ops: appendToStore and screenAndIngest are " +
    "idempotent under at-least-once delivery") {
    import spark.implicits._
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir).limit(0))
    spark.sql(s"DROP TABLE IF EXISTS ${NearDup.storeDb}.replay_pairs")

    val textA = "a crawl document replayed by the streaming engine after restart"
    val slice = Seq((1L, textA)).toDF("doc_id", "text")
    // First delivery ingests; the replay (same batchId — exactly what a
    // restarted stream re-delivers) must change nothing.
    MinHashLsh.appendToStore(NearDup.storeDb, "doc_id", "text", NearDup.P)(slice, 0L)
    def counts(): (Long, Long) = {
      spark.catalog.refreshTable(s"${NearDup.storeDb}.corpus_bands")
      spark.catalog.refreshTable(s"${NearDup.storeDb}.corpus_shingles")
      (spark.table(s"${NearDup.storeDb}.corpus_shingles").count(),
        spark.table(s"${NearDup.storeDb}.corpus_bands").count())
    }
    val afterFirst = counts()
    assert(afterFirst._1 > 0L)
    MinHashLsh.appendToStore(NearDup.storeDb, "doc_id", "text", NearDup.P)(slice, 0L)
    assert(counts() === afterFirst, "replayed appendToStore duplicated store rows")

    // screenAndIngest replay: batch 1 duplicates the stored doc — exactly
    // one pair logged no matter how many times batch 1 is delivered.
    val dup = Seq((2L, textA)).toDF("doc_id", "text")
    val screen = MinHashLsh.screenAndIngest(
      NearDup.storeDb, "replay_pairs", "doc_id", "text", NearDup.P) _
    screen(dup, 1L)
    screen(dup, 1L)
    val pairs = MinHashLsh.committedPairs(spark, NearDup.storeDb, "replay_pairs")
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((2L, 1L)),
      s"replayed screenAndIngest must log the cross-batch pair exactly once, got $pairs")
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0))
  }

  test("a failed attempt's rows stay invisible: no self-pairs, no duplicate " +
    "store rows after the successful replay") {
    import spark.implicits._
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir).limit(0))
    spark.sql(s"DROP TABLE IF EXISTS ${NearDup.storeDb}.crash_pairs")

    val textA = "the partially ingested slice that crashed before its commit marker"
    val slice = Seq((5L, textA)).toDF("doc_id", "text")
    // Simulate the partial-failure window ADVICE flagged: shingles AND
    // bands appended under an attempt whose commit marker never landed
    // (crash between the data append and the ledger write).
    val deadStamp = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("batch_nr", org.apache.spark.sql.functions.lit(7L))
        .withColumn("attempt", org.apache.spark.sql.functions.lit("dead-attempt"))
    val sh = slice.select(col("doc_id").as("id"),
      MinHashLsh.shingles(col("text"), NearDup.P.shingleSize).as("shingles"))
    deadStamp(sh).writeTo(s"${NearDup.storeDb}.corpus_shingles").append()
    deadStamp(MinHashLsh.bandFrame(
        MinHashLsh.signaturesFromShingles(sh, NearDup.P), NearDup.P))
      .writeTo(s"${NearDup.storeDb}.corpus_bands").append()

    // The replay re-delivers batch 7. If the dead attempt's rows were
    // visible, doc 5 would screen against its own half-ingested copy and
    // log a self-pair — the exact bug the ledger prevents.
    MinHashLsh.screenAndIngest(
      NearDup.storeDb, "crash_pairs", "doc_id", "text", NearDup.P)(slice, 7L)
    val pairs = MinHashLsh.committedPairs(spark, NearDup.storeDb, "crash_pairs").count()
    assert(pairs === 0L, "replayed batch screened against its own dead-attempt copy")
    // Committed view holds exactly ONE copy of doc 5's shingles (the
    // replay's); the dead attempt's row is permanently invisible.
    spark.catalog.refreshTable(s"${NearDup.storeDb}.corpus_shingles")
    val visible = MinHashLsh.committedOnly(
      spark.table(s"${NearDup.storeDb}.corpus_shingles"),
      MinHashLsh.committedBatches(spark, NearDup.storeDb))
      .filter(col("id") === 5L).count()
    assert(visible === 1L, s"expected exactly one committed copy of doc 5, got $visible")
    NearDup.buildCorpusStore(
      spark, Tables.documents(spark, SparkTestSession.sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0))
  }
}
