package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
