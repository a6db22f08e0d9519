package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{IngestLedger, PqAdc}

/** Top-level so Spark can derive an Encoder (inner classes need outer scope). */
case class StreamVec(vec_id: Long, emb: Seq[Double])

/** Streaming ingest of the persisted IVFADC store
  * ([[PqAdc.appendToPqStore]] as a `foreachBatch` body — the e15
  * registration's mechanism, exercised here through a real MemoryStream):
  * each micro-batch is routed + encoded against the STORED
  * centroids/codebooks and appended to the cell_id-bucketed code table;
  * the probe sees vectors that arrived through the stream; the ledger
  * makes re-delivery a no-op and keeps dead attempts invisible; and every
  * batch logs its centroid-drift row.
  */
class PqStoreIngestSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def corpus() = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))

  private def centroids(c: org.apache.spark.sql.DataFrame) =
    c.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("emb").as("cemb"), col("norm").as("cnorm"))

  private def refreshStore(): Unit =
    Seq("pq_codes", "pq_drift", "pq_ingest_commits").foreach { t =>
      spark.catalog.refreshTable(s"${NearDup.storeDb}.$t")
    }

  test("streamed micro-batches grow the code store; the stored probe then " +
    "matches the inline IVFADC composition; drift is logged per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val c = corpus()
    val cents = centroids(c)
    // Bulk build over two thirds of the corpus; the stream fills the rest.
    Similarity.buildPqStore(spark, c.filter(col("vec_id") % 3 =!= 0), cents,
      c.filter(col("vec_id") < 16))
    refreshStore()
    val bulkCodes = PqAdc.storedCodes(spark, NearDup.storeDb).count()
    assert(bulkCodes > 0L)

    val streamed = c.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("emb")).as[StreamVec].collect()
    val (half0, half1) = streamed.partition(_.vec_id % 2 == 0)
    val input = MemoryStream[StreamVec]
    val q = input.toDF().writeStream
      .foreachBatch(PqAdc.appendToPqStore(NearDup.storeDb) _)
      .start()
    try {
      input.addData(half0.toIndexedSeq)
      q.processAllAvailable()
      refreshStore()
      val n1 = PqAdc.storedCodes(spark, NearDup.storeDb).count()
      assert(n1 === bulkCodes + half0.length,
        s"first micro-batch: expected ${bulkCodes + half0.length} codes, got $n1")
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      refreshStore()
      val n2 = PqAdc.storedCodes(spark, NearDup.storeDb).count()
      assert(n2 === bulkCodes + streamed.length,
        s"second micro-batch: expected ${bulkCodes + streamed.length} codes, got $n2")
    } finally q.stop()

    // The stored probe over bulk ∪ streamed codes must equal the inline
    // composition over the full corpus (same frozen centroids/codebooks).
    val viaStore = PqAdc.searchStored(
      PqAdc.storedCodes(spark, NearDup.storeDb),
      c,
      c.filter(col("vec_id") < 8),
      spark.table(s"${NearDup.storeDb}.pq_centroids"),
      spark.table(s"${NearDup.storeDb}.pq_seeds"),
      nProbe = 4, k = 5).orderBy("query_id", "rnk").collect().toSeq
    val inline = PqAdc.searchCells(c, c.filter(col("vec_id") < 8), cents,
      nProbe = 4, k = 5).orderBy("query_id", "rnk").collect().toSeq
    assert(viaStore.nonEmpty)
    assert(viaStore === inline,
      "stored probe diverged from the inline IVFADC composition")

    // Drift accounting: one report row per committed batch (bulk −1 plus
    // the two streamed batches), vector counts conserved, and the mean
    // assignment cosine in a sane range.
    val drift = PqAdc.driftReport(spark, NearDup.storeDb).collect()
    assert(drift.map(_.getLong(0)).toSeq === Seq(-1L, 0L, 1L),
      s"drift report batches: ${drift.map(_.getLong(0)).toSeq}")
    assert(drift.map(_.getLong(1)).sum === bulkCodes + streamed.length)
    drift.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos > 0.0 && cos <= 1.0 + 1e-12, s"implausible mean cosine $cos")
    }
  }

  test("replayed batchId no-ops; a dead attempt's codes stay invisible") {
    import spark.implicits._
    val c = corpus()
    val cents = centroids(c)
    Similarity.buildPqStore(spark, c.filter(col("vec_id") % 3 =!= 0), cents,
      c.filter(col("vec_id") < 16))
    refreshStore()

    val batch = c.filter(col("vec_id") % 3 === 0).select("vec_id", "emb")
    val append = PqAdc.appendToPqStore(NearDup.storeDb) _
    append(batch, 0L)
    refreshStore()
    val afterFirst = PqAdc.storedCodes(spark, NearDup.storeDb).count()
    append(batch, 0L) // at-least-once re-delivery of a committed batch
    refreshStore()
    assert(PqAdc.storedCodes(spark, NearDup.storeDb).count() === afterFirst,
      "replayed appendToPqStore duplicated code rows")

    // Partial-failure window: codes appended under an attempt whose
    // commit marker never landed — must stay out of every committed view,
    // and the replay under a fresh attempt must be the only visible copy.
    val m = spark.table(s"${NearDup.storeDb}.pq_codes").schema
    val deadRows = PqAdc.ledger(NearDup.storeDb).stamp(
      PqAdc.storedCodes(spark, NearDup.storeDb).limit(3)
        .drop("batch_nr", "attempt"), 5L, "dead-attempt")
      .select(m.fieldNames.map(col).toIndexedSeq: _*)
    deadRows.writeTo(s"${NearDup.storeDb}.pq_codes").append()
    refreshStore()
    assert(PqAdc.storedCodes(spark, NearDup.storeDb).count() === afterFirst,
      "uncommitted attempt's rows leaked into the committed view")
    // Ledger view helper agrees with a manual semi-join.
    val manual = IngestLedger.visible(
      spark.table(s"${NearDup.storeDb}.pq_codes"),
      PqAdc.ledger(NearDup.storeDb).committed(spark)).count()
    assert(manual === afterFirst)
  }
}
