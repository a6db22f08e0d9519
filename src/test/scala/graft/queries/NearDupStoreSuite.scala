package graft.queries

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.MinHashLsh

/** n08: the incremental screen against a PERSISTED bucketed signature
  * store. Pins the three contract points the registration claims:
  * same answer as the inline n07 path, the probe actually READS the
  * store (no hidden recompute of the corpus side), and the bucketed
  * store side joins without a shuffle above its scan.
  */
class NearDupStoreSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("n08 store probe returns exactly the inline n07 answer") {
    val viaStore = NearDup.n08StoreNearDup.run(spark, dir).collect().toSeq
    val inline = NearDup.n07IncrementalNearDup.run(spark, dir).collect().toSeq
    assert(viaStore.nonEmpty)
    assert(viaStore === inline)
  }

  test("n08 probe reads the store, not the documents table: emptying the " +
    "store empties the answer") {
    // Build a store over an EMPTY corpus, then probe it with the full
    // batch. If nearDupAgainstStore recomputed the corpus side from the
    // raw documents (the bug this test exists to catch), the planted
    // pairs would still surface.
    val docs = Tables.documents(spark, dir)
    NearDup.buildCorpusStore(spark, docs.filter(col("doc_id") % 7 =!= 0).limit(0))
    val n = MinHashLsh.nearDupAgainstStore(
      docs.filter(col("doc_id") % 7 === 0),
      spark.table(s"${NearDup.storeDb}.corpus_shingles"),
      spark.table(s"${NearDup.storeDb}.corpus_bands"),
      "doc_id", "text", NearDup.P).count()
    assert(n === 0L, "probe found pairs in an empty store — corpus side recomputed?")
    // Rebuild the real store so later tests / reruns see the normal state.
    NearDup.buildCorpusStore(spark, docs.filter(col("doc_id") % 7 =!= 0))
  }

  test("n08 probe plan: no shuffle above the bucketed store scans") {
    val docs = Tables.documents(spark, dir)
    NearDup.buildCorpusStore(spark, docs.filter(col("doc_id") % 7 =!= 0))
    val probe = MinHashLsh.nearDupAgainstStore(
      docs.filter(col("doc_id") % 7 === 0),
      spark.table(s"${NearDup.storeDb}.corpus_shingles"),
      spark.table(s"${NearDup.storeDb}.corpus_bands"),
      "doc_id", "text", NearDup.P)
    // Static physical plan (pre-AQE wrapping) keeps the tree traversable.
    val sp = probe.queryExecution.sparkPlan
    def storeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case b: BatchScanExec
            if b.table.name.contains("corpus_bands") ||
              b.table.name.contains("corpus_shingles") => b
      }.isDefined
    // The store tables appear in the plan at all (the probe is wired to
    // the catalog tables, not a recomputed frame)…
    assert(storeScan(sp), s"store tables not scanned:\n$sp")
    // …and no shuffle exchange has a store scan beneath it: the bucketed
    // layout satisfies the join distribution, so only batch-side keys move.
    val shuffledStore = sp.collect {
      case e: ShuffleExchangeLike if storeScan(e) => e
    }
    assert(shuffledStore.isEmpty,
      s"store side shuffled despite bucketing:\n$sp")
  }
}
