package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.IvfAnn

/** e11: two-level IVF search against the PERSISTED catalog index. Pins the
  * three contract points the registration claims: identical answer to the
  * inline e10 search (same centroids, routing and tie-breaks), the probe
  * actually READS the stored assignment (no hidden corpus re-assignment),
  * and the probe plan's file scans touch only store paths — the corpus
  * parquet never appears, so probe cost is O(|Q|) routing + an index read.
  */
class IvfStoreSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def corpus() = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))

  private def centroids(c: org.apache.spark.sql.DataFrame, nCells: Int) =
    c.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("emb").as("cemb"), col("norm").as("cnorm"))

  test("e11 store probe returns exactly the inline e10 answer") {
    val viaStore = Similarity.e11KnnIvfStore.run(spark, dir).collect().toSeq
    val inline = Similarity.e10KnnIvfScaled.run(spark, dir).collect().toSeq
    assert(viaStore.nonEmpty)
    assert(viaStore === inline)
  }

  test("e11 probe reads the stored assignment: emptying the store empties " +
    "the answer") {
    val c = corpus()
    val cents = centroids(c, 16)
    // Build the index over an EMPTY corpus, then probe with real queries.
    // If searchStored re-assigned the corpus from the raw embeddings (the
    // bug this test exists to catch), neighbours would still surface.
    Similarity.buildIvfStore(spark, c.limit(0), cents, coarseProbe = 4)
    val n = IvfAnn.searchStored(
      spark.table(s"${NearDup.storeDb}.ivf_assign"),
      c.filter(col("vec_id") < 8),
      spark.table(s"${NearDup.storeDb}.ivf_centroids"),
      coarseProbe = 4, nProbe = 4, k = 5).count()
    assert(n === 0L, "probe found neighbours in an empty index — corpus re-assigned?")
  }

  test("e11 probe plan scans only store tables when queries are literal: " +
    "no corpus re-scan") {
    val c = corpus()
    val cents = centroids(c, 16)
    Similarity.buildIvfStore(spark, c, cents, coarseProbe = 4)
    // Queries as a local (literal) frame — the production shape, where the
    // batch arrives from outside the corpus. Every FileSourceScan in the
    // probe plan must then be a store table: any scan of embeddings.parquet
    // would mean the probe re-derives corpus state instead of reading the
    // index.
    val qRows = c.filter(col("vec_id") < 4).collect().toSeq
    import scala.jdk.CollectionConverters._
    val queries = spark.createDataFrame(qRows.asJava, c.schema)
    val probe = IvfAnn.searchStored(
      spark.table(s"${NearDup.storeDb}.ivf_assign"),
      queries,
      spark.table(s"${NearDup.storeDb}.ivf_centroids"),
      coarseProbe = 4, nProbe = 4, k = 5)
    assert(probe.count() > 0)
    // The store tables are snapshot-catalog (V2) scans; any V1 file scan
    // in the plan would be the corpus parquet being re-read — the bug
    // this test exists to catch.
    val v2Scans = probe.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(v2Scans.nonEmpty)
    val nonStore = v2Scans.filterNot(b =>
      b.table.name.contains("ivf_assign") || b.table.name.contains("ivf_centroids"))
    assert(nonStore.isEmpty,
      s"probe plan scans non-store tables: ${nonStore.map(_.table.name)}")
    val fileScans = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"probe plan re-scans corpus files: ${fileScans.map(_.tableIdentifier)}")
  }
}
