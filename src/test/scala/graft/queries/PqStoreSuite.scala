package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.PqAdc

/** e14: IVFADC against the persisted code table. Pins the contract: same
  * answer as the inline e13 composition, and the probe reads the STORED
  * codes — an emptied code table empties the answer, proving no hidden
  * re-encode path (the refinement's full-vector reads are the only
  * corpus-side access, and they can't resurrect candidates the code scan
  * never produced).
  */
class PqStoreSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def corpus() = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))

  private def centroids(c: org.apache.spark.sql.DataFrame) =
    c.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("emb").as("cemb"), col("norm").as("cnorm"))

  test("e14 store probe returns exactly the inline e13 answer") {
    val viaStore = Similarity.e14KnnIvfPqStore.run(spark, dir).collect().toSeq
    val inline = Similarity.e13KnnIvfPq.run(spark, dir).collect().toSeq
    assert(viaStore.nonEmpty)
    assert(viaStore === inline)
  }

  test("e14 probe reads the stored codes: emptying the code table empties " +
    "the answer") {
    val c = corpus()
    val cents = centroids(c)
    // Store built over an EMPTY corpus; real queries probe it. A hidden
    // re-encode of the corpus would still surface neighbours.
    Similarity.buildPqStore(spark, c.limit(0), cents, c.filter(col("vec_id") < 16))
    val n = PqAdc.searchStored(
      spark.table(s"${NearDup.storeDb}.pq_codes"),
      c,
      c.filter(col("vec_id") < 8),
      spark.table(s"${NearDup.storeDb}.pq_centroids"),
      spark.table(s"${NearDup.storeDb}.pq_seeds"),
      nProbe = 4, k = 5).count()
    assert(n === 0L, "probe found neighbours in an empty code table — corpus re-encoded?")
  }
}
