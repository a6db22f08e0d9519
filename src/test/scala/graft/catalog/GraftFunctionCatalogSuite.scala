package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraftFunctionCatalogSuite extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graftfns", classOf[GraftFunctionCatalog].getName)
    s
  }
  import spark.implicits._

  test("catalog-resolved dot() evaluates and matches the expression-route fold") {
    val viaCatalog = spark.sql(
      "SELECT graftfns.ops.dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(viaCatalog === 32.0)
    // Bit-parity with the VectorOps fold on fixture embeddings.
    val e = graft.queries.Tables.embeddings(spark, SparkTestSession.sfDir)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .limit(5).createOrReplaceTempView("_fc_emb")
    val cat = spark.sql("SELECT graftfns.ops.dot(emb, emb) AS d FROM _fc_emb")
      .as[Double].collect().toSeq
    val expr = spark.table("_fc_emb")
      .select(graft.functions.VectorOps.dot(
        org.apache.spark.sql.functions.col("emb"),
        org.apache.spark.sql.functions.col("emb")).as("d"))
      .as[Double].collect().toSeq
    assert(cat === expr)
  }

  test("NULL input yields NULL, mismatched types are rejected at bind time") {
    val r = spark.sql("SELECT graftfns.ops.dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect().head
    assert(r.isNullAt(0))
    // NULL-parity with the expression route: length mismatch and null
    // elements are NULL, never an error or a garbage 0.0 read.
    assert(spark.sql("SELECT graftfns.ops.dot(array(1.0d), array(1.0d, 2.0d)) AS d")
      .collect().head.isNullAt(0))
    assert(spark.sql(
      "SELECT graftfns.ops.dot(array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d)) AS d")
      .collect().head.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT graftfns.ops.dot(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot"))
  }

  test("catalog lists its functions under the ops namespace") {
    val listed = spark.sql("SHOW FUNCTIONS IN graftfns.ops").collect().map(_.getString(0))
    assert(listed.exists(_.endsWith("dot")), listed.mkString(", "))
  }
}
