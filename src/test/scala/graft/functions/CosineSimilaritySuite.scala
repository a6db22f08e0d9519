package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{ScoredId, TopKByScore}

class CosineSimilaritySuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def viaExpr(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    GraftFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].head()
  }

  private def composable(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("matches the composable zip_with/aggregate form bit-for-bit") {
    val r = new scala.util.Random(1)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(64)(r.nextGaussian())
      val b = Seq.fill(64)(r.nextGaussian())
      val fused = viaExpr(a, b).get
      val viaBuiltins = Seq((a, b)).toDF("a", "b")
        .select((aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x)
          / (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (s, x) => s + x))
            * sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (s, x) => s + x)))).as("c"))
        .as[Double].head()
      assert(fused === viaBuiltins)
      assert(fused === composable(a, b))
    }
  }

  test("identical vectors give 1.0; orthogonal give 0.0; zero norm gives NULL") {
    assert(math.abs(viaExpr(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)).get - 1.0) < 1e-15)
    assert(viaExpr(Seq(1.0, 0.0), Seq(0.0, 1.0)).get === 0.0)
    assert(viaExpr(Seq(0.0, 0.0), Seq(1.0, 1.0)) === None)
  }

  test("interpreted eval agrees with codegen") {
    // Force the interpreted path by evaluating the expression directly.
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val codegen = viaExpr(Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)).get
    assert(interpreted === codegen)
  }

  test("registers through SparkSessionExtensions config") {
    val s2 = SparkSession.builder()
      .master("local[1]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val out = s2.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      assert(out === 1.0)
    } finally ()
    // (shared SparkContext; only the extra session is discarded)
  }

  test("type check rejects non-double arrays") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }

  test("TopKByScore keeps k best with deterministic tie-break") {
    val agg = new TopKByScore(3)
    val items = Seq(
      ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.9),
      ScoredId(4, 0.1), ScoredId(5, 0.7))
    val viaReduce = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(viaReduce).map(_.id) === Seq(2L, 3L, 5L))
    // merge of arbitrary splits gives the same answer
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) === agg.finish(viaReduce))
  }
}
