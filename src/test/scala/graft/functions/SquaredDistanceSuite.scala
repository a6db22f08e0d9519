package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SquaredDistanceSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def viaExpr(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    GraftFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(call_function("graft_sqdist", col("a"), col("b")).as("d"))
      .as[Option[Double]].head()
  }

  test("matches the composable zip_with/aggregate fold bit-for-bit") {
    val r = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(64)(r.nextGaussian())
      val b = Seq.fill(64)(r.nextGaussian())
      val fused = viaExpr(a, b).get
      val viaBuiltins = Seq((a, b)).toDF("a", "b")
        .select(aggregate(
          zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"))
        .as[Double].head()
      assert(fused === viaBuiltins)
      // and the sequential scala fold (the documented order)
      assert(fused === a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + (x - y) * (x - y) })
    }
  }

  test("identical vectors give 0; length mismatch gives NULL") {
    assert(viaExpr(Seq(1.0, 2.0), Seq(1.0, 2.0)).get === 0.0)
    assert(viaExpr(Seq(1.0, 2.0), Seq(1.0)) === None)
  }

  test("interpreted eval agrees with codegen") {
    val arrT = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val e = SquaredDistance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), arrT),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0), arrT))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(interpreted === viaExpr(Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)).get)
    assert(interpreted === 8.0)
  }

  test("type check rejects non-double arrays") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sqdist(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }
}
