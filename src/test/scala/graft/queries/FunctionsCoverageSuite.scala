package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Scalar-surface coverage not exercised by the oracle queries (SURVEY
  * §2.9/§2.11): map functions, array builders, and the plain `udf()` rung
  * of the custom-logic ladder (everything hot uses built-ins or the custom
  * Expression instead).
  */
class FunctionsCoverageSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("map functions: build per-type value map from events, probe it") {
    val m = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .agg(map_from_arrays(collect_list("event_type"), collect_list("n")).as("by_type"))
    val row = m.select(
      size(map_keys(col("by_type"))).as("n_keys"),
      element_at(col("by_type"), "click").as("clicks")).head()
    assert(row.getInt(0) === 5)
    assert(row.getLong(1) > 0)
    val entries = m.select(explode(col("by_type"))).as[(String, Long)].collect().toMap
    assert(entries.keySet === Set("click", "error", "purchase", "signup", "view"))
  }

  test("array builders: sort, slice, flatten, sequence") {
    val out = spark.range(1)
      .select(
        array_sort(array(lit(3), lit(1), lit(2))).as("sorted"),
        slice(array(lit(1), lit(2), lit(3), lit(4)), 2, 2).as("mid"),
        flatten(array(array(lit(1)), array(lit(2), lit(3)))).as("flat"),
        sequence(lit(1), lit(4)).as("seq"))
      .as[(Seq[Int], Seq[Int], Seq[Int], Seq[Int])].head()
    assert(out === ((Seq(1, 2, 3), Seq(2, 3), Seq(1, 2, 3), Seq(1, 2, 3, 4))))
  }

  test("scala udf() works but stays off the hot path (ladder rung only)") {
    val initials = udf((name: String) => name.split(" ").map(_.headOption.getOrElse(' ')).mkString)
    val got = Tables.customer(spark, dir)
      .limit(5)
      .select(initials(col("c_name")).as("i"), col("c_name"))
      .as[(String, String)].collect()
    got.foreach { case (i, name) =>
      assert(i === name.split(" ").map(_.head).mkString)
    }
  }

  test("variant path extraction agrees with typed from_json on every event") {
    val both = Tables.events(spark, dir).select(
      variant_get(parse_json($"props"), "$.k", "int").as("k_variant"),
      from_json($"props", "k INT", Map.empty[String, String])
        .getField("k").as("k_typed"))
    assert(both.filter(!($"k_variant" <=> $"k_typed")).count() === 0)
    assert(both.filter($"k_variant".isNotNull).count() > 0)
  }
}
