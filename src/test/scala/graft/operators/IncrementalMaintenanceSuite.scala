package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Delta-propagation maintenance must equal from-scratch recompute through
  * the cases that break naive "add the inserts": group-moving updates,
  * groups dying to zero, and groups born from updates.
  */
class IncrementalMaintenanceSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  test("view folded through moves, births, and deaths equals recompute") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.im")
    val t = s"$cat.im.sales"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',1.10), (2,'a',2.20), (3,'b',3.30)") // v1
    spark.sql(s"UPDATE $t SET grp = 'c' WHERE id = 2")  // v2: a→c moves; c born
    spark.sql(s"DELETE FROM $t WHERE grp = 'b'")        // v3: b dies
    spark.sql(s"UPDATE $t SET amt = 9.90 WHERE id = 1") // v4: in-place measure change

    val v1 = spark.sql(s"SELECT * FROM $t VERSION AS OF 1")
    val folded = (2L to 4L).foldLeft(
      IncrementalMaintenance.initial(v1, col("grp"), col("amt"))) { (mv, v) =>
      val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), v - 1, v)
      IncrementalMaintenance.applyDeltas(mv,
        IncrementalMaintenance.aggDeltas(feed,
          col("old_grp"), col("old_amt"), col("new_grp"), col("new_amt")))
    }
    val got = folded.select(col("group_key"), col("n_rows"),
      col("total").cast("double").as("total")).orderBy("group_key").collect().toSeq
    assert(got === Seq(Row("a", 1L, 9.90), Row("c", 1L, 2.20)))

    // From-scratch recompute on the live table matches exactly.
    val scratch = IncrementalMaintenance.initial(
        spark.sql(s"SELECT * FROM $t"), col("grp"), col("amt"))
      .select(col("group_key"), col("n_rows"), col("total").cast("double").as("total"))
      .orderBy("group_key").collect().toSeq
    assert(got === scratch)
  }

  test("empty delta batch leaves the view unchanged") {
    import spark.implicits._
    val view = Seq(("a", 2L, BigDecimal("3.3000"))).toDF("group_key", "n_rows", "total")
      .select(col("group_key"), col("n_rows"),
        col("total").cast("decimal(38,4)").as("total"))
    val emptyFeed = Seq.empty[(String, String, Long, String, Double, String, Double)]
      .toDF("k", "_change_type", "_commit_version", "old_grp", "old_amt",
        "new_grp", "new_amt")
    val out = IncrementalMaintenance.applyDeltas(view,
      IncrementalMaintenance.aggDeltas(emptyFeed,
        col("old_grp"), col("old_amt"), col("new_grp"), col("new_amt")))
    assert(out.orderBy("group_key").collect().toSeq ===
      view.orderBy("group_key").collect().toSeq)
  }
}
