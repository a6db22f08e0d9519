package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Top-level so Spark derives an Encoder: one CDC change row as a stream
  * element (Options become nullable columns — INSERTs carry no pre-image). */
case class CdcEvent(k: Long, _change_type: String,
    old_grp: Option[String], old_amt: Option[Double],
    new_grp: Option[String], new_amt: Option[Double])

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

    // The SAME view maintained from the keyless `.changes` relation — whose
    // copy-on-write rewrites arrive at FILE grain as DELETE+INSERT pairs —
    // folds to the identical state (pairs cancel exactly in decimal).
    val fromChanges = IncrementalMaintenance.applyDeltas(
      IncrementalMaintenance.initial(v1, col("grp"), col("amt")),
      IncrementalMaintenance.aggDeltasFromChanges(
        spark.read.option("startingVersion", "2").table(s"$t.changes"),
        col("grp"), col("amt")))
    assert(fromChanges.select(col("group_key"), col("n_rows"),
      col("total").cast("double").as("total")).orderBy("group_key")
      .collect().toSeq === got)

    // An unexpected _change_type fails the batch loudly, never skips.
    import spark.implicits._
    val bad = Seq(("a", 1.0, "UPSERT")).toDF("grp", "amt", "_change_type")
    val e = intercept[Exception](IncrementalMaintenance
      .aggDeltasFromChanges(bad, col("grp"), col("amt")).collect())
    assert(e.getMessage.contains("unexpected _change_type") ||
      Option(e.getCause).exists(_.getMessage.contains("unexpected _change_type")),
      e.getMessage)

    // From-scratch recompute on the live table matches exactly.
    val scratch = IncrementalMaintenance.initial(
        spark.sql(s"SELECT * FROM $t"), col("grp"), col("amt"))
      .select(col("group_key"), col("n_rows"), col("total").cast("double").as("total"))
      .orderBy("group_key").collect().toSeq
    assert(got === scratch)
  }

  test("stored view maintained by statement-level MERGE, commit by commit") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.im")
    val t = s"$cat.im.sales_mv_src"
    val mv = s"$cat.im.sales_mv"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',1.10), (2,'a',2.20), (3,'b',3.30)") // v1
    spark.sql(s"UPDATE $t SET grp = 'c' WHERE id = 2")  // v2
    spark.sql(s"DELETE FROM $t WHERE grp = 'b'")        // v3
    spark.sql(s"UPDATE $t SET amt = 9.90 WHERE id = 1") // v4

    spark.sql(s"CREATE TABLE $mv (group_key STRING, n_rows BIGINT, total DECIMAL(38,4))")
    IncrementalMaintenance.initial(
        spark.sql(s"SELECT * FROM $t VERSION AS OF 1"), col("grp"), col("amt"))
      .createOrReplaceTempView("im_mv_init")
    spark.sql(s"INSERT INTO $mv SELECT * FROM im_mv_init")
    (2L to 4L).foreach { v =>
      val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), v - 1, v)
      IncrementalMaintenance.maintainInto(spark, mv,
        IncrementalMaintenance.aggDeltas(feed,
          col("old_grp"), col("old_amt"), col("new_grp"), col("new_amt")))
    }
    val got = spark.sql(
      s"SELECT group_key, n_rows, CAST(total AS DOUBLE) AS total FROM $mv ORDER BY group_key")
      .collect().toSeq
    assert(got === Seq(Row("a", 1L, 9.90), Row("c", 1L, 2.20)),
      "group b must be DELETEd, c INSERTed, a UPDATEd in place")
    // Every refresh is an auditable commit of the VIEW's own history:
    // 1 initial insert + 3 MERGE folds.
    assert(graft.sources.SnapshotCatalog.history(cat, Seq("im", "sales_mv"))
      .map(_._1) === Seq(1L, 2L, 3L, 4L))
    // Time travel reads the view as of any refresh: after v2's fold the
    // moved row sits in c, b still alive.
    assert(spark.sql(s"SELECT group_key, n_rows FROM $mv VERSION AS OF 2 ORDER BY group_key")
      .collect().toSeq === Seq(Row("a", 1L), Row("b", 1L), Row("c", 1L)))
  }

  test("streamed CDC tap maintains the stored view per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.im")
    val mv = s"$cat.im.stream_mv"
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $mv (group_key STRING, n_rows BIGINT, total DECIMAL(38,4))")

    val input = MemoryStream[CdcEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalMaintenance.maintainInto(batch.sparkSession, mv,
          IncrementalMaintenance.aggDeltas(batch,
            col("old_grp"), col("old_amt"), col("new_grp"), col("new_amt")))
      }
      .start()
    def view(): Seq[Row] = {
      spark.catalog.refreshTable(mv)
      spark.sql(s"SELECT group_key, n_rows, CAST(total AS DOUBLE) AS total " +
        s"FROM $mv ORDER BY group_key").collect().toSeq
    }
    try {
      input.addData(
        CdcEvent(1L, "INSERT", None, None, Some("a"), Some(1.5)),
        CdcEvent(2L, "INSERT", None, None, Some("a"), Some(2.5)),
        CdcEvent(3L, "INSERT", None, None, Some("b"), Some(4.0)))
      q.processAllAvailable()
      assert(view() === Seq(Row("a", 2L, 4.0), Row("b", 1L, 4.0)))

      input.addData(
        CdcEvent(2L, "UPDATE", Some("a"), Some(2.5), Some("b"), Some(2.5)),
        CdcEvent(3L, "DELETE", Some("b"), Some(4.0), None, None))
      q.processAllAvailable()
      assert(view() === Seq(Row("a", 1L, 1.5), Row("b", 1L, 2.5)))
    } finally q.stop()
  }

  test("the streaming .changes feed maintains the stored view through " +
    "rewrites, from an EMPTY view (history arrives as changes)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.im")
    val t = s"$cat.im.live_src"
    val mv = s"$cat.im.live_mv"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING, amt DOUBLE)")
    spark.sql(s"CREATE TABLE $mv (group_key STRING, n_rows BIGINT, total DECIMAL(38,4))")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',1.10), (2,'a',2.20), (3,'b',3.30)")

    // No initial(): the stream replays v1 as INSERT changes, so the view is
    // built AND maintained from the feed alone — the full CDC consumer loop
    // the append-only source cannot run (rewrites below flow through).
    val q = spark.readStream.table(s"$t.changes").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalMaintenance.maintainInto(batch.sparkSession, mv,
          IncrementalMaintenance.aggDeltasFromChanges(
            batch, col("grp"), col("amt")))
      }
      .start()
    def view(): Seq[Row] = {
      spark.catalog.refreshTable(mv)
      spark.sql(s"SELECT group_key, n_rows, CAST(total AS DOUBLE) AS total " +
        s"FROM $mv ORDER BY group_key").collect().toSeq
    }
    try {
      q.processAllAvailable()
      assert(view() === Seq(Row("a", 2L, 3.30), Row("b", 1L, 3.30)))
      spark.sql(s"UPDATE $t SET grp = 'c' WHERE id = 2")  // COW rewrite
      spark.sql(s"DELETE FROM $t WHERE grp = 'b'")        // COW rewrite
      q.processAllAvailable()
      val scratch = IncrementalMaintenance.initial(
          spark.sql(s"SELECT * FROM $t"), col("grp"), col("amt"))
        .select(col("group_key"), col("n_rows"),
          col("total").cast("double").as("total"))
        .orderBy("group_key").collect().toSeq
      assert(view() === scratch,
        "view maintained from the streamed feed must equal recompute")
    } finally q.stop()
  }

  test("stored view handles NULL group keys and all-NULL-measure deltas " +
    "(null-safe MERGE ON, coalesced totals)") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.im")
    val mv = s"$cat.im.null_mv"
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $mv (group_key STRING, n_rows BIGINT, total DECIMAL(38,4))")
    def deltasOf(events: Seq[CdcEvent]) =
      IncrementalMaintenance.aggDeltas(events.toDF(),
        col("old_grp"), col("old_amt"), col("new_grp"), col("new_amt"))
    // Batch 1 creates the NULL group; batch 2 must MATCH it (null-safe ON),
    // and its NULL-measure delta must not null the running total.
    IncrementalMaintenance.maintainInto(spark, mv, deltasOf(Seq(
      CdcEvent(1L, "INSERT", None, None, None, Some(2.0)))))
    IncrementalMaintenance.maintainInto(spark, mv, deltasOf(Seq(
      CdcEvent(2L, "INSERT", None, None, None, None))))
    val got = spark.sql(
      s"SELECT group_key, n_rows, CAST(total AS DOUBLE) AS total FROM $mv")
      .collect().toSeq
    assert(got === Seq(Row(null, 2L, 2.0)),
      s"NULL group must stay ONE row with a non-null total, got $got")
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
