package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Change-data-feed over the versioned catalog: adjacent-version diffs must
  * emit exactly the changed rows, tag them with the right commit, carry
  * correct pre/post images, and NEVER emit unchanged carry-over rows (the
  * copy-on-write rewrite rewrites every row; the feed must not mistake a
  * carried-over row for an UPDATE).
  */
class ChangeDataFeedSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdf.$name")
    s"$cat.cdf.$name"
  }

  test("full history replay: INSERT / UPDATE / DELETE with pre/post images") {
    val t = freshTable("hist")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING, x DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)") // v1
    spark.sql(s"UPDATE $t SET v = 'B' WHERE id = 2")                 // v2
    spark.sql(s"DELETE FROM $t WHERE id = 1")                        // v3

    val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 0L, 3L)
      .orderBy("_commit_version", "id")
    assert(feed.columns.toSeq ===
      Seq("id", "_change_type", "_commit_version", "old_v", "new_v", "old_x", "new_x"))
    assert(feed.collect().toSeq === Seq(
      Row(1L, "INSERT", 1L, null, "a", null, 1.0),
      Row(2L, "INSERT", 1L, null, "b", null, 2.0),
      Row(2L, "UPDATE", 2L, "b", "B", 2.0, 2.0),
      Row(1L, "DELETE", 3L, "a", null, 1.0, null)))
  }

  test("carry-over rows of a rewrite are not changes; no-op UPDATE emits nothing") {
    val t = freshTable("noop")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'x')") // v1
    // The statement matches both rows but only row 1 actually changes value.
    spark.sql(s"UPDATE $t SET v = 'x' WHERE id = 2")       // v2: rewrite, zero changes
    spark.sql(s"UPDATE $t SET v = 'y' WHERE id = 1")       // v3: one real change
    val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 1L, 3L)
    assert(feed.collect().toSeq === Seq(Row(1L, "UPDATE", 3L, "x", "y")))
  }

  test("windowed feed starts after fromVersion and null images are typed") {
    val t = freshTable("win")
    spark.sql(s"CREATE TABLE $t (id BIGINT, n BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10)") // v1 — outside the window
    spark.sql(s"INSERT INTO $t VALUES (2, 20)") // v2
    spark.sql(s"DELETE FROM $t WHERE id = 1")   // v3
    val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 1L, 3L)
      .orderBy("_commit_version")
    assert(feed.collect().toSeq === Seq(
      Row(2L, "INSERT", 2L, null, 20L),
      Row(1L, "DELETE", 3L, 10L, null)))
    // Pre/post image columns keep the source column's type, nullable.
    val byName = feed.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(byName("old_n") === "BIGINT" && byName("new_n") === "BIGINT")
  }

  test("feed scans each version once and shuffles once") {
    val t = freshTable("plan")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"UPDATE $t SET v = 'b' WHERE id = 1")
    spark.sql(s"UPDATE $t SET v = 'c' WHERE id = 1")
    val feed = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 0L, 3L)
    // AQE wraps the tree, so count nodes in the rendered plan.
    val plan = feed.queryExecution.executedPlan.toString
    // 4 versions in [0, 3] → exactly 4 scans (the old join fold scanned the
    // two interior versions twice: 6).
    assert("BatchScan".r.findAllIn(plan).size === 4,
      s"expected one scan per version:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"expected a single key shuffle:\n$plan")
    assert(feed.count() === 3L) // INSERT + 2 UPDATEs
  }

  test("duplicate keys within one snapshot fail the feed loudly") {
    val t = freshTable("dup")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (1, 'b')") // duplicate key in v1
    val ex = intercept[Exception](
      ChangeDataFeed.tableChanges(spark, t, Seq("id"), 0L, 1L).collect())
    assert(ex.getMessage != null && ex.getMessage.contains("CDF precondition") ||
      Option(ex.getCause).exists(_.getMessage.contains("CDF precondition")),
      s"unexpected failure: $ex")
  }

  test("diff validateUniqueKeys flags duplicated join keys instead of cross-producting") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    val cur = Seq((1L, "c")).toDF("id", "v")
    // Default: documented precondition, caller's responsibility (no failure).
    assert(ChangeDataFeed.diff(prev, cur, Seq("id"), 1L).count() === 2L)
    val ex = intercept[Exception](
      ChangeDataFeed.diff(prev, cur, Seq("id"), 1L, validateUniqueKeys = true)
        .collect())
    assert(ex.getMessage != null && ex.getMessage.contains("diff precondition") ||
      Option(ex.getCause).exists(_.getMessage.contains("diff precondition")),
      s"unexpected failure: $ex")
  }

  test("manifest-pruned feed: identical output, reads only changed files") {
    val t = freshTable("pruned")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    // v1/v2: two separate append commits → two files. v3 touches only v1's
    // file (COW replaces just it); v2's file is untouched by every commit.
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"UPDATE $t SET v = 'A' WHERE id = 1")
    val full = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 0L, 3L)
    val pruned = ChangeDataFeed.tableChangesPruned(
      spark, "graft_snap", Seq("cdf", "pruned"), Seq("id"), 0L, 3L)
    assert(pruned.orderBy("_commit_version", "id").collect().toSeq ===
      full.orderBy("_commit_version", "id").collect().toSeq)
    def filesScanned(df: org.apache.spark.sql.DataFrame): Int =
      "(\\d+) files".r.findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).sum
    // Full feed scans each version wholly (v1:1 + v2:2 + v3:2 files = 5);
    // the pruned feed reads only each commit's added/retired files
    // (1 + 1 + 2 = 4 here, and the gap widens with every untouched file).
    assert(filesScanned(pruned) < filesScanned(full),
      s"pruned=${filesScanned(pruned)} full=${filesScanned(full)}")
    assert(filesScanned(pruned) === 4)
    // Unknown file paths in the reader option fail loudly.
    val e = intercept[Exception](
      spark.read.option("versionAsOf", 1).option("files", "/no/such.grf")
        .table(t).collect())
    assert(e.getMessage.contains("files option"), e.getMessage)
  }

  test("reserved working-column names fail loudly — any case, any version") {
    // Case-insensitive: withColumn resolves case-insensitively, so `_V`
    // would be clobbered exactly like `_v`.
    val t1 = freshTable("resv1")
    spark.sql(s"CREATE TABLE $t1 (id BIGINT, _V STRING)")
    spark.sql(s"INSERT INTO $t1 VALUES (1, 'x')")
    val e1 = intercept[IllegalArgumentException](
      ChangeDataFeed.tableChanges(spark, t1, Seq("id"), 0L, 1L))
    assert(e1.getMessage.contains("reserves"), e1.getMessage)
    // Mid-range evolution: a colliding column added AFTER fromVersion must
    // be caught too (only the head version's schema would miss it).
    val t2 = freshTable("resv2")
    spark.sql(s"CREATE TABLE $t2 (id BIGINT)")
    spark.sql(s"INSERT INTO $t2 VALUES (1)")
    spark.sql(s"ALTER TABLE $t2 ADD COLUMN _pv STRING")
    spark.sql(s"INSERT INTO $t2 VALUES (2, 'y')")
    val e2 = intercept[IllegalArgumentException](
      ChangeDataFeed.tableChanges(spark, t2, Seq("id"), 0L, 2L))
    assert(e2.getMessage.contains("reserves"), e2.getMessage)
  }

  test("invalid version windows fail loudly") {
    val t = freshTable("bad")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    intercept[IllegalArgumentException](
      ChangeDataFeed.tableChanges(spark, t, Seq("id"), 2L, 2L))
    intercept[IllegalArgumentException](
      ChangeDataFeed.tableChanges(spark, t, Seq.empty, 0L, 1L))
  }

  test("a range spanning ADD COLUMN names the evolution instead of a union error") {
    val t = freshTable("evorange")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")           // v1: (id, v)
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")           // v2: (id, v)
    spark.sql(s"ALTER TABLE $t ADD COLUMN w STRING")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 'C')")      // v3: (id, v, w)
    val e = intercept[IllegalArgumentException](
      ChangeDataFeed.tableChanges(spark, t, Seq("id"), 1L, 3L))
    assert(e.getMessage.contains("schema change"), e.getMessage)
    assert(e.getMessage.contains("split the range"), e.getMessage)
    // A same-schema sub-range before the ALTER still works.
    assert(ChangeDataFeed.tableChanges(spark, t, Seq("id"), 1L, 2L).count() === 1L)
  }

  test("diff rejects a pre-existing _kn column when validating uniqueness") {
    import spark.implicits._
    val withKn = Seq((1L, "x")).toDF("id", "_kn")
    val plain = Seq((1L, "x")).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      ChangeDataFeed.diff(withKn, withKn, Seq("id"), 1L, validateUniqueKeys = true))
    assert(e.getMessage.contains("_kn"), e.getMessage)
    // Without validation the column passes through untouched as data.
    val out = ChangeDataFeed.diff(withKn,
      Seq((1L, "y")).toDF("id", "_kn"), Seq("id"), 1L)
    assert(out.collect().toSeq === Seq(Row(1L, "UPDATE", 1L, "x", "y")))
    // And a clean frame under validation still works.
    assert(ChangeDataFeed.diff(plain, plain, Seq("id"), 1L,
      validateUniqueKeys = true).count() === 0L)
  }
}
