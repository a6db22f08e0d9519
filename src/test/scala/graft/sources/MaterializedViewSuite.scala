package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DECLARATIVE MATERIALIZED VIEWS ([[MaterializedViews]]): an MV is a
  * catalog table whose definition + freshness watermark ride in its
  * properties; `refresh_mv` folds the base's `.changes` into the stored
  * rows with one MERGE. The contract under test:
  *
  *   - after ANY refresh the MV is ROW-IDENTICAL to re-running the body
  *     from scratch (inserts, group-moving updates, deletes, group birth
  *     and death — the m09/m17 adversarial history, multi-key multi-
  *     measure this time);
  *   - the maintainability validator rejects every non-foldable body
  *     shape with guidance, at CREATE time (never a wrong refresh later);
  *   - NULL semantics survive folding: a nullable sum returns to NULL
  *     when its last non-null row leaves the group, and NULL group keys
  *     are real groups (null-safe MERGE keys);
  *   - the watermark protocol is crash-safe: a pending claim blocks
  *     refresh loudly, and recover => true either finalizes (merge
  *     landed) or clears and re-runs (it did not) by version math;
  *   - definitions + watermarks are DURABLE: a restarted session
  *     refreshes an MV it never created.
  */
class MaterializedViewSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mv")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mv.$name")
    s"$cat.mv.$name"
  }

  /** Orders-like base: key, group, nullable measure, non-null measure. */
  private def baseTable(name: String, n: Int = 200): String = {
    val t = fresh(name)
    spark.sql(s"""CREATE TABLE $t (
      k BIGINT, grp STRING, price DECIMAL(12,2), qty BIGINT)""")
    spark.sql(s"""INSERT INTO $t
      SELECT id, concat('g', id % 5),
        CASE WHEN id % 7 = 0 THEN CAST(NULL AS DECIMAL(12,2))
             ELSE CAST(id AS DECIMAL(12,2)) / 4 END,
        id % 13
      FROM range(0, $n)""")
    t
  }

  private def mvBody(t: String): String =
    s"""SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS total_qty,
      sum(price) AS total_price, count(price) AS n_priced
      FROM $t WHERE k % 11 <> 3 GROUP BY grp"""

  /** Run `f` with MV-based query rewrite forced OFF — the suite's
    * stored-vs-recomputed checks recompute bodies from the BASE, and a
    * fresh MV would serve that very comparison (turning it into a
    * tautology) otherwise. */
  private def noRewrite[T](f: => T): T = {
    spark.conf.set(MvQueryRewrite.EnabledKey, "false")
    try f finally spark.conf.unset(MvQueryRewrite.EnabledKey)
  }

  private def recompute(t: String): Array[String] =
    noRewrite(spark.sql(mvBody(t) + " ORDER BY grp").collect().map(_.toString))

  private def stored(v: String): Array[String] =
    spark.sql(s"SELECT grp, n, total_qty, total_price, n_priced FROM $v " +
      "ORDER BY grp").collect().map(_.toString)

  test("create materializes the body exactly; refresh after inserts, " +
      "group-moving updates and deletes is hash-identical to a recompute") {
    val t = baseTable("base1")
    val v = fresh("mv1")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${mvBody(t)}")
    assert(stored(v).toSeq === recompute(t).toSeq)

    // Commit 2: inserts (a brand-new group g9 is born).
    spark.sql(s"""INSERT INTO $t SELECT id, concat('g', id % 9),
      CAST(id AS DECIMAL(12,2)), id % 3 FROM range(1000, 1100)""")
    // Commit 3: a group-MOVING update (grp is the key and it changes).
    spark.sql(s"UPDATE $t SET grp = 'g9', qty = qty + 1 WHERE k % 10 = 4")
    // Commit 4: deletes, emptying some of what moved.
    spark.sql(s"DELETE FROM $t WHERE k % 5 = 4")

    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.${v.split('.').last}')").head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 4L && r.getBoolean(2))
    assert(stored(v).toSeq === recompute(t).toSeq)

    // Already fresh: the no-op round trip reports refreshed = false.
    val r2 = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.${v.split('.').last}')").head()
    assert(r2.getLong(0) === 4L && r2.getLong(1) === 4L && !r2.getBoolean(2))
  }

  test("a nullable sum returns to NULL when the last non-null row leaves " +
      "the group, and a group emptying out is deleted from the view") {
    val t = fresh("base2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, price DECIMAL(10,2))")
    spark.sql(s"""INSERT INTO $t VALUES
      (1, 'a', 5.00), (2, 'a', NULL), (3, 'b', 7.00), (4, 'b', 1.00)""")
    val v = fresh("mv2")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(price) AS total, count(price) AS np
      FROM $t GROUP BY grp""")
    // a loses its only non-null price: stored sum must become NULL (a
    // naive fold would leave 0.00). b empties entirely: the row must go.
    spark.sql(s"DELETE FROM $t WHERE k IN (1, 3, 4)")
    // refresh_mv refuses a plain table loudly.
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.base2')").collect()
    }
    assert(e.getMessage.contains("not a materialized view"))
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    val rows = spark.sql(s"SELECT * FROM $v ORDER BY grp").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "a" && rows(0).getLong(1) === 1L &&
      rows(0).isNullAt(2) && rows(0).getLong(3) === 0L)
  }

  test("NULL group keys are real groups across refreshes (null-safe keys)") {
    val t = fresh("base3")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, NULL, 10), (2, 'x', 1)")
    val v = fresh("mv3")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"INSERT INTO $t VALUES (3, NULL, 5)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    val nullRow = spark.sql(s"SELECT n, q FROM $v WHERE grp IS NULL").head()
    // A non-null-safe MERGE key would have INSERTED a duplicate NULL row.
    assert(spark.sql(s"SELECT count(*) FROM $v WHERE grp IS NULL")
      .head().getLong(0) === 1L)
    assert(nullRow.getLong(0) === 2L && nullRow.getLong(1) === 15L)
  }

  test("the maintainability validator rejects non-foldable bodies with " +
      "guidance, at CREATE time") {
    val t = baseTable("base4")
    val v = fresh("mv4")
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW $v AS $body")
      }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
      assert(!spark.sql(s"SHOW TABLES IN $cat.mv").collect()
        .exists(_.getString(1) == "mv4"), "no half-created MV may remain")
    }
    rejects(s"SELECT grp, sum(qty) AS q FROM $t GROUP BY grp",
      "must select count(*)")
    // (max/avg/min are ACCEPTED since round 17 — see the extrema test —
    // but their non-exact input types still refuse.)
    rejects(s"SELECT grp, count(*) AS n, " +
      s"avg(CAST(qty AS DOUBLE)) AS a FROM $t GROUP BY grp",
      "order-dependent")
    rejects(s"SELECT grp, count(*) AS n, first(qty) AS f FROM $t GROUP BY grp",
      "not incrementally maintainable")
    rejects(s"SELECT grp, count(*) AS n, qty AS __q_sum FROM $t " +
      "GROUP BY grp, qty", "reserved")
    rejects(s"SELECT grp, count(*) AS n, count(DISTINCT qty) AS d FROM $t " +
      "GROUP BY grp", "DISTINCT")
    rejects(s"SELECT grp, count(*) AS n, " +
      s"sum(CAST(qty AS DOUBLE)) AS q FROM $t GROUP BY grp",
      "order-dependent")
    rejects(s"SELECT grp, count(*) AS n, sum(price) AS p FROM $t GROUP BY grp",
      "count(")
    rejects(s"SELECT count(*) AS n FROM $t", "GROUP BY")
    rejects(s"SELECT upper(grp) AS g, count(*) AS n FROM $t GROUP BY grp",
      "neither a GROUP BY expression")
    rejects(s"SELECT count(*) AS n FROM $t GROUP BY grp", "not selected")
    rejects(s"SELECT grp, count(*) AS n FROM $t WHERE rand() < 0.5 GROUP BY grp",
      "deterministic")
    // (A fact ⋈ dim JOIN body is ACCEPTED since round 16 — see the STAR
    // tests below; a derived-table FROM is still not a catalog relation.)
    rejects(s"SELECT a.grp, count(*) AS n FROM (SELECT * FROM $t LIMIT 10) a " +
      "GROUP BY a.grp", "single catalog table")
    // Catalyst-deterministic but NOT refresh-stable: a subquery re-reads
    // its inner table's current contents at each refresh, and
    // current_date moves between refreshes — either would silently
    // diverge the stored rows from a recompute.
    rejects(s"SELECT grp, count(*) AS n FROM $t " +
      s"WHERE k IN (SELECT k FROM $t WHERE qty > 5) GROUP BY grp",
      "subquery")
    rejects(s"SELECT grp, count(*) AS n FROM $t " +
      "WHERE k < unix_date(current_date()) GROUP BY grp",
      "evaluation time")
  }

  test("watermark protocol: a pending claim blocks refresh loudly; " +
      "recover finalizes a landed merge and re-runs an unlanded one") {
    val t = fresh("base5")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv5")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(100, 130)")

    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "mv5"))
    // Simulate a crash AFTER the claim, BEFORE the merge: plant the claim.
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
      s0.properties + (MaterializedViews.PropPending -> "2")))
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv5')").collect()
    }
    assert(e.getMessage.contains("pending"))
    // recover: version math says the merge never landed -> clear + re-run.
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.mv5', recover => true)").head()
    assert(r.getBoolean(2))
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 60L)

    // Simulate a crash AFTER the merge, BEFORE finalize: rewind the
    // properties to look pre-refresh while the data already folded.
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(200, 210)")
    val before = SnapshotStore.stateOf(mvKey).properties
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv5')").collect()
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 70L)
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
      before + (MaterializedViews.PropPending -> "3")))
    // recover must FINALIZE (v advanced past self-version), never re-apply
    // — a re-applied delta would double-count to 80.
    val r2 = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.mv5', recover => true)").head()
    assert(!r2.getBoolean(2))
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 70L)
  }

  test("recovery version-math survives MV-table COMPACTION: a replace " +
      "commit between the crash and the recover must not finalize a " +
      "never-landed fold") {
    val t = fresh("base11")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv11")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(100, 120)")
    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "mv11"))
    // Crash AFTER the claim, BEFORE the MERGE…
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
      s0.properties + (MaterializedViews.PropPending -> "2")))
    // …then MAINTENANCE compacts the MV table: its version advances
    // WITHOUT any content commit. The old "version moved ⇒ merge landed"
    // math would finalize here and silently drop the 20-row delta.
    spark.sql(s"CALL $cat.system.rewrite_data_files('mv.mv11')")
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.mv11', recover => true)").head()
    assert(r.getBoolean(2), "recover must RE-RUN the fold, not finalize")
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 50L,
      "the delta must actually be applied")
  }

  test("recovery REFUSES foreign append DML (an append is provably not " +
      "the refresh's MERGE); a user replace-stamped overwrite of the MV " +
      "is fenced at the write") {
    val t = fresh("base13")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3) FROM range(0, 30)")
    val v = fresh("mv13")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    spark.sql(s"INSERT INTO $t VALUES (100, 'g0')")
    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "mv13"))
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
      s0.properties + (MaterializedViews.PropPending -> "2")))
    // Foreign DML while the claim is pending: an append commit.
    spark.sql(s"INSERT INTO $v VALUES ('gX', 7)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv13', " +
        "recover => true)").collect()
    }
    assert(e.getMessage.contains("directly") &&
      e.getMessage.contains("full => true"), s"got: ${e.getMessage}")
    // And the content-neutrality stamp itself cannot be forged: a user
    // overwrite claiming graft.operation=replace on an MV is refused.
    val e2 = intercept[Exception] {
      spark.range(0, 3).selectExpr("concat('z', id) AS grp", "id AS n")
        .writeTo(v).option("graft.operation", "replace")
        .overwrite(org.apache.spark.sql.functions.lit(true))
    }
    assert(e2.getMessage.contains("reserved for engine maintenance"),
      s"got: ${e2.getMessage}")
  }

  test("a no-op refresh adopts replace-only version drift into the " +
      "self-version stamp (re-arming MV query rewrite after compaction)") {
    val t = fresh("base12")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3) FROM range(0, 30)")
    val v = fresh("mv12")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "mv12"))
    spark.sql(s"CALL $cat.system.rewrite_data_files('mv.mv12')")
    def selfV = SnapshotStore.stateOf(mvKey)
      .properties(MaterializedViews.PropSelfVersion).toLong
    def nowV = SnapshotStore.stateOf(mvKey).snapshots.last.version
    assert(selfV != nowV, "fixture: compaction drifted the version")
    val r = spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv12')").head()
    assert(!r.getBoolean(2), "base unchanged: a no-op refresh")
    assert(selfV === nowV,
      "the no-op refresh must adopt the compaction drift into the stamp")
  }

  test("definitions and watermarks are durable: a restarted session " +
      "refreshes an MV it never created") {
    val t = fresh("base6")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 4), id FROM range(0, 40)")
    val v = fresh("mv6")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"DELETE FROM $t WHERE k % 4 = 1")
    // Restart: a fresh JVM has an empty state cache.
    SnapshotStore.tables.clear()
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT grp, n, q FROM $v ORDER BY grp").collect()
      .map(_.toString).toSeq ===
      noRewrite(spark.sql(s"SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t " +
        "GROUP BY grp ORDER BY grp").collect().map(_.toString).toSeq))
  }

  test("DROP MATERIALIZED VIEW refuses a plain table; IF NOT EXISTS is " +
      "idempotent; a partitioned MV folds exactly") {
    val t = fresh("base7")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val e = intercept[Exception] {
      spark.sql(s"DROP MATERIALIZED VIEW $t")
    }
    assert(e.getMessage.contains("plain table"))

    val v = fresh("mv7")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v PARTITIONED BY (grp) AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    // Idempotent create.
    spark.sql(s"""CREATE MATERIALIZED VIEW IF NOT EXISTS $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"UPDATE $t SET grp = 'g0' WHERE k % 3 = 2")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT grp, n, q FROM $v ORDER BY grp").collect()
      .map(_.toString).toSeq ===
      noRewrite(spark.sql(s"SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t " +
        "GROUP BY grp ORDER BY grp").collect().map(_.toString).toSeq))
    spark.sql(s"DROP MATERIALIZED VIEW $v")
    assert(!spark.sql(s"SHOW TABLES IN $cat.mv").collect()
      .exists(_.getString(1) == "mv7"))
  }

  test("expired base history past the watermark fails incremental refresh " +
      "with guidance; full => true rebuilds and re-arms the watermark") {
    val t = fresh("base9")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv9")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    // Three more base commits, then expire all but the newest: the
    // watermark (v1) now points into expired history.
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(100, 110)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(200, 210)")
    spark.sql(s"DELETE FROM $t WHERE k % 3 = 1")
    spark.sql(s"CALL $cat.system.expire_snapshots(table => 'mv.base9', keep_last => 1)")
    val e = intercept[Exception] {
      spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    }
    assert(e.getMessage.contains("full => true"), s"got: ${e.getMessage}")
    // The failed attempt must NOT leave a pending claim behind.
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.mv9', full => true)").head()
    assert(r.getBoolean(2))
    assert(spark.sql(s"SELECT grp, n, q FROM $v ORDER BY grp").collect()
      .map(_.toString).toSeq ===
      spark.sql(s"SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q " +
        s"FROM $t GROUP BY grp ORDER BY grp").collect().map(_.toString).toSeq)
    // ...and the rebuilt watermark folds incrementally again.
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(300, 306)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) ===
      spark.table(t).count())
  }

  test("a crashed FULL rebuild's claim blocks incremental refresh (never " +
      "version-math finalized) and full => true resumes it") {
    val t = fresh("base10")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv10")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(100, 110)")
    // Simulate a full rebuild that crashed AFTER its OVERWRITE landed,
    // BEFORE the watermark stamp: contents reflect v2, watermark says v1.
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv10', full => true)")
      .collect()
    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "mv10"))
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties = s0.properties +
      (MaterializedViews.PropBaseVersion -> "1") +
      (MaterializedViews.PropPending ->
        (MaterializedViews.FullClaim + "2"))))
    // Incremental refresh must refuse — even with recover => true (a
    // version-math finalize would be guessing about a rebuild).
    val e = intercept[Exception] {
      spark.sql(
        s"CALL $cat.system.refresh_mv(table => 'mv.mv10', recover => true)")
        .collect()
    }
    assert(e.getMessage.contains("FULL rebuild"), s"got: ${e.getMessage}")
    // The full path resumes (OVERWRITE is idempotent) and re-arms.
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv10', full => true)")
      .collect()
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 40L)
    spark.sql(s"INSERT INTO $t VALUES (500, 'g0', 1)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 41L)
  }

  test("staleness metadata rides SHOW TBLPROPERTIES; maintain with " +
      "maintain.refresh-mv refreshes as part of the policy pass") {
    val t = fresh("base8")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv8")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v
      TBLPROPERTIES ('maintain.refresh-mv' = 'true') AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q FROM $t GROUP BY grp""")
    def prop(key: String): Option[String] =
      spark.sql(s"SHOW TBLPROPERTIES $v").collect()
        .find(_.getString(0) == key).map(_.getString(1))
    assert(prop("mv.base-version").contains("1"), "the staleness surface")
    assert(prop("mv.base").contains("""["mv","base8"]"""))
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(100, 120)")
    spark.sql(s"CALL $cat.system.maintain(table => 'mv.mv8')").collect()
    assert(prop("mv.base-version").contains("2"),
      "maintain should have folded the base's new commit")
    assert(spark.sql(s"SELECT sum(n) FROM $v").head().getLong(0) === 50L)
  }

  // -- approx_count_distinct (HLL sketch) MVs --------------------------------

  test("approx_count_distinct MV: inserts union the hidden sketch, a " +
      "delete triggers the affected-group recompute, group-moving " +
      "updates fold — the stored estimate always equals a from-scratch " +
      "sketch and stays within 5% of the exact distinct count") {
    val t = fresh("base_ad")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, u BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), " +
      "CASE WHEN id % 17 = 4 THEN NULL ELSE id % 500 END FROM range(0, 3000)")
    val v = fresh("mv_ad")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, approx_count_distinct(u) AS du
      FROM $t GROUP BY grp""")
    def check(): Unit = {
      val served = spark.sql(s"SELECT grp, du FROM $v").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // Canonical-estimator pin: the stored estimate must equal a
      // from-scratch datasketches sketch over the current rows (the
      // union fold and the recompute are both lossless vs direct).
      val direct = noRewrite(spark.sql(
        s"""SELECT grp, coalesce(hll_sketch_estimate(hll_sketch_agg(u)), 0)
          FROM $t GROUP BY grp""").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
      assert(served === direct, "stored estimate must equal a fresh sketch")
      // Accuracy: within 5% of the exact distinct count per group.
      val exact = noRewrite(spark.sql(
        s"SELECT grp, count(DISTINCT u) FROM $t GROUP BY grp").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
      exact.foreach { case (g, e) =>
        val s = served.getOrElse(g, fail(s"group $g missing from the MV"))
        assert(math.abs(s - e) <= math.max(1L, (e * 0.05).toLong),
          s"group $g: served $s vs exact $e")
      }
    }
    check()
    // Insert-only commits: the MERGE unions partial sketches, no
    // recompute (new values + duplicates of stored ones).
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), " +
      "400 + id % 300 FROM range(5000, 6000)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    check()
    // Deletes: sketches are not invertible — affected groups recompute.
    spark.sql(s"DELETE FROM $t WHERE u % 7 = 3")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    check()
    // Group-moving update: −old/+new rows, both sides see deletes.
    spark.sql(s"UPDATE $t SET grp = 'g0' WHERE k % 11 = 5")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    check()
    // A brand-new group born in the missed range.
    spark.sql(s"INSERT INTO $t SELECT id, 'g9', id % 40 FROM range(9000, 9200)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    check()
  }

  test("approx_count_distinct MV rejections: STAR bodies, custom " +
      "relativeSD, unhashable types; exact count(DISTINCT) guidance " +
      "names the approx form; durable across restart") {
    val t = fresh("base_ad2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, u BIGINT, d DOUBLE)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 2), id % 50, " +
      "CAST(id AS DOUBLE) FROM range(0, 400)")
    val v = fresh("mv_ad2")
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW $v AS $body")
      }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(s"SELECT grp, count(*) AS n, count(DISTINCT u) AS du FROM $t " +
      "GROUP BY grp", "approx_count_distinct")
    rejects(s"SELECT grp, count(*) AS n, approx_count_distinct(u, 0.01) " +
      s"AS du FROM $t GROUP BY grp", "relativeSD")
    rejects(s"SELECT grp, count(*) AS n, approx_count_distinct(d) AS du " +
      s"FROM $t GROUP BY grp", "CAST")
    val (f, dd) = star("star_ad")
    rejects(s"""SELECT d.region AS region, count(*) AS n,
      approx_count_distinct(f.qty) AS dq
      FROM $f f JOIN $dd d ON f.dk = d.dk GROUP BY d.region""", "STAR")
    // The happy path survives a restart (sketch constituents rebuild
    // from the durable spec on refresh).
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, approx_count_distinct(u) AS du
      FROM $t GROUP BY grp""")
    SnapshotStore.tables.clear()
    spark.sql(s"INSERT INTO $t SELECT id, 'g1', id % 80, 0.0 FROM range(700, 900)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    val served = spark.sql(s"SELECT grp, du FROM $v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = noRewrite(spark.sql(
      s"""SELECT grp, coalesce(hll_sketch_estimate(hll_sketch_agg(u)), 0)
        FROM $t GROUP BY grp""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(served === direct)
  }

  // -- STAR-schema (join) MVs ------------------------------------------------

  /** fact(k, dk, status, qty) ⋈ dim(dk, region, note) — dk deliberately
    * shared between the two (the name-collision case a qualifier-stripped
    * spec would corrupt); `note` is never referenced by any star body
    * (the dim-fold cancellation case). */
  private def star(name: String): (String, String) = {
    val f = fresh(s"${name}_fact")
    val d = fresh(s"${name}_dim")
    spark.sql(s"CREATE TABLE $f (k BIGINT, dk BIGINT, status STRING, qty BIGINT)")
    spark.sql(s"CREATE TABLE $d (dk BIGINT, region STRING, note STRING)")
    spark.sql(s"""INSERT INTO $d
      SELECT id, concat('R', id % 4), concat('n', id) FROM range(0, 20)""")
    spark.sql(s"""INSERT INTO $f
      SELECT id, id % 20, concat('s', id % 2), id % 13 FROM range(0, 200)""")
    (f, d)
  }

  private def starBody(f: String, d: String): String =
    s"""SELECT d.region AS region, f.status AS status, count(*) AS n,
      sum(coalesce(f.qty, 0)) AS tq
      FROM $f f JOIN $d d ON f.dk = d.dk
      WHERE f.k % 11 <> 3 GROUP BY d.region, f.status"""

  private def starRecompute(f: String, d: String): Seq[String] =
    noRewrite(spark.sql(starBody(f, d) + " ORDER BY region, status")
      .collect().map(_.toString).toSeq)

  test("STAR MV: fact ⋈ dim body folds fact-only commits exactly — " +
      "inserts, a group-MOVING key update (the group lives on the DIM " +
      "side), deletes; durable across a restart") {
    val (f, d) = star("star1")
    val v = fresh("star1_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))

    // Fact commits: inserts, a dk-moving update (the fact's JOIN KEY
    // changes, moving rows across dim regions), deletes.
    spark.sql(s"""INSERT INTO $f
      SELECT id, id % 20, concat('s', id % 2), id % 7 FROM range(1000, 1080)""")
    spark.sql(s"UPDATE $f SET dk = (dk + 1) % 20 WHERE k % 5 = 2")
    spark.sql(s"DELETE FROM $f WHERE k % 6 = 1")
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star1_mv')").head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 4L && r.getBoolean(2))
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))

    // Restart: star spec + dim watermarks reload from the durable log.
    SnapshotStore.tables.clear()
    spark.sql(s"INSERT INTO $f VALUES (5000, 3, 's0', 9)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
  }

  test("STAR MV: an ADVANCED dimension folds incrementally — attribute " +
      "update (whole regions move), dim-row delete, dim insert, and a " +
      "simultaneous fact advance, all in bounded folds") {
    val (f, d) = star("star2")
    val v = fresh("star2_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    // Dim commits: an ATTRIBUTE update (every fact row of dk=3 moves to
    // region R9), a dim-row DELETE (dk=7's fact rows leave the inner
    // join), an insert a later fact row will reference.
    spark.sql(s"UPDATE $d SET region = 'R9' WHERE dk = 3")
    spark.sql(s"DELETE FROM $d WHERE dk = 7")
    spark.sql(s"INSERT INTO $d VALUES (999, 'R9', NULL)")
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star2_mv')").head()
    assert(r.getBoolean(2), "a dim advance must fold incrementally now")
    assert(MaterializedViews.lastDimFoldFactPartitions.get() >= 0L,
      "the refresh must have taken the dim-fold path")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
    // FACT and DIM advanced together: one refresh folds both telescoping
    // terms (Δf ⋈ d@old, then f@new ⋈ Δd).
    spark.sql(s"INSERT INTO $f VALUES (6001, 999, 's0', 4)")
    spark.sql(s"UPDATE $d SET region = 'R0' WHERE dk = 5")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
    // Current on both watermarks: a second refresh is a no-op.
    val r2 = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star2_mv')").head()
    assert(!r2.getBoolean(2), "fact and dims current: must be a no-op")
  }

  test("STAR MV: a dim JOIN-KEY-moving update folds exactly — the old " +
      "key's fact rows leave the join, and a move ONTO an existing key " +
      "fans its fact rows out to two dim rows") {
    val (f, d) = star("star5")
    val v = fresh("star5_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    // dk=4 → 25: fact rows with dk=4 lose their dim row entirely;
    // dk=18 → 2: fact rows with dk=2 now match TWO dim rows (legitimate
    // inner-join fan-out — counts double for those rows).
    spark.sql(s"UPDATE $d SET dk = 25 WHERE dk = 4")
    spark.sql(s"UPDATE $d SET dk = 2 WHERE dk = 18")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
  }

  test("STAR MV: a dim update touching only UNREFERENCED columns cancels " +
      "— the fact is not scanned at all, the watermark still advances") {
    val (f, d) = star("star6")
    val v = fresh("star6_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    spark.sql(s"UPDATE $d SET note = 'seen' WHERE dk % 2 = 0")
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star6_mv')").head()
    assert(r.getBoolean(2), "the watermark adoption is a refresh")
    assert(MaterializedViews.lastDimFoldFactPartitions.get() === 0L,
      "a cancelled dim delta must not scan the fact")
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
    val r2 = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star6_mv')").head()
    assert(!r2.getBoolean(2), "dim watermark adopted: must be a no-op")
  }

  test("STAR MV: a crashed dim-folding refresh (MERGE landed, stamp " +
      "lost) version-math finalizes BOTH the base and the claimed dim " +
      "watermarks — never a double-applied dim delta") {
    val (f, d) = star("star7")
    val v = fresh("star7_mv")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    val mvKey = SnapshotStore.keyOf(cat, Seq("mv", "star7_mv"))
    val dimKey = SnapshotStore.keyOf(cat, Seq("mv", "star7_dim"))
    val factKey = SnapshotStore.keyOf(cat, Seq("mv", "star7_fact"))
    val b0 = SnapshotStore.stateOf(mvKey)
      .properties(MaterializedViews.PropBaseVersion)
    val dv0 = SnapshotStore.stateOf(mvKey)
      .properties(MaterializedViews.PropDimVersions)
    val selfV0 = SnapshotStore.stateOf(mvKey).snapshots.last.version
    spark.sql(s"UPDATE $d SET region = 'R8' WHERE dk = 6")
    spark.sql(s"INSERT INTO $f VALUES (7000, 6, 's1', 3)")
    // A completed refresh = the MERGE landed; rewind its STAMP to
    // simulate the crash between the two commits.
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    val c = SnapshotStore.stateOf(factKey).snapshots.last.version
    val dimC = SnapshotStore.stateOf(dimKey).snapshots.last.version
    SnapshotStore.update(mvKey)(s0 => s0.copy(properties = s0.properties +
      (MaterializedViews.PropBaseVersion -> b0) +
      (MaterializedViews.PropDimVersions -> dv0) +
      (MaterializedViews.PropSelfVersion -> selfV0.toString) +
      (MaterializedViews.PropPending ->
        MaterializedViews.claimOf(c, Some(Seq(dimC))))))
    val r = spark.sql(
      s"CALL $cat.system.refresh_mv(table => 'mv.star7_mv', recover => true)")
      .head()
    assert(!r.getBoolean(2),
      "recovery must FINALIZE (the MERGE landed), not re-fold")
    val stamped = SnapshotStore.stateOf(mvKey).properties
    assert(stamped(MaterializedViews.PropBaseVersion) === c.toString)
    assert(MaterializedViews.dimVersionsOf(stamped) === Seq(dimC))
    assert(spark.sql(s"SELECT region, status, n, tq FROM $v ORDER BY region, status")
      .collect().map(_.toString).toSeq === starRecompute(f, d))
  }

  test("STAR MV: a REGRESSED dimension (dropped and recreated under the " +
      "watermark) refuses loudly") {
    val (f, d) = star("star8")
    val v = fresh("star8_mv")
    // Extra dim commits so the recorded watermark sits ABOVE what the
    // recreated dim's history can reach.
    spark.sql(s"UPDATE $d SET note = 'a' WHERE dk = 1")
    spark.sql(s"UPDATE $d SET note = 'b' WHERE dk = 1")
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS ${starBody(f, d)}")
    spark.sql(s"DROP TABLE $d")
    spark.sql(s"CREATE TABLE $d (dk BIGINT, region STRING, note STRING)")
    spark.sql(s"INSERT INTO $d SELECT id, concat('R', id % 4), NULL FROM range(0, 20)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.star8_mv')").collect()
    }
    assert(e.getMessage.contains("dropped and recreated"),
      s"got: ${e.getMessage}")
  }

  test("STAR MV rejections: outer joins, cross joins, mixed-catalog " +
      "sides, and pinned (AS OF) body relations — each at CREATE, " +
      "with the reason") {
    val (f, d) = star("star3")
    val v = fresh("star3_mv")
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW $v AS $body")
      }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    rejects(s"""SELECT d.region AS region, count(*) AS n FROM $f f
      LEFT JOIN $d d ON f.dk = d.dk GROUP BY d.region""", "INNER")
    rejects(s"""SELECT d.region AS region, count(*) AS n FROM $f f
      CROSS JOIN $d d GROUP BY d.region""", "INNER")
    rejects(s"""SELECT f.status AS status, count(*) AS n FROM $f f
      JOIN range(10) r ON f.k = r.id GROUP BY f.status""", "catalog")
    rejects(s"""SELECT status, count(*) AS n FROM $f VERSION AS OF 1
      GROUP BY status""", "LIVE")
  }

  test("an expired DIFF-PREDECESSOR (range live, snapshot b gone, first " +
      "missed commit row-level) fails incremental refresh with the " +
      "rebuild guidance, releases the claim, and full => true recovers") {
    val t = fresh("base_pred")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, qty BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id FROM range(0, 30)")
    val v = fresh("mv_pred")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q
      FROM $t GROUP BY grp""") // watermark b = 1
    spark.sql(s"DELETE FROM $t WHERE grp = 'g1'")                  // v2
    spark.sql(s"INSERT INTO $t VALUES (100, 'g9', 5)")             // v3
    spark.sql(s"CALL $cat.system.expire_snapshots(" +
      "table => 'mv.base_pred', keep_last => 2)").collect()        // v1 gone
    // The range (1, 3] is live and contiguous, but v2 is a row-level
    // commit whose change rows diff against the EXPIRED v1 — the fold is
    // unknowable, guidance demanded, claim released (not stuck).
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv_pred')")
        .collect()
    }
    assert(e.getMessage.contains("full => true"), s"got: ${e.getMessage}")
    val props = SnapshotStore.stateOf(
      SnapshotStore.keyOf(cat, Seq("mv", "mv_pred"))).properties
    assert(!props.contains(MaterializedViews.PropPending),
      "the claim must be released (the MERGE never landed)")
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mv.mv_pred', " +
      "full => true)").collect()
    val stored = spark.sql(s"SELECT grp, n, q FROM $v ORDER BY grp")
      .collect().map(_.toString).toSeq
    val expect = noRewrite(spark.sql(
      s"""SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS q
        FROM $t GROUP BY grp ORDER BY grp""").collect().map(_.toString).toSeq)
    assert(stored === expect)
  }

  // -- avg / min / max (round 17) ---------------------------------------------

  /** avg stores hidden sum/count constituents; min/max fold inserts and
    * RECOMPUTE only the affected groups when a delete removes (or, via
    * in-range insert-then-delete, undercuts) a stored extremum. */
  test("avg/min/max MVs: folding inserts, deleting a group's MAX, an " +
      "in-range insert-then-delete past the stored MIN, and group birth " +
      "with churn — all hash-identical to a recompute") {
    val t = fresh("base_ext")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, v BIGINT, price DECIMAL(12,2))")
    spark.sql(s"""INSERT INTO $t
      SELECT id, concat('g', id % 4), id * 10,
        CASE WHEN id % 6 = 0 THEN CAST(NULL AS DECIMAL(12,2))
             ELSE CAST(id AS DECIMAL(12,2)) END
      FROM range(0, 80)""")
    val v = fresh("mv_ext")
    val body = s"""SELECT grp, count(*) AS n, min(v) AS lo, max(v) AS hi,
      avg(v) AS av, min(price) AS lop, avg(price) AS avp
      FROM $t GROUP BY grp"""
    spark.sql(s"CREATE MATERIALIZED VIEW $v AS $body")
    def recompute(): Array[String] = noRewrite(
      spark.sql(body + " ORDER BY grp").collect().map(_.toString))
    def stored(): Array[String] = spark.sql(
      s"SELECT grp, n, lo, hi, av, lop, avp FROM $v ORDER BY grp")
      .collect().map(_.toString)
    assert(stored().toSeq === recompute().toSeq, "initial materialization")

    // Insert-only commit: extrema fold via least/greatest, no recompute
    // (the fold path), including a BIRTH (g7).
    spark.sql(s"INSERT INTO $t VALUES (1000, 'g7', 5, 1.00), " +
      "(1001, 'g0', -20, NULL), (1002, 'g0', 99999, 2.00)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(stored().toSeq === recompute().toSeq, "insert-only fold")

    // DELETE exactly g1's current max (k=77 → v=770 is max of g1): the
    // affected-group recompute must find the surviving max.
    val hi1 = noRewrite(spark.sql(
      s"SELECT max(v) FROM $t WHERE grp = 'g1'").head().getLong(0))
    spark.sql(s"DELETE FROM $t WHERE grp = 'g1' AND v = $hi1")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(stored().toSeq === recompute().toSeq, "deleted the stored max")

    // Delete a NON-extremum value: the stored extrema survive untouched
    // (no recompute needed; the <=/>= gate must not misfire).
    spark.sql(s"DELETE FROM $t WHERE grp = 'g2' AND k = 42")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(stored().toSeq === recompute().toSeq, "non-extremum delete")

    // One range with BOTH an insert-then-delete UNDERCUTTING g3's min
    // (the in-range value never survives but is lower than anything
    // stored — folding it would be silently wrong) and an UPDATE moving
    // a group's min away (group-moving delete+insert pair).
    spark.sql(s"INSERT INTO $t VALUES (2000, 'g3', -999, 3.00)")
    spark.sql(s"DELETE FROM $t WHERE k = 2000")
    spark.sql(s"UPDATE $t SET grp = 'g0' WHERE grp = 'g3' AND v = " +
      noRewrite(spark.sql(s"SELECT min(v) FROM $t WHERE grp = 'g3'")
        .head().getLong(0)).toString)
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(stored().toSeq === recompute().toSeq,
      "insert-then-delete past the min + min moved across groups")

    // Group death and an all-null avg/min group.
    spark.sql(s"DELETE FROM $t WHERE grp = 'g7'")
    spark.sql(s"INSERT INTO $t VALUES (3000, 'g8', 7, NULL)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    assert(stored().toSeq === recompute().toSeq, "death + all-null group")
    assert(!spark.sql(s"SELECT grp FROM $v").collect()
      .exists(_.getString(0) == "g7"), "dead group removed")

    // The avg column reads back exactly (double division of the exact
    // hidden constituents); spot-check one group end-to-end.
    val exp = noRewrite(spark.sql(
      s"SELECT avg(v) FROM $t WHERE grp = 'g0'").head().getDouble(0))
    assert(spark.sql(s"SELECT av FROM $v WHERE grp = 'g0'")
      .head().getDouble(0) === exp)
  }

  test("extrema rejections and serving boundaries: min/max refuse STAR " +
      "bodies; a stale extrema MV never offers the delta top-up") {
    val f = fresh("ext_fact")
    val d = fresh("ext_dim")
    spark.sql(s"CREATE TABLE $f (k BIGINT, ck BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE $d (ck BIGINT, seg STRING)")
    spark.sql(s"INSERT INTO $f SELECT id, id % 5, id FROM range(0, 50)")
    spark.sql(s"INSERT INTO $d SELECT id, concat('s', id % 2) FROM range(0, 5)")
    val v = fresh("ext_mv")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT d.seg AS seg, count(*) AS n, max(f.v) AS hi
        FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg""")
    }
    assert(e.getMessage.contains("STAR"), s"got: ${e.getMessage}")
    // Single-table extrema MV: fresh serves the rewrite; stale does NOT
    // top-up (extrema deltas are not foldable through deletes) — base.
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT ck, count(*) AS n, max(v) AS hi FROM $f GROUP BY ck""")
    def scans(sql: String): Seq[String] =
      "BatchScan ([^\\[ ]+)".r.findAllMatchIn(
        spark.sql(sql).queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq
    val q = s"SELECT ck, count(*) AS n, max(v) AS hi FROM $f GROUP BY ck"
    val fresh0 = scans(q)
    assert(fresh0.exists(_.contains("ext_mv")) &&
      !fresh0.exists(_.endsWith("ext_fact")),
      s"fresh extrema MV must serve (max is distributive), got $fresh0")
    spark.sql(s"INSERT INTO $f VALUES (9000, 1, 123456)")
    val stale = scans(q)
    assert(stale.exists(_.endsWith("ext_fact")) &&
      !stale.exists(_.contains("ext_mv")),
      s"a stale extrema MV must fall back, never top-up, got $stale")
  }
}
