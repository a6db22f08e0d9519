package graft.sources

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The DURABLE metadata log: catalog state lives in versioned metadata
  * files under each table's warehouse directory (commit = append a manifest
  * + atomically claim `v<N+1>.json`), so tables SURVIVE the JVM and are
  * SHARED between sessions on one warehouse — the semantics the reference
  * gets from Glue (`create_iceberg_tables.py:122-126`). "Restart" is
  * simulated by clearing the in-JVM cache ([[SnapshotStore.tables]]): every
  * read after that must come from disk.
  */
class DurableCatalogSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dur")
    spark.sql(s"DROP TABLE IF EXISTS $cat.dur.$name")
    s"$cat.dur.$name"
  }

  private def restart(): Unit = {
    // A fresh JVM has an empty cache; the warehouse registry re-populates
    // at catalog initialize, which already ran in this session.
    SnapshotStore.tables.clear()
    SnapshotStore.namespaces.clear()
  }

  test("a full table history replays from disk after restart: time travel, " +
      "changes, history, tags, MOR deletes, schema evolution") {
    val t = fresh("replay")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING, amt DOUBLE) " +
      s"PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'eu', 10.0), (2, 'us', 20.0)") // v1
    spark.sql(s"INSERT INTO $t VALUES (3, 'eu', 30.0)")                  // v2
    spark.sql(s"UPDATE $t SET amt = amt + 1 WHERE id = 2")               // v3 (COW)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $t WHERE id = 1")                            // v4 (MOR)
    spark.sql(s"CALL $cat.system.create_tag('dur.replay', 'rel1', 2)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $t VALUES (4, 'ap', 40.0, 'new')")           // v5

    def snap(): (Seq[Row], Seq[Row], Seq[Row], Seq[Row], Seq[Row]) = (
      spark.sql(s"SELECT * FROM $t ORDER BY id").collect().toSeq,
      spark.sql(s"SELECT id, amt FROM $t VERSION AS OF 2 ORDER BY id").collect().toSeq,
      spark.sql(s"SELECT id, amt FROM $t VERSION AS OF 'rel1' ORDER BY id").collect().toSeq,
      spark.sql(s"SELECT version, operation, total_rows FROM $t.history " +
        "ORDER BY version").collect().toSeq,
      spark.read.option("startingVersion", 1).option("endingVersion", 4)
        .table(s"$t.changes")
        .selectExpr("id", "_change_type", "_commit_version")
        .orderBy("_commit_version", "id", "_change_type").collect().toSeq)

    val before = snap()
    assert(before._1.size === 3)
    restart()
    val after = snap()
    assert(after === before)

    // The restarted "session" keeps committing: versions continue, not restart.
    spark.sql(s"INSERT INTO $t VALUES (5, 'eu', 50.0, null)")            // v6
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 4L)
    assert(SnapshotCatalog.history(cat, Seq("dur", "replay")).map(_._1) ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("branches and write-audit-publish survive restart; fast_forward " +
      "publishes staged pre-restart commits") {
    val t = fresh("wap")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'main')")
    spark.sql(s"CALL $cat.system.create_branch('dur.wap', 'audit')")
    spark.sql(s"INSERT INTO $t.branch_audit VALUES (2, 'staged')")
    restart()
    // Staged rows visible on the branch, not on main.
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L)))
    assert(spark.sql(s"SELECT id FROM $t.branch_audit ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L)))
    spark.sql(s"CALL $cat.system.fast_forward('dur.wap', 'audit')")
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "main"), Row(2L, "staged")))
  }

  test("a session with a STALE cache retries against the log: no lost updates") {
    val t = fresh("stale")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    val k = SnapshotStore.keyOf(cat, Seq("dur", "stale"))
    val stale = SnapshotStore.stateOf(k) // "session B" snapshots its view here
    spark.sql(s"INSERT INTO $t VALUES (2)") // session A commits meanwhile
    // Session B comes back with its stale view as the cached state…
    SnapshotStore.tables.put(k, stale)
    // …and commits. The durable CAS must reject the stale base, reload the
    // log, and re-apply — BOTH rows 2 and 3 survive.
    spark.sql(s"INSERT INTO $t VALUES (3)")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L), Row(3L)))
    assert(SnapshotCatalog.history(cat, Seq("dur", "stale")).map(_._1) ===
      Seq(1L, 2L, 3L))
  }

  test("a stale-based ROW-LEVEL rewrite stays a loud OCC conflict, " +
      "not a silent retry that erases the concurrent commit") {
    val t = fresh("occ")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val k = SnapshotStore.keyOf(cat, Seq("dur", "occ"))
    val stale = SnapshotStore.stateOf(k)
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    SnapshotStore.tables.put(k, stale) // session B's stale view
    // B's UPDATE plans against the stale snapshot; at commit the durable
    // claim fails, the transition re-runs on the reloaded state, and the
    // base validation inside it throws the concurrent-commit error.
    val e = intercept[Exception](spark.sql(s"UPDATE $t SET v = 'x' WHERE id = 1"))
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
  }

  test("two threads appending concurrently both land (claim decides order)") {
    val t = fresh("race")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    val k = SnapshotStore.keyOf(cat, Seq("dur", "race"))
    val gate = new CountDownLatch(1)
    def append(id: Long): Thread = {
      val th = new Thread(() => {
        gate.await()
        SnapshotStore.commit(k,
          Vector.empty[SnapshotStore.DataFile], replace = false)
        ()
      })
      th.start(); th
    }
    val ths = (1L to 4L).map(append)
    gate.countDown()
    ths.foreach(_.join())
    val st = SnapshotStore.stateOf(k)
    assert(st.snapshots.map(_.version) === Vector(1L, 2L, 3L, 4L))
    assert(st.metaVersion === 5L) // v1 create + 4 commits
  }

  test("CREATE TABLE is exclusive across sessions: the disk claim wins " +
      "even when the cache is empty") {
    val t = fresh("excl")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    restart()
    val e = intercept[Exception](spark.sql(s"CREATE TABLE $t (id BIGINT)"))
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    // IF NOT EXISTS converges silently, from disk alone.
    spark.sql(s"CREATE TABLE IF NOT EXISTS $t (id BIGINT)")
    assert(spark.sql(s"SELECT * FROM $t").count() === 0L)
  }

  test("RENAME is one directory move (relative manifests); the renamed " +
      "table reloads from its new location after restart") {
    val t = fresh("ren_a")
    spark.sql(s"DROP TABLE IF EXISTS $cat.dur.ren_b")
    spark.sql(s"CREATE TABLE $t (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'y')")
    spark.sql(s"UPDATE $t SET id = 20 WHERE id = 2")
    spark.sql(s"ALTER TABLE $t RENAME TO dur.ren_b")
    restart()
    assert(spark.sql(s"SELECT id FROM $cat.dur.ren_b ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(20L)))
    // Time travel rides along — history is in the moved metadata log.
    assert(spark.sql(s"SELECT id FROM $cat.dur.ren_b VERSION AS OF 1 ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L)))
    intercept[Exception](spark.sql(s"SELECT * FROM $t"))
  }

  test("listTables / listNamespaces see disk state after restart") {
    val t = fresh("lst")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    restart()
    val tables = spark.sql(s"SHOW TABLES IN $cat.dur").collect()
      .map(_.getString(1)).toSet
    assert(tables.contains("lst"), tables)
    val nss = spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet
    assert(nss.contains("dur"), nss)
  }

  test("orphan-file GC still judges the DATA of a table literally named " +
      "'metadata' (the log check is anchored, not a substring match)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dur")
    spark.sql(s"DROP TABLE IF EXISTS $cat.dur.metadata")
    spark.sql(s"CREATE TABLE $cat.dur.metadata (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.dur.metadata VALUES (1)")
    // Plant a crash-residue file in the table's DATA area.
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("dur", "metadata")))
    val residue = new org.apache.hadoop.fs.Path(st.dataDir, "crashed-task.parquet")
    val fs = residue.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(residue, false); out.write(1); out.close()
    val orphans = spark.sql(
      s"CALL $cat.system.remove_orphan_files('dur.metadata', 0.0D, true)")
      .collect().map(_.getString(0))
    assert(orphans.exists(_.endsWith("crashed-task.parquet")),
      s"the residue must be judged even though every path of this table " +
        s"contains '/metadata/': ${orphans.mkString(", ")}")
    assert(orphans.forall(!_.contains("/metadata/metadata/")),
      "the LOG of the metadata-named table must still be shielded: " +
        orphans.mkString(", "))
  }

  test("orphan-file GC never judges the metadata log") {
    val t = fresh("gcmeta")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    spark.sql(s"INSERT INTO $t VALUES (2)")
    // Floor 0 + dry run lists EVERY unreferenced aged file — metadata must
    // not be in it even though no manifest references metadata files.
    val orphans = spark.sql(
      s"CALL $cat.system.remove_orphan_files('dur.gcmeta', 0.0D, true)")
      .collect().map(_.getString(0))
    assert(orphans.forall(!_.contains("/metadata/")), orphans.mkString(", "))
    // And the data itself still reads (nothing was deleted).
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 2L)
  }

  test("streaming epoch watermarks survive restart: a replayed epoch " +
      "still no-ops after the cache is cleared") {
    val t = fresh("epoch")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    val k = SnapshotStore.keyOf(cat, Seq("dur", "epoch"))
    SnapshotStore.commitEpoch(k, "q1", 0L, Vector.empty)
    SnapshotStore.commitEpoch(k, "q1", 1L, Vector.empty)
    restart()
    // Replay of epoch 1 after "restart": the durable watermark swallows it.
    SnapshotStore.commitEpoch(k, "q1", 1L, Vector.empty)
    assert(SnapshotStore.stateOf(k).snapshots.size === 2)
    // A genuinely new epoch commits.
    SnapshotStore.commitEpoch(k, "q1", 2L, Vector.empty)
    assert(SnapshotStore.stateOf(k).snapshots.size === 3)
  }
}
