package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** EQUALITY-DELETE files (Iceberg v2's second merge-on-read flavor) and the
  * streaming upsert sink built on them: a batch commits delete-by-key +
  * append in ONE snapshot WITHOUT reading the target — the delete applies
  * to data files with a lower sequence number, so the batch's own rows are
  * immune and every older row with a matching key dies at read time. */
class EqualityDeleteSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.eqd")
    spark.sql(s"DROP TABLE IF EXISTS $cat.eqd.$name")
    s"$cat.eqd.$name"
  }
  private def keyOf(name: String) = SnapshotStore.keyOf(cat, Seq("eqd", name))

  private def batchDf(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "name", "score")
  }

  test("upsertBatch = MERGE semantics at append cost: no target file is " +
      "read or rewritten, older keys die, batch rows win") {
    val t = fresh("ups")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    val v1Files = SnapshotStore.stateOf(keyOf("ups")).currentFiles.map(_.path).toSet
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0), (4L, "d", 4.0)), Seq("id"))
    val st = SnapshotStore.stateOf(keyOf("ups"))
    // Every v1 data file is still live — nothing was rewritten.
    assert(v1Files.subsetOf(st.currentFiles.map(_.path).toSet))
    val eqs = SnapshotStore.eqDeletes(st.currentDeletes)
    assert(eqs.nonEmpty && eqs.forall(_.seq == 2L), eqs.toString)
    assert(spark.sql(s"SELECT id, name, score FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a", 1.0), Row(2L, "B", 20.0), Row(3L, "c", 3.0), Row(4L, "d", 4.0)))
    // Time travel to v1 is untouched by the later delete (seq ordering).
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1")
      .collect().head.getLong(0) === 3L)
  }

  test("chained upserts: each batch's delete applies to everything older, " +
      "never to its own rows") {
    val t = fresh("chain")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id"))
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A", 10.0), (3L, "c", 3.0)), Seq("id"))
    SnapshotUpsert.upsertBatch(t, batchDf((3L, "C", 30.0)), Seq("id"))
    assert(spark.sql(s"SELECT id, name, score FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "A", 10.0), Row(2L, "b", 2.0), Row(3L, "C", 30.0)))
  }

  test("mixed position + equality deletes compose; compaction folds BOTH " +
      "and further history stays healthy") {
    val t = fresh("mixed")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0)), Seq("id"))
    spark.sql(s"DELETE FROM $t WHERE id = 3") // positional MOR delete
    assert(spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B")))
    val preCompact = SnapshotStore.stateOf(keyOf("mixed")).currentDeletes
    // Positional MOR deletes land as deletion vectors since round 16.
    assert(preCompact.exists(_.kind == "eq") && preCompact.exists(_.kind == "dv"))
    spark.sql(s"CALL $cat.system.rewrite_data_files('eqd.mixed')")
    val st = SnapshotStore.stateOf(keyOf("mixed"))
    assert(st.currentDeletes.isEmpty, "compaction must fold both delete kinds")
    assert(spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B")))
    // Post-compaction upserts keep working (fresh seqs beat folded files).
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A2", 100.0)), Seq("id"))
    assert(spark.sql(s"SELECT name FROM $t WHERE id = 1").collect().toSeq ===
      Seq(Row("A2")))
  }

  test("a COW UPDATE over a table with live equality deletes does not " +
      "resurrect deleted rows") {
    val t = fresh("cow")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0)), Seq("id"))
    spark.sql(s"UPDATE $t SET score = score + 0.5 WHERE id <= 2")
    assert(spark.sql(s"SELECT id, name, score FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a", 1.5), Row(2L, "B", 20.5)))
  }

  test("equality deletes survive the metadata log (restart) with kind, key " +
      "ids, and seq intact") {
    val t = fresh("dur")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A", 10.0)), Seq("id"))
    val before = SnapshotStore.eqDeletes(
      SnapshotStore.stateOf(keyOf("dur")).currentDeletes)
    SnapshotStore.tables.clear()
    val after = SnapshotStore.eqDeletes(
      SnapshotStore.stateOf(keyOf("dur")).currentDeletes)
    assert(after === before)
    assert(spark.sql(s"SELECT name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row("A"), Row("b")))
  }

  test("upserts stay correct across a key-column RENAME (field ids, not names)") {
    val t = fresh("ren")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id"))
    spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO pk")
    import spark.implicits._
    val b2 = Seq((2L, "B", 20.0)).toDF("pk", "name", "score")
    SnapshotUpsert.upsertBatch(t, b2, Seq("pk"))
    assert(spark.sql(s"SELECT pk, name FROM $t ORDER BY pk").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B")))
  }

  test("the change feed serves equality-delete commits EXACTLY: DELETE rows " +
      "reconstructed by probing older files with the commit's keys, minus " +
      "rows already dead") {
    val t = fresh("cdf")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)") // v1
    spark.sql(s"DELETE FROM $t WHERE id = 3") // v2: position delete
    SnapshotUpsert.upsertBatch(t,
      batchDf((1L, "A", 10.0), (3L, "c2", 30.0), (4L, "d", 4.0)), Seq("id")) // v3
    val feed = spark.read.option("startingVersion", 1).option("endingVersion", 3)
      .table(s"$t.changes")
      .selectExpr("id", "name", "_change_type", "_commit_version")
      .orderBy("_commit_version", "id", "_change_type").collect().toSeq
    assert(feed === Seq(
      Row(1L, "a", "INSERT", 1L), Row(2L, "b", "INSERT", 1L),
      Row(3L, "c", "INSERT", 1L),
      Row(3L, "c", "DELETE", 2L), // the positional delete
      // v3: the upsert — old id=1 dies by key (id=3 was ALREADY dead, so it
      // must NOT be re-reported), the three batch rows insert.
      Row(1L, "a", "DELETE", 3L),
      Row(1L, "A", "INSERT", 3L), Row(3L, "c2", "INSERT", 3L),
      Row(4L, "d", "INSERT", 3L)))
    // Folding the feed reproduces the table state (net-changes sanity;
    // id=2 was not in the upsert batch, so it stays alive).
    val live = spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq
    assert(live === Seq(Row(1L, "A"), Row(2L, "b"), Row(3L, "c2"), Row(4L, "d")))
  }

  test("chained upserts in the feed: each commit's eq-DELETE excludes rows " +
      "killed by EARLIER eq deletes") {
    val t = fresh("cdfchain")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id")) // v1
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A", 10.0)), Seq("id"))                // v2
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A2", 100.0), (2L, "B", 20.0)), Seq("id")) // v3
    val feed = spark.read.option("startingVersion", 2).option("endingVersion", 3)
      .table(s"$t.changes")
      .selectExpr("id", "name", "_change_type", "_commit_version")
      .orderBy("_commit_version", "id", "_change_type", "name").collect().toSeq
    assert(feed === Seq(
      Row(1L, "a", "DELETE", 2L), Row(1L, "A", "INSERT", 2L),
      // v3 kills v2's id=1 (NOT v1's — already dead) and v1's id=2.
      Row(1L, "A", "DELETE", 3L), Row(1L, "A2", "INSERT", 3L),
      Row(2L, "b", "DELETE", 3L), Row(2L, "B", "INSERT", 3L)))
  }

  test("DROP COLUMN of a live equality-delete KEY column is refused (older " +
      "files would become unreadable); compaction folds the deletes and " +
      "re-opens the drop") {
    val t = fresh("dropkey")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0)), Seq("id"))
    val e = intercept[Exception](spark.sql(s"ALTER TABLE $t DROP COLUMN id"))
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    // Non-key columns still drop fine.
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B")))
    // Folding the deletes makes the key column droppable.
    spark.sql(s"CALL $cat.system.rewrite_data_files('eqd.dropkey')")
    spark.sql(s"ALTER TABLE $t DROP COLUMN id")
    assert(spark.sql(s"SELECT name FROM $t ORDER BY name").collect().toSeq ===
      Seq(Row("B"), Row("a")))
  }

  test(".files labels the two delete flavors distinctly") {
    val t = fresh("label")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0)), Seq("id"))
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    val byContent = spark.sql(
      s"SELECT content, count(*) FROM $t.files GROUP BY content ORDER BY content")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byContent.exists(_._1 == "equality-deletes"), byContent.toString)
    assert(byContent.exists(_._1 == "position-deletes"), byContent.toString)
  }

  test("rollback dropping BOTH a position delete and a matching equality " +
      "delete restores the row exactly ONCE in the feed") {
    val t = fresh("rb")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)") // v1
    spark.sql(s"DELETE FROM $t WHERE id = 1")                        // v2 (pos)
    SnapshotUpsert.upsertBatch(t, batchDf((1L, "A", 10.0)), Seq("id")) // v3 (eq + append)
    spark.sql(s"CALL $cat.system.rollback_to_version('eqd.rb', 1)")  // v4
    val feed = spark.read.option("startingVersion", 4).option("endingVersion", 4)
      .table(s"$t.changes")
      .selectExpr("id", "name", "_change_type")
      .orderBy("_change_type", "id", "name").collect().toSeq
    // v3's appended row dies with its file; the old (1,'a') resurrects
    // EXACTLY once (positional restore owns it; the dropped eq delete's
    // restore path must not duplicate it).
    assert(feed === Seq(Row(1L, "A", "DELETE"), Row(1L, "a", "INSERT")))
    assert(spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("the manifest-PRUNED operator feed detects equality-delete commits " +
      "(file-spanning deletes mark every applicable older file touched) and " +
      "matches the full key-joined feed") {
    val t = fresh("pruned")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)") // v1
    SnapshotUpsert.upsertBatch(t, batchDf((2L, "B", 20.0), (3L, "c", 3.0)), Seq("id")) // v2
    import graft.operators.ChangeDataFeed
    val full = ChangeDataFeed.tableChanges(spark, t, Seq("id"), 1L, 2L)
      .orderBy("_commit_version", "id", "_change_type").collect().toSeq
    val pruned = ChangeDataFeed.tableChangesPruned(spark, cat,
      Seq("eqd", "pruned"), Seq("id"), 1L, 2L)
      .orderBy("_commit_version", "id", "_change_type").collect().toSeq
    assert(pruned === full)
    // The upsert's key-death is in the feed (id=2 old image died at v2).
    assert(pruned.exists(r =>
      r.getAs[String]("_change_type") == "UPDATE" ||
        r.getAs[String]("_change_type") == "DELETE"), pruned.mkString("\n"))
  }

  test("duplicate keys in one batch are refused (no well-defined winner)") {
    val t = fresh("dup")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    val e = intercept[Exception](SnapshotUpsert.upsertBatch(
      t, batchDf((1L, "a", 1.0), (1L, "b", 2.0)), Seq("id")))
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
    assert(SnapshotStore.stateOf(keyOf("dup")).snapshots.isEmpty)
  }

  test("streaming upsert sink: foreachBatch upserter is exactly-once per " +
      "epoch and end-to-end MERGE-correct") {
    val t = fresh("stream")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("id", "name", "score").writeStream
      .foreachBatch(SnapshotUpsert.upserter(t, Seq("id"), sinkId = "eqd-stream"))
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/eqd-stream-ckpt-${System.nanoTime()}")
      .start()
    try {
      in.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      in.addData((2L, "B", 20.0), (3L, "c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql(s"SELECT id, name FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B"), Row(3L, "c")))
    // A replayed epoch no-ops: same sink id, already-watermarked epoch.
    SnapshotUpsert.upsertBatch(t, batchDf((9L, "ghost", 9.0)),
      Seq("id"), sinkId = "eqd-stream", epochId = 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id = 9")
      .collect().head.getLong(0) === 0L)
  }

  test("KEY-RANGE stats prune probing: a narrow upsert's delete attaches " +
      "to 1 of N disjoint files on the read path AND in the feed") {
    val t = fresh("prune")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    // Three files with DISJOINT id ranges (separate commits → one file each
    // per value run; 1 row per insert keeps it one file).
    spark.sql(s"INSERT INTO $t VALUES (1, 'lo', 1.0), (9, 'lo', 1.5)")
    spark.sql(s"INSERT INTO $t VALUES (100, 'mid', 2.0), (190, 'mid', 2.5)")
    spark.sql(s"INSERT INTO $t VALUES (1000, 'hi', 3.0), (1900, 'hi', 3.5)")
    val preFiles = SnapshotStore.stateOf(keyOf("prune")).currentFiles.size
    // Single-row files (parallel insert tasks) — the upsert key overlaps
    // exactly the file holding id=100.
    SnapshotUpsert.upsertBatch(t, batchDf((100L, "MID", 20.0)), Seq("id"))
    val st = SnapshotStore.stateOf(keyOf("prune"))
    val eq = SnapshotStore.eqDeletes(st.currentDeletes)
    assert(eq.size === 1 && eq.head.stats.nonEmpty,
      s"upsert must record key bounds: $eq")
    // Read path: only files whose id range covers 150 carry the probe.
    val parts = ScanSplits.partitions(st.currentFiles,
      SnapshotStore.deleteMap(st.currentDeletes), Long.MaxValue, eq,
      SnapshotStore.idTypes(st.schema))
    val probed = parts.collect {
      case p: MemFilePartition if p.eqDeletePaths.nonEmpty => p.path }
    assert(probed.length === 1,
      s"expected 1 of $preFiles older files probed, got ${probed.length}")
    // Feed reconstruction: the upsert commit's DELETE rows are rebuilt by
    // probing ONLY that file too.
    val sn = st.snapshots.last
    val delParts = ChangeLog.changePartitions(st, sn, t)
      .filter(p => p.changeType == "DELETE")
    assert(delParts.map(_.path).distinct === probed.toSeq,
      s"feed must probe exactly the overlapping file: $delParts")
    // And the answers stay exact.
    assert(spark.sql(s"SELECT name FROM $t WHERE id = 100").collect()
      .map(_.getString(0)).toSeq === Seq("MID"))
    val changes = spark.read.option("startingVersion", sn.version)
      .option("endingVersion", sn.version).table(s"$t.changes")
      .selectExpr("id", "_change_type").orderBy("id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(changes === Seq((100L, "DELETE"), (100L, "INSERT")))
    // Pruning survives the metadata log (stats round-trip).
    SnapshotStore.tables.clear()
    val st2 = SnapshotStore.stateOf(keyOf("prune"))
    val eq2 = SnapshotStore.eqDeletes(st2.currentDeletes)
    assert(eq2.head.stats.nonEmpty, "delete-file stats must survive restart")
    val parts2 = ScanSplits.partitions(st2.currentFiles,
      SnapshotStore.deleteMap(st2.currentDeletes), Long.MaxValue, eq2,
      SnapshotStore.idTypes(st2.schema))
    assert(parts2.collect {
      case p: MemFilePartition if p.eqDeletePaths.nonEmpty => p.path
    }.length === 1)
  }
}
