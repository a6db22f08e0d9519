package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DELETION VECTORS ([[DeletionVectors]]) — Iceberg v3's position-delete
  * shape: each delta commit FOLDS a data file's delete structures into
  * one bitmap, so read amplification is bounded by data, never by how
  * many statements deleted from the file. The contract:
  *
  *   - after N merge-on-read statements a data file carries exactly ONE
  *     delete structure (`kind = "dv"`) — not N position files;
  *   - reads, the change feed (per-version deltas from CUMULATIVE
  *     vectors via the keep∖skip difference), rollback resurrection,
  *     and restarts (manifest round-trip of the supersede lineage) all
  *     stay row-exact;
  *   - a table with LEGACY per-commit position files folds them into a
  *     vector on its next delta commit — the migration is the normal
  *     write path;
  *   - the container format round-trips sparse (array) and dense
  *     (bitmap) runs, across 64 Ki container boundaries.
  */
class DeletionVectorSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dv")
    spark.sql(s"DROP TABLE IF EXISTS $cat.dv.$name")
    s"$cat.dv.$name"
  }

  private def keyOf(name: String): String =
    SnapshotStore.keyOf(cat, Seq("dv", name))

  private def structsPerFile(name: String): Map[String, Vector[String]] =
    SnapshotStore.deleteMap(SnapshotStore.stateOf(keyOf(name)).currentDeletes)

  private def survivors(t: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $t ORDER BY k").collect().map(_.getLong(0)).toSeq

  test("N delete statements leave ONE dv per data file; reads exact; " +
      "restart round-trips the vector and its lineage") {
    val t = fresh("dv1")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 2 FROM range(0, 5000)")
    val expect = scala.collection.mutable.Set.empty[Long] ++ (0L until 5000L)
    (0 until 8).foreach { i =>
      spark.sql(s"DELETE FROM $t WHERE k % 17 = $i")
      expect --= (0L until 5000L).filter(_ % 17 == i)
    }
    val structs = structsPerFile("dv1")
    assert(structs.nonEmpty)
    structs.foreach { case (dp, paths) =>
      assert(paths.length === 1,
        s"after 8 delete statements $dp must carry ONE structure, got $paths")
      assert(paths.head.endsWith(".grfdv"))
    }
    val dvs = SnapshotStore.stateOf(keyOf("dv1")).currentDeletes
    assert(dvs.forall(_.kind == "dv"))
    assert(dvs.map(_.entryCount).sum === (5000 - expect.size).toLong,
      "dv cardinalities must sum to the total dead rows")
    assert(survivors(t) === expect.toSeq.sorted)

    // Restart: vectors + supersede lineage reload from the manifest.
    SnapshotStore.tables.clear()
    assert(survivors(t) === expect.toSeq.sorted)
    spark.sql(s"DELETE FROM $t WHERE k % 17 = 8")
    expect --= (0L until 5000L).filter(_ % 17 == 8)
    assert(survivors(t) === expect.toSeq.sorted)
    structsPerFile("dv1").foreach { case (_, paths) =>
      assert(paths.length === 1)
    }
  }

  test("the change feed reports per-version DELTAS from cumulative " +
      "vectors (keep minus superseded), and rollback resurrects exactly " +
      "the newer vector's extra positions") {
    val t = fresh("dv2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 1000)") // v1
    spark.sql(s"DELETE FROM $t WHERE k < 100")                     // v2
    spark.sql(s"DELETE FROM $t WHERE k >= 100 AND k < 150")        // v3
    def changed(v: Long): Seq[(String, Long)] =
      spark.read.option("startingVersion", v.toString)
        .option("endingVersion", v.toString).table(s"$t.changes")
        .select("_change_type", "k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    assert(changed(2L) === (0L until 100L).map(("DELETE", _)),
      "v2's delta: the first statement's positions")
    assert(changed(3L) === (100L until 150L).map(("DELETE", _)),
      "v3's delta: ONLY the second statement's positions — the cumulative " +
        "vector must not re-report v2's deaths")
    // Rollback to v2: the feed's v4 reports the v3-only deaths as
    // INSERT resurrections, and reads serve the v2 state.
    spark.sql(s"CALL $cat.system.rollback_to_version(table => 'dv.dv2', " +
      "version => 2)").collect()
    assert(changed(4L) === (100L until 150L).map(("INSERT", _)),
      "rolling back across a dv generation resurrects its extra positions")
    assert(survivors(t) === (100L until 1000L).toSeq)
  }

  test("a table with LEGACY per-commit position files folds them into " +
      "one vector on its next delta commit (the migration path)") {
    val t = fresh("dv3")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 1000)")
    val k = keyOf("dv3")
    // Hand-commit two legacy position-delete files against the first data
    // file (what a pre-DV engine version left behind).
    val conf = RowFiles.sessionConf().value
    val st0 = SnapshotStore.stateOf(k)
    val dataPath = st0.currentFiles.head.path
    val dir = st0.dataDir
    Seq(Array(3L, 5L), Array(7L, 11L)).zipWithIndex.foreach { case (poss, i) =>
      val p = s"$dir/legacy-del$i.grfd"
      RowFiles.writeDeletes(p, poss, conf)
      SnapshotStore.update(k) { st =>
        st.copy(snapshots = st.snapshots :+ st.snapshots.last.copy(
          version = st.nextVersion,
          commitMicros = SnapshotStore.nowMicros(),
          deleteFiles = st.currentDeletes :+
            SnapshotStore.DeleteFile(p, dataPath, poss.length.toLong,
              seq = st.nextVersion),
          operation = "delta", appendedFiles = -1,
          manifestPath = null))
      }
    }
    assert(structsPerFile("dv3")(dataPath).length === 2, "legacy layout")
    val beforeRows = survivors(t)
    assert(beforeRows.length === 996)
    // The next MOR statement folds legacy files + its own deletes.
    spark.sql(s"DELETE FROM $t WHERE k = 13")
    val after = structsPerFile("dv3")(dataPath)
    assert(after.length === 1 && after.head.endsWith(".grfdv"),
      s"the delta commit must fold legacy position files, got $after")
    assert(survivors(t) === beforeRows.filterNot(_ == 13L))
    val dv = SnapshotStore.stateOf(k).currentDeletes.find(_.kind == "dv").get
    assert(dv.supersedes.toSet.map((p: String) => p.split('/').last) ===
      Set("legacy-del0.grfd", "legacy-del1.grfd"))
    // And the fold commit's change feed reports ONLY k = 13.
    val feed = spark.read.option("startingVersion",
        SnapshotStore.stateOf(k).snapshots.last.version.toString)
      .table(s"$t.changes").select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(feed === Seq(("DELETE", 13L)))
  }

  test("a WIDE merge-on-read statement folds vectors as a Spark job — " +
      "no O(touched files) driver I/O loop (the GDPR-delete shape)") {
    val t = fresh("dv4")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    // 24 data files — past DistributeThreshold, so the fold must leave
    // the driver-loop counter untouched.
    spark.sql(
      s"INSERT INTO $t SELECT /*+ REPARTITION(24) */ id, id FROM range(0, 4800)")
    val files = SnapshotStore.stateOf(keyOf("dv4")).currentFiles.size
    assert(files > DeletionVectors.DistributeThreshold,
      s"fixture must exceed the distribution threshold, got $files files")
    val before = DeletionVectors.driverFoldFiles.get()
    spark.sql(s"DELETE FROM $t WHERE k % 3 = 0") // scattered: every file
    assert(DeletionVectors.driverFoldFiles.get() === before,
      "a wide fold must run as a Spark job, not a driver loop")
    structsPerFile("dv4").foreach { case (dp, paths) =>
      assert(paths.length === 1 && paths.head.endsWith(".grfdv"),
        s"distributed fold must leave ONE dv on $dp, got $paths")
    }
    assert(survivors(t) === (0L until 4800L).filterNot(_ % 3 == 0))
    // A second wide statement folds the prior vectors task-side too.
    spark.sql(s"DELETE FROM $t WHERE k % 3 = 1")
    assert(DeletionVectors.driverFoldFiles.get() === before)
    structsPerFile("dv4").foreach { case (_, paths) =>
      assert(paths.length === 1)
    }
    assert(survivors(t) === (0L until 4800L).filter(_ % 3 == 2))
    // Narrow commits keep the driver loop (no job latency on a 3-file
    // MERGE): dv1/dv3 above exercise it; pin the counter moves for one.
    val t2 = fresh("dv4narrow")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t2 SELECT /*+ REPARTITION(2) */ id, id FROM range(0, 100)")
    val b2 = DeletionVectors.driverFoldFiles.get()
    spark.sql(s"DELETE FROM $t2 WHERE k % 5 = 0")
    assert(DeletionVectors.driverFoldFiles.get() > b2,
      "a narrow fold stays on the driver")
  }

  test("container format round-trips sparse and dense runs across 64Ki " +
      "boundaries") {
    val conf = RowFiles.sessionConf().value
    val dir = java.nio.file.Files.createTempDirectory("graft-dv").toString
    def roundTrip(name: String, positions: Array[Long]): Unit = {
      val p = s"$dir/$name.grfdv"
      DeletionVectors.write(p, positions, conf)
      assert(RowFiles.readDeletes(p, conf).toSeq === positions.toSeq,
        s"round-trip of $name")
    }
    roundTrip("empty", Array.empty[Long])
    roundTrip("sparse", Array(0L, 1L, 65535L, 65536L, 131071L, 1L << 40))
    // Dense: one full container (forces the bitmap encoding) plus spill.
    roundTrip("dense", ((0L until 65536L) ++ Seq(65536L + 7L)).toArray)
    // Mixed: a >4096 dense run in container 1, sparse elsewhere.
    roundTrip("mixed",
      (Seq(5L) ++ (65536L until 65536L + 5000L) ++ Seq(1L << 33)).toArray)
  }
}
