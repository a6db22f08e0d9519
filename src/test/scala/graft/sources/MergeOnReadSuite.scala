package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Merge-on-read row-level operations (Iceberg v2's delta mode, selected
  * by `write.delete.mode` / `write.update.mode` / `write.merge.mode` =
  * merge-on-read): DELETE/UPDATE/MERGE append position-delete files, data
  * files stay byte-identical, reads apply the deletes, and compaction
  * folds them back into purged data files.
  */
class MergeOnReadSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String, morProps: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mor")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mor.$name")
    val t = s"$cat.mor.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) TBLPROPERTIES ($morProps)")
    t
  }

  private def key(name: String) = SnapshotStore.keyOf(cat, Seq("mor", name))

  test("MOR DELETE: data files untouched, a position-delete file appears, " +
    "reads and time travel apply it") {
    val t = freshTable("d1", "'write.delete.mode'='merge-on-read'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b'), (3,'c')") // v1
    val k = key("d1")
    val v1Data = SnapshotStore.filesAt(k, 1L).map(_.path)
    spark.sql(s"DELETE FROM $t WHERE id = 2") // v2: delta commit
    // Every v1 data file survives IDENTICALLY; one delete file appears.
    assert(SnapshotStore.filesAt(k, 2L).map(_.path) === v1Data,
      "merge-on-read must not rewrite or add data files on DELETE")
    val dels = SnapshotStore.deletesAt(k, 2L)
    assert(dels.map(_.entryCount).sum === 1L, dels)
    assert(dels.forall(d => v1Data.contains(d.dataPath)))
    // Reads apply the deletes…
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(3L)))
    // …and v1 still shows the undeleted state (time travel).
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 1 ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L), Row(3L)))
    // A SECOND MOR delete must not resurrect anything.
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(spark.sql(s"SELECT id FROM $t").collect().toSeq === Seq(Row(3L)))
    // The history accounting shows the MOR shape: rows removed via delete
    // entries, zero files added or removed.
    assert(spark.sql(
      s"""SELECT added_files, removed_files, delete_entries_added
         |FROM $t.history WHERE version >= 2 ORDER BY version""".stripMargin)
      .collect().toSeq === Seq(Row(0, 0, 1L), Row(0, 0, 1L)))
  }

  test("MOR UPDATE is delete + reinsert: old file keeps its bytes, the new " +
    "row lands in a new data file") {
    val t = freshTable("u1", "'write.update.mode'='merge-on-read'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b')") // v1
    val k = key("u1")
    val v1Data = SnapshotStore.filesAt(k, 1L).map(_.path).toSet
    spark.sql(s"UPDATE $t SET v = 'B' WHERE id = 2") // v2
    val v2 = SnapshotStore.filesAt(k, 2L).map(_.path).toSet
    assert(v1Data.subsetOf(v2), "original data files must carry over")
    assert((v2 -- v1Data).nonEmpty, "the updated row needs a new data file")
    assert(SnapshotStore.deletesAt(k, 2L).map(_.entryCount).sum === 1L)
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "B")))
  }

  test("MOR MERGE: matched-update, matched-delete and not-matched-insert " +
    "in one delta commit; answers equal the COW twin's") {
    def run(mode: String, name: String): Seq[Row] = {
      val t = freshTable(name, s"'write.merge.mode'='$mode'")
      spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b'), (3,'c')")
      spark.sql(
        s"""MERGE INTO $t x USING (
           |  SELECT * FROM VALUES (CAST(2 AS BIGINT),'B'), (CAST(3 AS BIGINT),NULL),
           |    (CAST(4 AS BIGINT),'d') AS s(id, v)) s
           |ON x.id = s.id
           |WHEN MATCHED AND s.v IS NULL THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq
    }
    val mor = run("merge-on-read", "mg1")
    val cow = run("copy-on-write", "mg2")
    assert(mor === cow, s"mor=$mor cow=$cow")
    assert(mor === Seq(Row(1L, "a"), Row(2L, "B"), Row(4L, "d")))
    // The MOR run carried its original files and added delete entries.
    val k = key("mg1")
    assert(SnapshotStore.filesAt(k, 1L).map(_.path).toSet
      .subsetOf(SnapshotStore.filesAt(k, 2L).map(_.path).toSet))
    assert(SnapshotStore.deletesAt(k, 2L).map(_.entryCount).sum === 2L,
      "one deleted row + one updated row = two position-delete entries")
  }

  test("compaction folds deletes in: rewrite_data_files purges deleted " +
    "rows and sheds every delete file; expire GCs the delete files") {
    val t = freshTable("c1", "'write.delete.mode'='merge-on-read'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql(s"DELETE FROM $t WHERE id IN (2, 4)")
    val k = key("c1")
    val delPaths = SnapshotStore.stateOf(k).currentDeletes.map(_.path)
    assert(delPaths.nonEmpty)
    spark.sql(s"CALL $cat.system.rewrite_data_files('mor.c1')")
    assert(SnapshotStore.stateOf(k).currentDeletes.isEmpty,
      "compaction must shed the folded-in delete files")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(3L)))
    // History intact until expire; expire physically GCs the delete files.
    val fs = new org.apache.hadoop.fs.Path(delPaths.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(delPaths.forall(p => fs.exists(new org.apache.hadoop.fs.Path(p))))
    spark.sql(s"CALL $cat.system.expire_snapshots('mor.c1', 1)")
    assert(delPaths.forall(p => !fs.exists(new org.apache.hadoop.fs.Path(p))),
      "expire must GC delete files no live snapshot references")
  }

  test("partition-decidable DELETE still takes the metadata path on a MOR " +
    "table; the dropped file's delete files go with it") {
    val t = s"$cat.mor.p1"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mor")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'a'), (3,'b')")
    spark.sql(s"DELETE FROM $t WHERE id = 1") // MOR row delete in region a
    val k = key("p1")
    assert(SnapshotStore.stateOf(k).currentDeletes.nonEmpty)
    spark.sql(s"DELETE FROM $t WHERE region = 'a'") // metadata path
    assert(SnapshotStore.stateOf(k).currentDeletes.isEmpty,
      "delete files of dropped data files must not survive")
    assert(spark.sql(s"SELECT id FROM $t").collect().toSeq === Seq(Row(3L)))
  }

  test("rollback restores a version's delete files; the streaming source " +
    "refuses a delta commit loudly") {
    val t = freshTable("r1", "'write.delete.mode'='merge-on-read'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b')") // v1
    spark.sql(s"DELETE FROM $t WHERE id = 1")            // v2 (delta)
    spark.sql(s"INSERT INTO $t VALUES (3,'c')")          // v3
    spark.sql(s"CALL $cat.system.rollback_to_version('mor.r1', 2)") // v4
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(2L)), "rollback to v2 must keep v2's position deletes")
    // Append-only streaming over a table with a delta commit in range fails
    // loudly at the delta commit (a row removal is not appendable).
    val name = s"mor_stream_${System.nanoTime()}"
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName(name).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      try q.processAllAvailable() finally q.stop())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(String.valueOf(_)).mkString("\n")
    assert(msgs.contains("rewrite") && msgs.contains("ChangeDataFeed"), msgs)
  }

  test("partitioned MOR MERGE: inserts route into per-partition data " +
    "files, deletes stay positional, partition-pruned reads still work") {
    val t = s"$cat.mor.pm1"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mor")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b')")
    spark.sql(
      s"""MERGE INTO $t x USING (
         |  SELECT * FROM VALUES (CAST(2 AS BIGINT),'b'), (CAST(3 AS BIGINT),'c')
         |    AS s(id, region)) s
         |ON x.id = s.id
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(3L)))
    val k = key("pm1")
    // The inserted row landed in a NEW per-partition file for region c…
    val cFiles = SnapshotStore.stateOf(k).currentFiles
      .filter(_.partitionValues.map(String.valueOf(_)) == Seq("c"))
    assert(cFiles.size === 1 && cFiles.head.rowCount === 1L)
    // …the delete stayed positional (region b's file survives untouched)…
    assert(SnapshotStore.deletesAt(k, 2L).map(_.entryCount).sum === 1L)
    // …and a partition-pruned read of region b opens only b's files and
    // applies the delete.
    assert(spark.sql(s"SELECT id FROM $t WHERE region = 'b'").collect().isEmpty)
  }

  test("change-data-feed over MOR commits: full and manifest-pruned feeds " +
    "agree — a delta commit's deletions are not invisible to pruning") {
    val t = freshTable("cdf1", "'write.delete.mode'='merge-on-read'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b')") // v1
    spark.sql(s"INSERT INTO $t VALUES (3,'c')")          // v2
    spark.sql(s"DELETE FROM $t WHERE id = 2")            // v3: delta — data files unchanged
    import graft.operators.ChangeDataFeed
    val full = ChangeDataFeed
      .tableChanges(spark, t, Seq("id"), 0L, 3L).collect().toSet
    val pruned = ChangeDataFeed
      .tableChangesPruned(spark, "graft_snap", Seq("mor", "cdf1"),
        Seq("id"), 0L, 3L).collect().toSet
    assert(pruned === full, s"pruned=$pruned\nfull=$full")
    assert(full.exists(r => r.getAs[String]("_change_type") == "DELETE" &&
      r.getAs[Long]("_commit_version") == 3L),
      s"the MOR deletion must appear in the feed: $full")
  }

  test("mixed modes: a copy-on-write UPDATE over a table carrying MOR " +
    "deletes neither resurrects deleted rows nor strands delete files") {
    import spark.implicits._
    // delete mode MOR, update mode left at the copy-on-write default.
    val t = freshTable("mx1", "'write.delete.mode'='merge-on-read'")
    // Single-task appends pin the file layout: F = {1, 2}, G = {3, 4}.
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).writeTo(t).append() // v1
    Seq((3L, "c"), (4L, "d")).toDF("id", "v").coalesce(1).writeTo(t).append() // v2
    val k = key("mx1")
    val fileF = SnapshotStore.filesAt(k, 1L).map(_.path).toSet
    val fileG = SnapshotStore.filesAt(k, 2L).map(_.path).toSet -- fileF
    assert(fileF.size === 1 && fileG.size === 1)
    spark.sql(s"DELETE FROM $t WHERE id = 1") // v3: MOR delete in F
    spark.sql(s"DELETE FROM $t WHERE id = 3") // v4: MOR delete in G
    assert(SnapshotStore.deletesAt(k, 4L).map(_.dataPath).toSet === fileF ++ fileG)
    // COW UPDATE of id=2 rewrites F: the rewrite read F WITH its delete
    // applied (id=1 stays gone), F's delete file is shed with F — while G
    // carries over, its delete file still applying to id=3.
    spark.sql(s"UPDATE $t SET v = 'B' WHERE id = 2") // v5: COW rewrite of F
    val st = SnapshotStore.stateOf(k)
    assert(!st.currentFiles.map(_.path).toSet.contains(fileF.head),
      "F must be replaced by the copy-on-write rewrite")
    assert(st.currentDeletes.map(_.dataPath).toSet === fileG,
      s"exactly G's delete file may survive: ${st.currentDeletes}")
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(2L, "B"), Row(4L, "d")),
      "no resurrection of 1 or 3; 2 updated")
  }

  test("data columns named like metadata columns are rejected at CREATE " +
    "and ALTER — they would shadow the row-level machinery") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mor")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mor.resv")
    val e1 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.mor.resv (id BIGINT, _POS BIGINT)"))
    assert(e1.getMessage.contains("reserved metadata"), e1.getMessage)
    spark.sql(s"CREATE TABLE $cat.mor.resv (id BIGINT)")
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.mor.resv ADD COLUMN _file STRING"))
    assert(e2.getMessage.contains("reserved metadata"), e2.getMessage)
  }

  test("an unknown row-level mode fails loudly at plan time") {
    val t = freshTable("bad", "'write.delete.mode'='sideways'")
    spark.sql(s"INSERT INTO $t VALUES (1,'a')")
    val e = intercept[Exception](spark.sql(s"DELETE FROM $t WHERE id = 1"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(String.valueOf(_)).mkString("\n")
    assert(msgs.contains("copy-on-write or merge-on-read"), msgs)
  }
}
