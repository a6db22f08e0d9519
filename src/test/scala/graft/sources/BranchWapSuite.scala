package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Branches + write-audit-publish (Iceberg's branch refs / `fast_forward`):
  * appends stage on a named fork, invisible to the table's readers, audit
  * queries read the branch head, and publishing splices the staged commits
  * onto the main log atomically — or fails loudly if main moved.
  */
class BranchWapSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wap")
    spark.sql(s"DROP TABLE IF EXISTS $cat.wap.$name")
    val t = s"$cat.wap.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    t
  }

  test("the full WAP loop: stage on a branch, audit, fast-forward publishes") {
    val t = freshTable("loop")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1 on main
    spark.sql(s"CALL $cat.system.create_branch('wap.loop', 'audit')")
    // WRITE: two staged commits on the branch.
    spark.sql(s"INSERT INTO $t.branch_audit VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t.branch_audit VALUES (3, 'c')")
    // Main is untouched — the whole point of staging.
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 1L)
    // AUDIT: both branch surfaces serve base + staged rows.
    assert(spark.sql(s"SELECT id FROM $t.branch_audit ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L), Row(3L)))
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 'audit' ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L), Row(3L)))
    // refs metadata shows the staged branch.
    assert(spark.sql(s"SELECT name, type, version, staged_commits FROM $t.refs")
      .collect().toSeq === Seq(Row("audit", "branch", 1L, 2L)))
    // PUBLISH: the staged commits become real main versions.
    assert(spark.sql(s"CALL $cat.system.fast_forward('wap.loop', 'audit')")
      .collect().head.getLong(0) === 3L)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L), Row(3L)))
    // ... time-travelable as ordinary history, branch ref gone.
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 2 ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L)))
    assert(spark.sql(s"SELECT operation FROM $t.history ORDER BY version")
      .collect().toSeq.map(_.getString(0)) === Seq("append", "append", "append"))
    assert(spark.sql(s"SELECT count(*) FROM $t.refs").collect().head.getLong(0) === 0L)
  }

  test("fast-forward onto a moved main is a loud conflict, never an interleave") {
    val t = freshTable("conflict")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"CALL $cat.system.create_branch('wap.conflict', 'stage')")
    spark.sql(s"INSERT INTO $t.branch_stage VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (9, 'z')") // main moves past the fork
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.fast_forward('wap.conflict', 'stage')").collect())
    assert(e.getMessage.contains("forked at v1") &&
      e.getMessage.contains("now at v2"), e.getMessage)
    // Nothing published, branch still intact for inspection.
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(9L)))
    assert(spark.sql(s"SELECT staged_commits FROM $t.refs WHERE name = 'stage'")
      .collect().head.getLong(0) === 1L)
  }

  test("drop_branch discards staged rows and GCs only branch-local files") {
    val t = freshTable("drop")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"CALL $cat.system.create_branch('wap.drop', 'tmp')")
    spark.sql(s"INSERT INTO $t.branch_tmp VALUES (2, 'b')")
    assert(spark.sql(s"CALL $cat.system.drop_branch('wap.drop', 'tmp')")
      .collect().head.getBoolean(0) === true)
    // Main still reads its base file (not GC'd with the branch).
    assert(spark.sql(s"SELECT id FROM $t").collect().toSeq === Seq(Row(1L)))
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t.branch_tmp").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be found"), e.getMessage)
    // Dropping again reports absence, loudly false not an error.
    assert(spark.sql(s"CALL $cat.system.drop_branch('wap.drop', 'tmp')")
      .collect().head.getBoolean(0) === false)
  }

  test("a branch forked past a merge-on-read commit reads its base exactly") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wap")
    spark.sql(s"DROP TABLE IF EXISTS $cat.wap.morbase")
    val t = s"$cat.wap.morbase"
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v STRING) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read')""")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"DELETE FROM $t WHERE id = 1") // position delete at the base
    spark.sql(s"CALL $cat.system.create_branch('wap.morbase', 'b1')")
    spark.sql(s"INSERT INTO $t.branch_b1 VALUES (3, 'c')")
    // The deleted base row must NOT resurface through the branch read.
    assert(spark.sql(s"SELECT id FROM $t.branch_b1 ORDER BY id")
      .collect().toSeq === Seq(Row(2L), Row(3L)))
  }

  test("branch writes are append-only: overwrite and row-level statements refuse") {
    val t = freshTable("appendonly")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"CALL $cat.system.create_branch('wap.appendonly', 'ro')")
    val e1 = intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $t.branch_ro VALUES (2, 'b')"))
    assert(e1.getMessage.toLowerCase.contains("truncate") ||
      e1.getMessage.toLowerCase.contains("overwrite"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"DELETE FROM $t.branch_ro WHERE id = 1"))
    assert(e2.getMessage.toLowerCase.contains("delete") ||
      e2.getMessage.toLowerCase.contains("support"), e2.getMessage)
  }

  test("expire never drops a live branch's base snapshot") {
    val t = freshTable("shield")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1
    spark.sql(s"CALL $cat.system.create_branch('wap.shield', 'keepme')") // base v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')") // v2
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')") // v3
    spark.sql(s"CALL $cat.system.expire_snapshots('wap.shield', 1)")
    // v1 survives (branch base); v2 expired.
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 1").collect().toSeq ===
      Seq(Row(1L)))
    intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 2").collect())
    // The branch remains readable and publishable is still guarded (main
    // moved → conflict), so its state is coherent after expiry.
    assert(spark.sql(s"SELECT id FROM $t.branch_keepme").collect().toSeq ===
      Seq(Row(1L)))
  }

  test("tags and branches share the VERSION AS OF namespace — collisions refuse") {
    val t = freshTable("names")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"CALL $cat.system.create_tag('wap.names', 'r1', 1)")
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.create_branch('wap.names', 'r1')").collect())
    assert(e.getMessage.contains("already a tag"), e.getMessage)
    spark.sql(s"CALL $cat.system.create_branch('wap.names', 'b1')")
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.create_tag('wap.names', 'b1', 1)").collect())
    assert(e2.getMessage.contains("already a branch"), e2.getMessage)
    // Numeric branch names would shadow version numbers — refused.
    val e3 = intercept[Exception](
      spark.sql(s"CALL $cat.system.create_branch('wap.names', '7')").collect())
    assert(e3.getMessage.contains("ambiguous"), e3.getMessage)
  }

  test("publish is exactly append: a stream tailing main delivers staged rows " +
    "at fast-forward, per staged commit") {
    val t = freshTable("tail")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val name = s"wap_tail_${System.nanoTime()}"
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 1L)
      spark.sql(s"CALL $cat.system.create_branch('wap.tail', 'stage')")
      spark.sql(s"INSERT INTO $t.branch_stage VALUES (2, 'b')")
      spark.sql(s"INSERT INTO $t.branch_stage VALUES (3, 'c')")
      q.processAllAvailable()
      // Staged commits are invisible to the stream...
      assert(spark.table(name).count() === 1L)
      spark.sql(s"CALL $cat.system.fast_forward('wap.tail', 'stage')")
      q.processAllAvailable()
      // ...and arrive as ordinary appends at publish, nothing doubled.
      assert(spark.table(name).orderBy("id").collect().toSeq ===
        Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    } finally q.stop()
  }

  test("a real table named like a branch suffix outranks the fallback") {
    val t = freshTable("shadow")
    // The REAL table exists first (CREATE TABLE itself resolves the
    // identifier, so a live branch fallback would block creation).
    spark.sql(s"DROP TABLE IF EXISTS $t.branch_x")
    spark.sql(s"CREATE TABLE $t.branch_x (note STRING)")
    spark.sql(s"CALL $cat.system.create_branch('wap.shadow', 'x')")
    spark.sql(s"INSERT INTO $cat.wap.shadow.branch_x VALUES ('real table')")
    assert(spark.sql(s"SELECT note FROM $t.branch_x").collect().toSeq ===
      Seq(Row("real table")))
    spark.sql(s"DROP TABLE $t.branch_x")
    // With the shadow gone the suffix serves the branch again.
    assert(spark.sql(s"SELECT count(*) FROM $t.branch_x")
      .collect().head.getLong(0) === 0L)
  }
}
