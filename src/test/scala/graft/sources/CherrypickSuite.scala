package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `CALL cat.system.cherrypick_snapshot(table, snapshot)` — re-apply a
  * commit's FILE DELTA onto the current head as a fresh commit with OCC
  * conflict detection, closing the two dead ends the strict publish
  * paths leave:
  *
  *   - a staged BRANCH whose fork base moved (fast_forward refuses —
  *     round 11's documented conflict) publishes via replay when its
  *     deltas are disjoint from what main did since;
  *   - a commit orphaned by `rollback_to_version` re-applies by version.
  *
  * Overlapping file ops (the head rewrote/dropped a file the delta also
  * touches) are LOUD, never merged. */
class CherrypickSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cp")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cp.$name")
    val t = s"$cat.cp.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    t
  }

  test("the moved-main WAP dead end: a staged branch publishes onto an " +
      "advanced main via cherry-pick when the deltas are disjoint") {
    val t = freshTable("wap")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1, fork base
    spark.sql(s"CALL $cat.system.create_branch('cp.wap', 'stage')")
    spark.sql(s"INSERT INTO $t.branch_stage VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t.branch_stage VALUES (3, 'c')")
    spark.sql(s"INSERT INTO $t VALUES (9, 'z')") // main moves → v2
    // fast_forward refuses (the round-11 contract) and now names the way out.
    val ff = intercept[Exception](spark.sql(
      s"CALL $cat.system.fast_forward('cp.wap', 'stage')").collect())
    assert(ff.getMessage.contains("cherrypick_snapshot"), ff.getMessage)
    // Cherry-pick replays both staged commits onto the moved head.
    assert(spark.sql(s"CALL $cat.system.cherrypick_snapshot('cp.wap', 'stage')")
      .collect().head.getLong(0) === 4L)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L), Row(3L), Row(9L)))
    // The ref dropped like a publish; the replayed commits are ordinary
    // append history (appendedFiles suffix intact → the change feed and
    // an append-only stream can deliver them).
    assert(spark.sql(s"SELECT count(*) FROM $t.refs").collect()
      .head.getLong(0) === 0L)
    assert(spark.sql(s"SELECT operation FROM $t.history ORDER BY version")
      .collect().map(_.getString(0)).toSeq ===
      Seq("append", "append", "append", "append"))
    val changes = spark.read.option("startingVersion", "3")
      .option("endingVersion", "4").table(s"$t.changes")
    assert(changes.select("id").collect().map(_.getLong(0)).toSeq.sorted ===
      Seq(2L, 3L))
    // Time travel: v3 holds main's head + the FIRST staged commit only.
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 3 ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(2L), Row(9L)))
  }

  test("a commit orphaned by rollback re-applies by version — the delta, " +
      "not the full file list") {
    val t = freshTable("redo")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')") // v2
    spark.sql(s"UPDATE $t SET v = 'X' WHERE id = 3") // v3: COW rewrite
    spark.sql(s"CALL $cat.system.rollback_to_version('cp.redo', 2)") // v4
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 3").collect().toSeq ===
      Seq(Row("c")), "fixture: the rollback undid the update")
    // Re-apply v3's delta (swap v2's file for the rewritten one).
    assert(spark.sql(s"CALL $cat.system.cherrypick_snapshot('cp.redo', '3')")
      .collect().head.getLong(0) === 5L)
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "X")))
  }

  test("overlapping file ops are a loud conflict: the head compacted away " +
      "a file the delta rewrites; nothing is committed") {
    val t = freshTable("clash")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    spark.sql(s"UPDATE $t SET v = 'X' WHERE id = 3") // v3 rewrites v2's file
    spark.sql(s"CALL $cat.system.rollback_to_version('cp.clash', 2)") // v4
    // Compaction rewrites EVERY live file → v3's removed input is gone.
    spark.sql(s"CALL $cat.system.rewrite_data_files('cp.clash')") // v5
    val before = spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.cherrypick_snapshot('cp.clash', '3')").collect())
    assert(e.getMessage.contains("no longer references"), e.getMessage)
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      before, "a refused cherry-pick must commit nothing")
    assert(spark.sql(s"SELECT max(version) FROM $t.history").collect()
      .head.getLong(0) === 5L)
  }

  test("unknown refs and expired-predecessor versions fail loudly") {
    val t = freshTable("bad")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    val e1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.cherrypick_snapshot('cp.bad', 'nope')").collect())
    assert(e1.getMessage.contains("neither a branch"), e1.getMessage)
    // Expire v1-v2: v3's delta vs its true predecessor is unreconstructable.
    spark.sql(s"CALL $cat.system.expire_snapshots('cp.bad', 1)")
    val e2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.cherrypick_snapshot('cp.bad', '3')").collect())
    assert(e2.getMessage.contains("predecessor"), e2.getMessage)
  }
}
