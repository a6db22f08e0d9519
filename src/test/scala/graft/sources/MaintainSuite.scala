package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `CALL cat.system.maintain(t)` — policy-driven maintenance from the
  * table's OWN properties: age-based snapshot expiry
  * (`history.expire.max-snapshot-age-ms` / `min-snapshots-to-keep`, tags
  * and branch bases shielded) and compaction triggers
  * (`maintain.compact.min-delete-files` / `min-files`). Pins the policy
  * bounds on a long synthetic history, threshold hysteresis (below the
  * bound nothing moves), answer invariance, and the time-travel guards
  * staying loud over the expired range. */
class MaintainSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.maint")
    spark.sql(s"DROP TABLE IF EXISTS $cat.maint.$name")
    s"$cat.maint.$name"
  }

  private def state(name: String) =
    SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("maint", name)))

  test("age-based expiry trims a long history to the policy bounds; " +
      "tags survive; time travel into the gap stays loud") {
    val t = fresh("hist")
    spark.sql(s"""CREATE TABLE $t (id BIGINT)
      TBLPROPERTIES ('history.expire.max-snapshot-age-ms'='1',
                     'history.expire.min-snapshots-to-keep'='3')""")
    (0 until 10).foreach(i =>
      spark.range(i * 10, (i + 1) * 10).writeTo(t).append())
    spark.sql(s"CALL $cat.system.create_tag('maint.hist', 'keepme', 2)")
    Thread.sleep(20) // every commit is now older than the 1 ms policy age
    val r = spark.sql(s"CALL $cat.system.maintain('maint.hist')").head()
    // 10 snapshots; age drops all, the min-keep floor holds the newest 3,
    // the tag holds v2 → 6 expired.
    assert(r.getInt(0) === 6, s"expected 6 expired, got ${r.getInt(0)}")
    val versions = state("hist").snapshots.map(_.version)
    assert(versions === Vector(2L, 8L, 9L, 10L))
    // Live data unaffected.
    assert(spark.table(t).count() === 100)
    // Tagged version still reads; the expired interior stays loud.
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'keepme'")
      .head().getLong(0) === 20)
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 5").collect()
    }
    assert(e.getMessage.contains("5"))
  }

  test("delete-file threshold: below the bound nothing moves, at the " +
      "bound merge-on-read deletes fold away, answers identical") {
    val t = fresh("mor")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                     'maintain.compact.min-delete-files'='3')""")
    // Since round 16 each data file carries at most ONE delete structure
    // (a deletion vector, merge-on-write) no matter how many statements
    // deleted from it — so the threshold counts STRUCTURES, i.e. how many
    // data files carry deletes. Three data files, deleted from one by one.
    spark.range(0, 1000).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(t).append()
    spark.range(1000, 2000).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(t).append()
    spark.range(2000, 3000).selectExpr("id", "id AS v").coalesce(1)
      .writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id < 100")
    spark.sql(s"DELETE FROM $t WHERE id IN (150, 160)") // same file: folds
    spark.sql(s"DELETE FROM $t WHERE id >= 1000 AND id < 1100")
    assert(state("mor").snapshots.last.deleteFiles.size === 2,
      "repeated deletes from one file must FOLD, not accumulate")
    val below = spark.sql(s"CALL $cat.system.maintain('maint.mor')").head()
    assert(below.getInt(1) === below.getInt(2),
      "below the delete-file threshold maintain must not compact")
    assert(state("mor").snapshots.last.deleteFiles.size === 2)
    spark.sql(s"DELETE FROM $t WHERE id >= 2000 AND id < 2100")
    val expect = spark.table(t).orderBy("id").collect().toSeq
    spark.sql(s"CALL $cat.system.maintain('maint.mor')").collect()
    assert(state("mor").snapshots.last.deleteFiles.isEmpty,
      "at the threshold the deletes must fold into rewritten data files")
    assert(spark.table(t).orderBy("id").collect().toSeq === expect)
    assert(spark.table(t).count() === 2698)
  }

  test("small-file threshold compacts streaming-append pressure") {
    val t = fresh("files")
    spark.sql(s"""CREATE TABLE $t (id BIGINT)
      TBLPROPERTIES ('maintain.compact.min-files'='6')""")
    (0 until 5).foreach(i =>
      spark.range(i * 10, (i + 1) * 10).coalesce(1).writeTo(t).append())
    spark.sql(s"CALL $cat.system.maintain('maint.files')").collect()
    assert(state("files").currentFiles.size === 5,
      "5 files is below the 6-file policy — no compaction")
    spark.range(50, 60).coalesce(1).writeTo(t).append()
    val r = spark.sql(s"CALL $cat.system.maintain('maint.files')").head()
    assert(r.getInt(1) === 6 && r.getInt(2) < 6,
      s"expected a 6-file compaction, got ${r.getInt(1)} -> ${r.getInt(2)}")
    assert(spark.table(t).count() === 60)
  }

  test("no policy properties -> maintain is a safe no-op") {
    val t = fresh("noop")
    spark.range(0, 10).writeTo(t).create()
    val r = spark.sql(s"CALL $cat.system.maintain('maint.noop')").head()
    assert(r.getInt(0) === 0 && r.getInt(1) === r.getInt(2))
    assert(spark.table(t).count() === 10)
  }
}
