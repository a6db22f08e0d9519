package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The `.changes` relation: the change feed computed EXACTLY from the
  * catalog's own metadata (manifest diffs + position-delete files) — no key
  * columns, no joins — batch over a version range and streaming over every
  * commit, including the rewrites the append-only stream refuses.
  */
class ChangeFeedSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String, ddlTail: String = ""): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdf.$name")
    val t = s"$cat.cdf.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) $ddlTail")
    t
  }

  private val mor =
    "TBLPROPERTIES ('write.delete.mode'='merge-on-read', " +
      "'write.update.mode'='merge-on-read', 'write.merge.mode'='merge-on-read')"

  private def changes(t: String): Seq[Row] =
    spark.sql(s"""SELECT id, v, _change_type, _commit_version FROM $t.changes
      ORDER BY _commit_version, _change_type, id""").collect().toSeq

  test("appends are INSERTs; merge-on-read DELETE and UPDATE are row-exact") {
    val t = freshTable("morfeed", mor)
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')") // v2
    spark.sql(s"DELETE FROM $t WHERE id = 2") // v3: position delete only
    spark.sql(s"UPDATE $t SET v = 'A' WHERE id = 1") // v4: delete + insert
    assert(changes(t) === Seq(
      Row(1L, "a", "INSERT", 1L), Row(2L, "b", "INSERT", 1L),
      Row(3L, "c", "INSERT", 2L),
      Row(2L, "b", "DELETE", 3L),
      Row(1L, "a", "DELETE", 4L), Row(1L, "A", "INSERT", 4L)))
    // The operations really were merge-on-read (delta) commits.
    assert(spark.sql(s"SELECT operation FROM $t.history ORDER BY version")
      .collect().toSeq.map(_.getString(0)) ===
      Seq("append", "append", "delta", "delta"))
    // _commit_timestamp is a real, monotone timestamp surface.
    val ts = spark.sql(
      s"SELECT DISTINCT _commit_version, _commit_timestamp FROM $t.changes " +
        "ORDER BY _commit_version").collect().toSeq
    assert(ts.map(_.getLong(0)) === Seq(1L, 2L, 3L, 4L))
    assert(ts.map(_.getTimestamp(1).getTime).sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    })
  }

  test("metadata-only partition DELETE emits every dropped row as DELETE") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdf.pdel")
    val t = s"$cat.cdf.pdel"
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql(s"DELETE FROM $t WHERE region = 'a'") // metadata-only commit
    val got = spark.sql(s"""SELECT id, region, _change_type, _commit_version
      FROM $t.changes ORDER BY _commit_version, _change_type, id""").collect().toSeq
    assert(got === Seq(
      Row(1L, "a", "INSERT", 1L), Row(2L, "a", "INSERT", 1L),
      Row(3L, "b", "INSERT", 1L),
      Row(1L, "a", "DELETE", 2L), Row(2L, "a", "DELETE", 2L)))
    assert(spark.sql(s"SELECT operation FROM $t.history WHERE version = 2")
      .collect().head.getString(0) === "delete")
  }

  test("copy-on-write rewrite surfaces at file grain; the fold is exact") {
    val t = freshTable("cowfeed") // default COW modes
    // One task → ONE data file, so the rewrite group is the whole table.
    spark.range(1).selectExpr("CAST(1 AS BIGINT) AS id", "'a' AS v")
      .union(spark.range(1).selectExpr("2L", "'b'"))
      .union(spark.range(1).selectExpr("3L", "'c'"))
      .coalesce(1).writeTo(t).append()
    spark.sql(s"UPDATE $t SET v = 'X' WHERE id = 2") // v2: rewrites the file
    // File grain: every row of the rewritten file appears as DELETE (old
    // image) + INSERT (new image) — Iceberg's COW changelog shape.
    val v2 = spark.sql(s"""SELECT id, v, _change_type FROM $t.changes
      WHERE _commit_version = 2 ORDER BY _change_type, id""").collect().toSeq
    assert(v2 === Seq(
      Row(1L, "a", "DELETE"), Row(2L, "b", "DELETE"), Row(3L, "c", "DELETE"),
      Row(1L, "a", "INSERT"), Row(2L, "X", "INSERT"), Row(3L, "c", "INSERT")))
    // Folding the full feed (last event per id wins; DELETE removes)
    // reproduces the live table exactly.
    val folded = spark.sql(s"""
      WITH ranked AS (
        SELECT id, v, _change_type,
          row_number() OVER (PARTITION BY id
            ORDER BY _commit_version DESC,
              CASE _change_type WHEN 'INSERT' THEN 0 ELSE 1 END) AS rn
        FROM $t.changes)
      SELECT id, v FROM ranked WHERE rn = 1 AND _change_type = 'INSERT'
      ORDER BY id""").collect().toSeq
    assert(folded ===
      spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq)
  }

  test("compaction (replace) commits carry no changes") {
    val t = freshTable("compactfeed")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"CALL $cat.system.rewrite_data_files('cdf.compactfeed')") // v3
    assert(spark.sql(s"SELECT operation FROM $t.history WHERE version = 3")
      .collect().head.getString(0) === "replace")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $t.changes WHERE _commit_version = 3")
      .collect().head.getLong(0) === 0L)
    // ... and the feed still carries the real commits.
    assert(changes(t) === Seq(
      Row(1L, "a", "INSERT", 1L), Row(2L, "b", "INSERT", 2L)))
  }

  test("rollback restores merge-on-read-deleted rows as INSERTs") {
    val t = freshTable("rbfeed", mor)
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql(s"DELETE FROM $t WHERE id = 1") // v2: position delete
    spark.sql(s"CALL $cat.system.rollback_to_version('cdf.rbfeed', 1)") // v3
    assert(changes(t) === Seq(
      Row(1L, "a", "INSERT", 1L), Row(2L, "b", "INSERT", 1L),
      Row(1L, "a", "DELETE", 2L),
      Row(1L, "a", "INSERT", 3L))) // the rollback's restored row
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L)))
  }

  test("streaming .changes tails every commit, including rewrites; exactly once") {
    val t = freshTable("streamfeed", mor)
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // pre-stream history
    val name = s"cdf_stream_${System.nanoTime()}"
    val q = spark.readStream.table(s"$t.changes")
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 2L, "history replays as changes")
      spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
      spark.sql(s"DELETE FROM $t WHERE id = 2") // the commit appends refuse
      q.processAllAvailable()
      val got = spark.table(name)
        .select("id", "v", "_change_type", "_commit_version")
        .orderBy("_commit_version", "_change_type", "id").collect().toSeq
      assert(got === Seq(
        Row(1L, "a", "INSERT", 1L), Row(2L, "b", "INSERT", 1L),
        Row(3L, "c", "INSERT", 2L),
        Row(2L, "b", "DELETE", 3L)))
      q.processAllAvailable() // no new commits → nothing new (exactly once)
      assert(spark.table(name).count() === 4L)
    } finally q.stop()
  }

  test("changes stream restarts from its checkpoint: commits landing while " +
    "down arrive exactly once, none replayed") {
    val t = freshTable("ckptfeed", mor)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdf.ckptsink")
    val sink = s"$cat.cdf.ckptsink"
    // The catalog reserves the _-prefixed change columns as DATA names, so
    // the sink materializes them under plain aliases.
    spark.sql(s"""CREATE TABLE $sink (id BIGINT, v STRING,
      change_type STRING, commit_version BIGINT)""")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdf-ckpt").toString
    def start() = spark.readStream.table(s"$t.changes")
      .selectExpr("id", "v", "_change_type AS change_type",
        "_commit_version AS commit_version")
      .writeStream.option("checkpointLocation", ckpt).toTable(sink)

    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table(sink).count() === 1L)
    // Commits land WHILE THE STREAM IS DOWN — including a rewrite.
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.sql(s"""SELECT id, v, change_type, commit_version
      FROM $sink ORDER BY commit_version, change_type, id""").collect().toSeq
    assert(got === Seq(
      Row(1L, "a", "INSERT", 1L), // from the FIRST run only — not replayed
      Row(2L, "b", "INSERT", 2L),
      Row(1L, "a", "DELETE", 3L)))
  }

  test("startingVersion bounds the batch feed; expired history is loud") {
    val t = freshTable("expfeed", mor)
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')") // v2
    spark.sql(s"DELETE FROM $t WHERE id = 1") // v3: delta
    assert(SnapshotCatalog.expire(cat, Seq("cdf", "expfeed"), keepLast = 2) === 1)
    // Without a start, the expired prefix is loud — not silently empty.
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t.changes").collect())
    assert(e.getMessage.contains("expired"), e.getMessage)
    // From a live start whose predecessor is live, the range reads fine.
    val got = spark.read.option("startingVersion", "3").table(s"$t.changes")
      .select("id", "v", "_change_type", "_commit_version").collect().toSeq
    assert(got === Seq(Row(1L, "a", "DELETE", 3L)))
    // v2's changes are appends — computable without the expired v1.
    assert(spark.read.option("startingVersion", "2").table(s"$t.changes")
      .count() === 2L)
  }

  test("endingVersion bounds batch; column pruning serves narrow reads") {
    val t = freshTable("boundfeed")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    assert(spark.read.option("endingVersion", "2").table(s"$t.changes")
      .count() === 2L)
    assert(spark.read
      .option("startingVersion", "2").option("endingVersion", "2")
      .table(s"$t.changes").select("_change_type").collect().toSeq ===
      Seq(Row("INSERT")))
  }

  test("schema evolution: pre-ALTER files' changes pad NULL under the current schema") {
    val t = freshTable("evofeed")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // narrow file
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 0.5)")
    assert(spark.sql(s"""SELECT id, v, score, _commit_version FROM $t.changes
      ORDER BY _commit_version""").collect().toSeq ===
      Seq(Row(1L, "a", null, 1L), Row(2L, "b", 0.5, 2L)))
  }

  test("a data column named like a change column is rejected at create/alter") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdf.resfeed")
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.cdf.resfeed (id BIGINT, _change_type STRING)"))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val t = freshTable("resfeed2")
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t ADD COLUMN _commit_version BIGINT"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }
}
