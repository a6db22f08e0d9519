package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Metadata tables (`db.t.history` / `.files` / `.tags`) and SQL
  * procedures (`CALL graft_snap.system.…`) — the lake maintenance surface
  * as plain SQL, end-to-end through the parser/analyzer (no API calls in
  * the statements under test).
  */
class SnapshotMetaSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.meta")
    spark.sql(s"DROP TABLE IF EXISTS $cat.meta.$name")
    s"$cat.meta.$name"
  }

  test("history reflects commit kinds; files shows the live layout; " +
    "tags lists names — and joins against data work") {
    val t = freshTable("meta1")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // v1: append, 2 files
    spark.sql(s"DELETE FROM $t WHERE id = 1")              // v2: COW rewrite
    val hist = spark.sql(
      s"SELECT version, operation, total_files, total_rows FROM $t.history ORDER BY version")
      .collect().toSeq
    assert(hist === Seq(
      Row(1L, "append", 2, 2L),
      Row(2L, "overwrite", 1, 1L)), hist)
    // Per-commit accounting: the DELETE's copy-on-write rewrite removed
    // region a's one-row file and (its only row gone) produced no
    // replacement file.
    assert(spark.sql(
      s"""SELECT version, added_files, added_rows, removed_files,
         |  removed_rows, delete_entries_added
         |FROM $t.history ORDER BY version""".stripMargin).collect().toSeq ===
      Seq(Row(1L, 2, 2L, 0, 0L, 0L), Row(2L, 0, 0L, 1, 1L, 0L)))
    // committed_at is a real timestamp (filterable SQL surface).
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $t.history WHERE committed_at <= current_timestamp()")
      .collect().head.getLong(0) === 2L)
    // `snapshots` is Iceberg's name for the same relation — alias works.
    assert(spark.sql(
      s"SELECT version, operation, total_files, total_rows FROM $t.snapshots ORDER BY version")
      .collect().toSeq === hist)
    // …and each alias reports ITSELF in plans, not the shared impl's name.
    val snapPlan = spark.table(s"$t.snapshots").queryExecution.analyzed.toString
    assert(snapPlan.contains(".snapshots") && !snapPlan.contains(".history"),
      snapPlan)

    val files = spark.sql(
      s"SELECT partition, row_count FROM $t.files ORDER BY partition")
      .collect().toSeq
    assert(files === Seq(Row("region=b", 1L)), files)

    SnapshotCatalog.tag(cat, Seq("meta", "meta1"), "v1_tag", 1L)
    assert(spark.sql(s"SELECT tag, version FROM $t.tags").collect().toSeq ===
      Seq(Row("v1_tag", 1L)))

    // The metadata relation joins like any other: live rows per partition
    // from files × the data itself.
    val joined = spark.sql(
      s"""SELECT d.region, f.row_count FROM $t d
         |JOIN $t.files f ON f.partition = concat('region=', d.region)""".stripMargin)
      .collect().toSeq
    assert(joined === Seq(Row("b", 1L)))
  }

  test("partitions metadata: per-partition file/row counts drive " +
    "small-file detection, and compaction shows up in it") {
    val t = freshTable("mp")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (4, 'a')")
    val before = spark.sql(
      s"SELECT partition, file_count, row_count FROM $t.partitions ORDER BY partition")
      .collect().toSeq
    assert(before === Seq(Row("region=a", 3L, 3L), Row("region=b", 1L, 1L)), before)
    // The SQL a maintenance job runs: partitions fragmented past a bound.
    assert(spark.sql(
      s"SELECT partition FROM $t.partitions WHERE file_count > 2")
      .collect().toSeq === Seq(Row("region=a")))
    spark.sql(s"CALL $cat.system.rewrite_data_files('meta.mp')")
    assert(spark.sql(
      s"SELECT partition, file_count, row_count FROM $t.partitions ORDER BY partition")
      .collect().toSeq === Seq(Row("region=a", 1L, 3L), Row("region=b", 1L, 1L)))
  }

  test("startingVersion bounds history replay: numeric starts at that " +
    "commit, 'latest' skips all history") {
    val t = freshTable("sv")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i)")) // v1..v4
    val n1 = s"sv_stream_${System.nanoTime()}"
    val q1 = spark.readStream.option("startingVersion", "3").table(t)
      .writeStream.format("memory").queryName(n1).start()
    try {
      q1.processAllAvailable()
      assert(spark.table(n1).orderBy("id").collect().toSeq ===
        Seq(Row(3L), Row(4L)), "delivery must begin AT version 3")
    } finally q1.stop()
    val n2 = s"sv_stream_${System.nanoTime()}"
    val q2 = spark.readStream.option("startingVersion", "latest").table(t)
      .writeStream.format("memory").queryName(n2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table(n2).isEmpty, "'latest' must skip all history")
      spark.sql(s"INSERT INTO $t VALUES (9)")
      q2.processAllAvailable()
      assert(spark.table(n2).collect().toSeq === Seq(Row(9L)))
    } finally q2.stop()
    val e = intercept[Exception] {
      val q = spark.readStream.option("startingVersion", "nope").table(t)
        .writeStream.format("memory").queryName(s"sv_bad_${System.nanoTime()}").start()
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(String.valueOf(_)).mkString("\n")
    assert(msgs.contains("startingVersion"), msgs)
  }

  test("a REAL table always outranks the metadata fallback; unknown " +
    "suffixes still fail loudly") {
    // A genuine table named `history` under namespace (meta, meta2),
    // created BEFORE meta2 itself exists as a table (afterwards the
    // suffix is effectively reserved — the fallback makes the identifier
    // resolve, so CREATE sees it as taken; Iceberg's metadata suffixes
    // behave the same way).
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.meta.meta2")
    spark.sql(s"DROP TABLE IF EXISTS $cat.meta.meta2.history")
    spark.sql(s"DROP TABLE IF EXISTS $cat.meta.meta2")
    spark.sql(s"CREATE TABLE $cat.meta.meta2.history (note STRING)")
    spark.sql(s"INSERT INTO $cat.meta.meta2.history VALUES ('real table')")
    val t = s"$cat.meta.meta2"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (7)")
    // The full identifier resolves to the REAL table, not meta2's metadata.
    assert(spark.sql(s"SELECT note FROM $t.history").collect().toSeq ===
      Seq(Row("real table")))
    spark.sql(s"DROP TABLE $t.history")
    // With the shadow gone the suffix serves metadata again.
    assert(spark.sql(s"SELECT operation FROM $t.history ORDER BY version")
      .collect().toSeq === Seq(Row("append")))
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $t.nonsense").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be found"), e.getMessage)
  }

  test("dynamic partition pruning: a star join's fact scan opens only the " +
    "partitions the broadcast dimension side actually selects") {
    // Fact: suppliers partitioned by nation; dim: the nation PARQUET
    // fixture with a selective filter (a file-backed dim keeps its Filter
    // node — a literal in-memory dim constant-folds to a LocalRelation,
    // which the PartitionPruning rule rightly judges unprunable).
    val t = freshTable("dpp_fact")
    spark.sql(s"CREATE TABLE $t (s_suppkey BIGINT, s_acctbal DOUBLE, nk INT) " +
      "PARTITIONED BY (nk)")
    val src = graft.queries.Tables.supplier(spark, graft.SparkTestSession.sfDir)
      .selectExpr("s_suppkey", "s_acctbal", "CAST(s_nationkey AS INT) AS nk")
    src.createOrReplaceTempView("dpp_supp_src")
    src.writeTo(t).append()
    graft.queries.Tables.nation(spark, graft.SparkTestSession.sfDir)
      .createOrReplaceTempView("dpp_nation")
    val q = spark.sql(
      s"""SELECT count(*) AS n, sum(f.s_suppkey) AS sk FROM $t f
         |JOIN dpp_nation d ON f.nk = d.n_nationkey
         |WHERE d.n_regionkey = 1""".stripMargin)
    val expected = spark.sql(
      """SELECT count(*) AS n, sum(s_suppkey) AS sk FROM dpp_supp_src f
        |JOIN dpp_nation d ON f.nk = d.n_nationkey
        |WHERE d.n_regionkey = 1""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the fact scan:\n$plan")
    assert(q.collect().toSeq === expected.collect().toSeq)
  }

  test("CALL procedures: tag, rollback, expire, rewrite_data_files — " +
    "the full maintenance loop in SQL") {
    val t = freshTable("proc1")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)") // v1
    spark.sql(s"INSERT INTO $t VALUES (2)") // v2
    spark.sql(s"INSERT INTO $t VALUES (3)") // v3

    assert(spark.sql(
      s"CALL $cat.system.create_tag('meta.proc1', 'good', 1)")
      .collect().toSeq === Seq(Row("good", 1L)))

    // Roll back to v2 — a NEW commit (v4) re-referencing v2's files.
    assert(spark.sql(
      s"CALL $cat.system.rollback_to_version('meta.proc1', 2)")
      .collect().toSeq === Seq(Row(4L)))
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L)))

    // Expire all but the newest snapshot; the tagged v1 survives.
    val expired = spark.sql(
      s"CALL $cat.system.expire_snapshots('meta.proc1', 1)")
      .collect().head.getInt(0)
    assert(expired === 2, s"expected v2+v3 expired, tagged v1 kept: $expired")
    assert(spark.sql(s"SELECT id FROM $t VERSION AS OF 'good'").collect().toSeq ===
      Seq(Row(1L)))

    // Compact the 2-file live state into 1 (named-argument CALL syntax).
    assert(spark.sql(
      s"CALL $cat.system.rewrite_data_files(`table` => 'meta.proc1')")
      .collect().toSeq === Seq(Row(2, 1)))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t.files").collect().head.getLong(0) === 1L)

    assert(spark.sql(s"CALL $cat.system.drop_tag('meta.proc1', 'good')")
      .collect().toSeq === Seq(Row(true)))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t.tags").collect().head.getLong(0) === 0L)

    val e = intercept[Exception](spark.sql(s"CALL $cat.system.no_such_proc()"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("expire_snapshots"), msgs) // names the known set
  }

  test("remove_orphan_files deletes crash residue only: referenced data, " +
    "delete files, and branch-staged files all survive") {
    val t = freshTable("orphans")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v STRING) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read')""")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"DELETE FROM $t WHERE id = 1") // live position-delete file
    spark.sql(s"CALL $cat.system.create_branch('meta.orphans', 'stage')")
    spark.sql(s"INSERT INTO $t.branch_stage VALUES (3, 'c')") // branch-only file
    // Plant crash residue: a file in the data dir no manifest references.
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("meta", "orphans")))
    val orphan = new java.io.File(new java.net.URI(
      if (st.dataDir.contains(":")) st.dataDir else "file:" + st.dataDir)
      .getPath, "crash-residue.bin")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // Backdate past the floor: the residue is "old", the live files are
    // "fresh" — exactly the discrimination the age floor exists to make.
    assert(orphan.setLastModified(System.currentTimeMillis() - 3600_000L))
    // ALSO backdate a referenced data file: it passes the age filter, so
    // only the referenced-set check protects it — load-bearing, not
    // vacuous (a GC comparing paths wrongly would delete it).
    val referencedFile = new java.io.File(
      new java.net.URI(
        if (st.currentFiles.head.path.contains(":")) st.currentFiles.head.path
        else "file:" + st.currentFiles.head.path).getPath)
    assert(referencedFile.setLastModified(System.currentTimeMillis() - 3600_000L))
    // dry_run lists the orphan's PATH (the audit-before-delete loop)
    // without deleting.
    val listed = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "'meta.orphans', 0.5D, true)").collect().toSeq
    assert(listed.map(_.getBoolean(1)) === Seq(false) &&
      listed.head.getString(0).endsWith("crash-residue.bin"), listed)
    assert(orphan.exists())
    // The real run deletes exactly the orphan.
    val deleted = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "'meta.orphans', 0.5D, false)").collect().toSeq
    assert(deleted.map(_.getBoolean(1)) === Seq(true))
    assert(!orphan.exists())
    // Everything referenced still reads: live rows, the MOR delete still
    // applied, the staged branch intact.
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(2L)))
    assert(spark.sql(s"SELECT id FROM $t.branch_stage ORDER BY id")
      .collect().toSeq === Seq(Row(2L), Row(3L)))
    // Nothing left to collect.
    assert(spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "'meta.orphans', 0.5D, true)").collect().isEmpty)
    // The age floor cannot be silently disabled on a DESTRUCTIVE run:
    // zero and NULL floors are refused (dry-run with 0 stays legal).
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.remove_orphan_files('meta.orphans', 0.0D, false)")
      .collect())
    assert(e.getMessage.contains("POSITIVE"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.remove_orphan_files(" +
        "'meta.orphans', CAST(NULL AS DOUBLE), false)").collect())
    assert(e2.getMessage.contains("NULL") ||
      e2.getMessage.toLowerCase.contains("null"), e2.getMessage)
  }
}
