package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** FIELD-ID schema evolution (Iceberg's mechanism, [[FieldIds]]): every
  * column carries an immutable id; names are labels over ids. RENAME and
  * DROP therefore work with history intact — each data file's manifest
  * entry records the (id, name) list it was written under, and readers
  * resolve requested columns by id against files of every vintage. Time
  * travel reads each version under its own names (per-snapshot schemas). */
class SchemaEvolutionSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.evo")
    spark.sql(s"DROP TABLE IF EXISTS $cat.evo.$name")
    s"$cat.evo.$name"
  }

  test("RENAME COLUMN: data reads under the new name; time travel reads " +
      "each version under its own; restart reloads it all") {
    val t = fresh("ren")
    spark.sql(s"CREATE TABLE $t (id BIGINT, amount DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0)") // v1
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amount TO amt")
    spark.sql(s"INSERT INTO $t VALUES (3, 30.0)")            // v2 (new name)
    // Current reads: both vintages of files serve the renamed column.
    assert(spark.sql(s"SELECT id, amt FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 10.0), Row(2L, 20.0), Row(3L, 30.0)))
    // Time travel to v1: its own schema, the OLD name.
    assert(spark.sql(s"SELECT id, amount FROM $t VERSION AS OF 1 ORDER BY id")
      .collect().toSeq === Seq(Row(1L, 10.0), Row(2L, 20.0)))
    intercept[Exception](
      spark.sql(s"SELECT amount FROM $t").collect()) // old name is gone live
    // Restart: ids, names, and per-snapshot schemas replay from the log.
    SnapshotStore.tables.clear()
    assert(spark.sql(s"SELECT sum(amt) FROM $t").collect().head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT id, amount FROM $t VERSION AS OF 1 ORDER BY id")
      .collect().toSeq === Seq(Row(1L, 10.0), Row(2L, 20.0)))
  }

  test("DROP COLUMN: live reads exclude it, history keeps it; UPDATE and " +
      "MOR delete still work over mixed-vintage files") {
    val t = fresh("drop")
    spark.sql(s"CREATE TABLE $t (id BIGINT, note STRING, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0)") // v1
    spark.sql(s"ALTER TABLE $t DROP COLUMN note")
    assert(spark.table(t).columns.toSeq === Seq("id", "amt"))
    spark.sql(s"INSERT INTO $t VALUES (3, 3.0)")                     // v2
    assert(spark.sql(s"SELECT * FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 1.0), Row(2L, 2.0), Row(3L, 3.0)))
    // v1's schema still carries the dropped column with its data.
    assert(spark.sql(s"SELECT note FROM $t VERSION AS OF 1 ORDER BY id")
      .collect().map(_.getString(0)).toSeq === Seq("a", "b"))
    // Row-level ops on the evolved table read mixed vintages correctly.
    spark.sql(s"UPDATE $t SET amt = amt * 10 WHERE id = 1")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    assert(spark.sql(s"SELECT id, amt FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 10.0), Row(3L, 3.0)))
  }

  test("a dropped name REUSED by a new column never reads the old bytes " +
      "(distinct field ids)") {
    val t = fresh("reuse")
    spark.sql(s"CREATE TABLE $t (id BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'old-bytes')")
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $t VALUES (2, 'new-bytes')")
    // Row 1's file physically holds 'old-bytes' under the NAME tag, but its
    // field id is retired — the new tag column must read NULL there.
    assert(spark.sql(s"SELECT id, tag FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, null), Row(2L, "new-bytes")))
  }

  test("partition column rename keeps pruning and partition values") {
    val t = fresh("prename")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'eu'), (2, 'us')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN region TO zone")
    spark.sql(s"INSERT INTO $t VALUES (3, 'eu')")
    assert(spark.sql(s"SELECT id FROM $t WHERE zone = 'eu' ORDER BY id")
      .collect().toSeq === Seq(Row(1L), Row(3L)))
    // Metadata-only partition delete under the new name.
    spark.sql(s"DELETE FROM $t WHERE zone = 'us'")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 2L)
  }

  test("stats-based file skipping keys on ids: a predicate on the RENAMED " +
      "column still skips files written under the old name") {
    val t = fresh("stats")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'low'), (2, 'low')")
    spark.sql(s"INSERT INTO $t VALUES (100, 'high'), (200, 'high')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO key")
    def scannedFiles(sql: String): Long = {
      val plans = spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }
      plans.sum.toLong
    }
    val all = scannedFiles(s"SELECT * FROM $t")
    val skipped = scannedFiles(s"SELECT * FROM $t WHERE key > 50")
    assert(skipped < all,
      s"stats skipping must survive the rename (ids, not names): " +
        s"$skipped of $all files scanned")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE key > 50")
      .collect().head.getLong(0) === 2L)
  }

  test("grf format evolves identically (positional decode via write-time ids)") {
    val t = fresh("grf")
    spark.sql(s"CREATE TABLE $t (a BIGINT, b STRING, c DOUBLE) " +
      "TBLPROPERTIES ('write.format'='grf')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'x', 1.5)")
    spark.sql(s"ALTER TABLE $t DROP COLUMN b")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN c TO cost")
    spark.sql(s"INSERT INTO $t VALUES (2, 2.5)")
    assert(spark.sql(s"SELECT a, cost FROM $t ORDER BY a").collect().toSeq ===
      Seq(Row(1L, 1.5), Row(2L, 2.5)))
    assert(spark.sql(s"SELECT b FROM $t VERSION AS OF 1").collect()
      .map(_.getString(0)).toSeq === Seq("x"))
  }

  test("the changes relation reads renamed columns across vintages") {
    val t = fresh("cdf")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.0)") // v1
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO value")
    spark.sql(s"INSERT INTO $t VALUES (2, 2.0)") // v2
    val changes = spark.read.option("startingVersion", 1)
      .option("endingVersion", 2).table(s"$t.changes")
      .selectExpr("id", "value", "_change_type").orderBy("id").collect().toSeq
    assert(changes === Seq(Row(1L, 1.0, "INSERT"), Row(2L, 2.0, "INSERT")))
  }

  test("RENAME/DROP refuse while current files predate field-id tracking; " +
      "rewrite_data_files upgrades them") {
    val t = fresh("legacy")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    // Simulate a legacy (pre-field-id) file: strip its write-time mapping.
    val k = SnapshotStore.keyOf(cat, Seq("evo", "legacy"))
    SnapshotStore.update(k) { st =>
      st.copy(snapshots = st.snapshots.map(sn =>
        sn.copy(files = sn.files.map(_.copy(writeCols = Vector.empty)),
          manifestPath = null)))
    }
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w"))
    assert(e.getMessage.contains("rewrite_data_files"), e.getMessage)
    // Compaction rewrites files under the live schema → mapping restored.
    spark.sql(s"CALL $cat.system.rewrite_data_files('evo.legacy')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(spark.sql(s"SELECT w FROM $t").collect().map(_.getString(0)).toSeq ===
      Seq("a"))
  }

  test("ADD COLUMN after a drop gets a FRESH id (never reused) and the " +
      "id survives restart") {
    val t = fresh("ids")
    spark.sql(s"CREATE TABLE $t (a BIGINT, b STRING)")
    val k = SnapshotStore.keyOf(cat, Seq("evo", "ids"))
    assert(SnapshotStore.stateOf(k).lastFieldId === 2)
    spark.sql(s"ALTER TABLE $t DROP COLUMN b")
    spark.sql(s"ALTER TABLE $t ADD COLUMN c STRING")
    assert(SnapshotStore.stateOf(k).lastFieldId === 3)
    assert(FieldIds.requireId(SnapshotStore.stateOf(k).schema, "c") === 3)
    SnapshotStore.tables.clear()
    assert(SnapshotStore.stateOf(k).lastFieldId === 3)
    assert(FieldIds.requireId(SnapshotStore.stateOf(k).schema, "c") === 3)
  }
}
