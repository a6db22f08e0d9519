package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TYPE WIDENING over field ids ([[TypeWidening]], Iceberg's safe
  * promotions): `ALTER COLUMN … TYPE` is METADATA-ONLY — no file is
  * rewritten; the table records (field id → type history watermarks) and
  * readers resolve each file's WRITE-TIME type through its data sequence
  * number, decode natively, and up-cast. Time travel still reads each
  * version under its own schema; stats-based skipping compares pre-widen
  * narrow stat boxes in the widened type. */
class TypeWideningSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.widen")
    spark.sql(s"DROP TABLE IF EXISTS $cat.widen.$name")
    s"$cat.widen.$name"
  }

  test("int→long: both vintages read under the widened type; values past " +
      "Int.MaxValue land after the widen; restart replays the history") {
    val t = fresh("i2l")
    spark.sql(s"CREATE TABLE $t (id BIGINT, n INT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, 20)")          // v1: int files
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES (3, ${Long.MaxValue})")     // v2: long files
    assert(spark.table(t).schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.sql(s"SELECT id, n FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, Long.MaxValue)))
    assert(spark.sql(s"SELECT sum(n) FROM $t WHERE id < 3")
      .collect().head.getLong(0) === 30L)
    // Time travel to v1 reads the column in its OWN (int) type.
    val v1 = spark.sql(s"SELECT id, n FROM $t VERSION AS OF 1 ORDER BY id")
    assert(v1.schema("n").dataType === org.apache.spark.sql.types.IntegerType)
    assert(v1.collect().toSeq === Seq(Row(1L, 10), Row(2L, 20)))
    // Restart: typeHistory replays from the metadata log.
    SnapshotStore.tables.clear()
    assert(spark.sql(s"SELECT id, n FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, Long.MaxValue)))
  }

  test("float→double and decimal precision-up (both file formats)") {
    for (fmt <- Seq("parquet", "grf")) {
      val t = fresh(s"fd_$fmt")
      spark.sql(s"CREATE TABLE $t (id BIGINT, r FLOAT, d DECIMAL(10,2)) " +
        s"TBLPROPERTIES ('write.format'='$fmt')")
      spark.sql(s"INSERT INTO $t VALUES (1, CAST(1.5 AS FLOAT), 12.34)")
      spark.sql(s"ALTER TABLE $t ALTER COLUMN r TYPE DOUBLE")
      spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(26,2)")
      // 26,2 crosses the precision-18 storage boundary: old compact-long
      // decimals must re-box into the wide representation.
      spark.sql(s"INSERT INTO $t VALUES " +
        s"(2, CAST(2.5 AS DOUBLE), 123456789012345678901234.56)")
      val rows = spark.sql(s"SELECT id, r, d FROM $t ORDER BY id").collect()
      assert(rows(0).getDouble(1) === 1.5)
      assert(rows(0).getDecimal(2) === new java.math.BigDecimal("12.34"))
      assert(rows(1).getDouble(1) === 2.5)
      assert(rows(1).getDecimal(2) ===
        new java.math.BigDecimal("123456789012345678901234.56"))
      assert(spark.sql(s"SELECT sum(r), sum(d) FROM $t").collect().head ===
        Row(4.0, new java.math.BigDecimal("123456789012345678901246.90")))
    }
  }

  test("stats-based skipping survives a widen: pre-widen files' narrow " +
      "stat boxes compare in the widened type") {
    val t = fresh("stats")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'low'), (2, 'low')")
    spark.sql(s"INSERT INTO $t VALUES (100, 'high'), (200, 'high')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES (${Long.MaxValue}, 'huge')")
    def scannedFiles(sql: String): Long =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }.sum.toLong
    val all = scannedFiles(s"SELECT * FROM $t")
    val skipped = scannedFiles(s"SELECT * FROM $t WHERE k > 50")
    // The first INSERT's files (k in {1,2}, pre-widen int stats) must all
    // be skipped by the bigint predicate — narrow boxes, widened compare.
    assert(skipped === all - 2,
      s"expected the two all-low files skipped: $skipped of $all")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE k > 50")
      .collect().head.getLong(0) === 3L)
  }

  test("unsafe retypes and partition-column widens are rejected") {
    val t = fresh("bad")
    spark.sql(s"CREATE TABLE $t (id BIGINT, n INT, p INT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES (1, 1, 1)")
    for (bad <- Seq("n TYPE INT" -> false, "id TYPE INT" -> true,
        "n TYPE STRING" -> true, "n TYPE FLOAT" -> true,
        "p TYPE BIGINT" -> true)) {
      val (ddl, shouldFail) = bad
      if (shouldFail)
        intercept[Exception](spark.sql(s"ALTER TABLE $t ALTER COLUMN $ddl"))
      else spark.sql(s"ALTER TABLE $t ALTER COLUMN $ddl") // same-type no-op
    }
    // The no-op retype and the failures left the schema untouched.
    assert(spark.table(t).schema("n").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("row-level ops, the changes feed, and compaction read mixed " +
      "vintages; chained widens resolve each file's own era") {
    val t = fresh("mixed")
    spark.sql(s"CREATE TABLE $t (id BIGINT, n SMALLINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, CAST(1 AS SMALLINT))")   // v1: short
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE INT")
    spark.sql(s"INSERT INTO $t VALUES (2, 222222)")                // v2: int
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES (3, ${1L << 40})")           // v3: long
    // COW update rewrites a pre-widen file's rows in the live type.
    spark.sql(s"UPDATE $t SET n = n + 1 WHERE id = 1")
    // MOR delete over the mixed table.
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    assert(spark.sql(s"SELECT id, n FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 2L), Row(3L, 1L << 40)))
    // The changes feed serves every vintage under the LIVE type.
    val changes = spark.read.option("startingVersion", 1)
      .option("endingVersion", 3).table(s"$t.changes")
      .selectExpr("id", "n").orderBy("id").collect().toSeq
    assert(changes === Seq(Row(1L, 1L), Row(2L, 222222L), Row(3L, 1L << 40)))
    // Compaction rewrites everything natively in the live type.
    spark.sql(s"CALL $cat.system.rewrite_data_files('widen.mixed')")
    assert(spark.sql(s"SELECT id, n FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, 2L), Row(3L, 1L << 40)))
  }

  test("widening a live equality-delete key is rejected until compaction " +
      "folds the deletes") {
    val t = fresh("eqkey")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    // Streaming upsert leaves a live equality delete keyed on k.
    val batch = spark.sql("SELECT 1 AS k, 'a2' AS v")
    SnapshotUpsert.upsertBatch(t, batch, Seq("k"), "wtest", 0L)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT"))
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    spark.sql(s"CALL $cat.system.rewrite_data_files('widen.eqkey')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ===
      Seq(Row(1L, "a2"), Row(2L, "b")))
  }

  test("widening is refused while branches hold STAGED commits (their " +
      "seqs overlap main's post-widen range), and an EMPTY branch whose " +
      "head still carries a folded eq delete blocks the widen too") {
    val t = fresh("br")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"CALL $cat.system.create_branch('widen.br', 'stage')")
    spark.sql(s"INSERT INTO $t.branch_stage VALUES (2, 'staged')")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT"))
    assert(e.getMessage.contains("staged"), e.getMessage)
    spark.sql(s"CALL $cat.system.fast_forward('widen.br', 'stage')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES (${Long.MaxValue}, 'wide')")
    assert(spark.sql(s"SELECT sum(k) FROM $t WHERE k < 100")
      .collect().head.getLong(0) === 3L)
    // Empty-branch head: its BASE snapshot still applies an eq delete that
    // main has since folded — the widen guard must see it.
    val t2 = fresh("br2")
    spark.sql(s"CREATE TABLE $t2 (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 'a'), (2, 'b')")
    SnapshotUpsert.upsertBatch(t2, spark.sql("SELECT 1 AS k, 'a2' AS v"), Seq("k"))
    spark.sql(s"CALL $cat.system.create_branch('widen.br2', 'frozen')")
    spark.sql(s"CALL $cat.system.rewrite_data_files('widen.br2')") // folds main's delete
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t2 ALTER COLUMN k TYPE BIGINT"))
    assert(e2.getMessage.contains("equality-delete"), e2.getMessage)
    assert(spark.sql(s"SELECT v FROM $t2.branch_frozen WHERE k = 1").collect()
      .map(_.getString(0)).toSeq === Seq("a2"))
  }

  test("a widened table still equality-upserts: post-widen delete keys " +
      "probe pre-widen files' up-cast values") {
    val t = fresh("upsert")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")         // int files
    spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT")
    val batch = spark.sql("SELECT CAST(1 AS BIGINT) AS k, 'a2' AS v")
    SnapshotUpsert.upsertBatch(t, batch, Seq("k"), "wtest2", 0L)
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ===
      Seq(Row(1L, "a2"), Row(2L, "b")))
  }
}
