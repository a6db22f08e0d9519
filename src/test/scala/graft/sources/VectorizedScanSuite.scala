package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** VECTORIZED catalog scans: parquet data files decode through Spark's
  * ColumnarBatch reader (DataFiles.ParquetBatchStream) whenever no per-row
  * weaving applies; every shape that DOES need per-row work (merge-on-read
  * deletes, equality deletes, `_file`/`_pos` metadata, type widening, grf
  * files) falls back to the row stream — and both paths must agree
  * value-for-value. The A/B throughput claim lives in BASELINE/BENCH
  * (cat01 vs cat02); this suite pins plan shape + exactness. */
class VectorizedScanSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.vec")
    spark.sql(s"DROP TABLE IF EXISTS $cat.vec.$name")
    s"$cat.vec.$name"
  }

  /** Do ALL snapshot-catalog scans in `df`'s plan decode columnar? */
  private def scansColumnar(df: DataFrame): Boolean = {
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${df.queryExecution.sparkPlan}")
    scans.forall(_.supportsColumnar)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("plain parquet table scans columnar and matches the source") {
    val t = fresh("basic")
    val src = spark.range(0, 5000)
      .selectExpr("id", "CAST(id % 7 AS INT) AS small",
        "CAST(id AS DOUBLE) / 3 AS d", "concat('s', id % 11) AS s",
        "CAST(id AS DECIMAL(12,2)) AS dec",
        "timestamp_micros(1700000000000000 + id * 1000000) AS ts",
        "date_add(DATE '2024-01-01', CAST(id % 300 AS INT)) AS dt",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id * 2 END AS maybe")
    src.writeTo(t).create()
    val read = spark.table(t)
    assert(scansColumnar(read), "plain parquet scan should be columnar")
    assert(sortedRows(read) === sortedRows(src))
  }

  test("nested types (array/struct/map) scan columnar and exact") {
    val t = fresh("nested")
    val src = spark.range(0, 500)
      .selectExpr("id", "array(id, id + 1, id + 2) AS arr",
        "named_struct('a', id, 'b', concat('x', id)) AS st",
        "map(concat('k', id % 3), id) AS mp")
    src.writeTo(t).create()
    val read = spark.table(t)
    assert(scansColumnar(read))
    assert(sortedRows(read) === sortedRows(src))
  }

  test("split-planned big file stays columnar, split-for-split exact") {
    val t = fresh("splits")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.parquet.row-group-bytes'='65536',
                     'read.split.target-bytes'='65536')""")
    spark.range(0, 200000).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .coalesce(1).writeTo(t).append()
    val read = spark.table(t)
    assert(read.rdd.getNumPartitions > 1,
      "fixture must split into multiple tasks for the pin to mean anything")
    assert(scansColumnar(read))
    val agg = read.agg(count(lit(1)), sum("v")).head()
    assert(agg.getLong(0) === 200000L)
    assert(agg.getDouble(1) === (0L until 200000L).map(_.toDouble).sum)
  }

  test("columns added after a write read as NULL vectors, still columnar") {
    val t = fresh("addcol")
    spark.range(0, 100).selectExpr("id").writeTo(t).create()
    spark.sql(s"ALTER TABLE $t ADD COLUMN extra DOUBLE")
    spark.range(100, 200).selectExpr("id", "CAST(id AS DOUBLE) AS extra")
      .writeTo(t).append()
    val read = spark.table(t)
    assert(scansColumnar(read))
    assert(read.count() === 200)
    assert(read.filter(col("extra").isNull).count() === 100)
  }

  test("renamed column resolves by field id in the batch path") {
    val t = fresh("rename")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").writeTo(t).create()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    spark.range(100, 200).selectExpr("id", "id * 2 AS w").writeTo(t).append()
    val read = spark.table(t).select("w")
    assert(scansColumnar(read))
    assert(sortedRows(read) === (0L until 200L).map(i => s"[${i * 2}]").sorted)
  }

  test("merge-on-read position deletes STAY columnar, same answer") {
    val t = fresh("mor")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 1000).selectExpr("id", "id AS v").writeTo(t).append()
    val before = spark.table(t)
    assert(scansColumnar(before), "pre-delete scan should be columnar")
    spark.sql(s"DELETE FROM $t WHERE id % 10 = 3")
    val after = spark.table(t)
    assert(scansColumnar(after),
      "position deletes filter through the batch selection — no row demotion")
    assert(after.count() === 900)
    assert(after.filter(col("id") % 10 === 3).count() === 0)
    assert(after.agg(sum("v")).head().getLong(0) ===
      (0L until 1000L).filterNot(_ % 10 == 3).sum)
  }

  test("position deletes: batch path ≡ row path value-for-value") {
    val t = fresh("morab")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, s STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                     'write.parquet.row-group-bytes'='32768',
                     'read.split.target-bytes'='32768')""")
    spark.range(0, 50000).selectExpr("id", "concat('v', id) AS s")
      .coalesce(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id % 7 = 2 OR id BETWEEN 20000 AND 21000")
    // `_pos` forces the row path (metadata weaving); same files, same deletes.
    val columnar = spark.table(t).selectExpr("id", "s")
    val row = spark.table(t).selectExpr("id", "s", "_pos")
    assert(scansColumnar(columnar) && !scansColumnar(row))
    val a = columnar.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = row.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.sameElements(b))
    assert(!a.exists(_._1 % 7 == 2))
  }

  test("a fully-deleted file reads as zero rows, still columnar") {
    val t = fresh("morall")
    spark.sql(s"""CREATE TABLE $t (id BIGINT)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 500).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id >= 0")
    val read = spark.table(t)
    assert(scansColumnar(read))
    assert(read.count() === 0)
  }

  test("equality deletes stay columnar; pruned key columns decode for " +
      "probing, then drop from the emitted batch") {
    val t = fresh("eqvec")
    spark.sql(s"CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    import spark.implicits._
    SnapshotUpsert.upsertBatch(t,
      Seq((2L, "B", 20.0), (4L, "d", 4.0)).toDF("id", "name", "score"), Seq("id"))
    val full = spark.table(t)
    assert(scansColumnar(full), "equality deletes must not demote the scan")
    assert(full.orderBy("id").collect().map(_.toString).toSeq ===
      Seq("[1,a,1.0]", "[2,B,20.0]", "[3,c,3.0]", "[4,d,4.0]"))
    // Projection WITHOUT the key column: the read schema extends with `id`
    // for probing; the batch emitted downstream carries only `name`.
    val pruned = spark.table(t).select("name")
    assert(scansColumnar(pruned))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("B", "a", "c", "d"))
  }

  test("mixed position + equality deletes compose on the batch path") {
    val t = fresh("mixvec")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 100)
      .selectExpr("id", "concat('n', id) AS name", "CAST(id AS DOUBLE) AS score")
      .writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id % 10 = 0") // position deletes
    import spark.implicits._
    SnapshotUpsert.upsertBatch(t, // equality delete + append
      Seq((7L, "N7", 700.0)).toDF("id", "name", "score"), Seq("id"))
    val read = spark.table(t)
    assert(scansColumnar(read))
    assert(read.count() === 90)
    assert(read.filter(col("id") === 7).collect().map(_.toString).toSeq ===
      Seq("[7,N7,700.0]"))
    assert(read.filter(col("id") % 10 === 0).count() === 0)
  }

  test("type widening of an eq-key column KEEPS the batch path (round " +
      "16: up-casting vector view), probe answers exact") {
    val t = fresh("eqwiden")
    spark.sql(s"CREATE TABLE $t (id INT, v BIGINT)")
    spark.range(0, 50).selectExpr("CAST(id AS INT) AS id", "id AS v")
      .writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE BIGINT")
    import spark.implicits._
    SnapshotUpsert.upsertBatch(t,
      Seq((7L, 700L)).toDF("id", "v"), Seq("id"))
    // Projection prunes `id`; the eq probe still needs it — the pre-widen
    // file decodes INT natively and probes through the widened view.
    val read = spark.table(t).select("v")
    assert(scansColumnar(read),
      "a widened eq-key column must stay columnar through the up-cast view")
    assert(read.agg(sum("v")).head().getLong(0) ===
      (0L until 50L).filterNot(_ == 7L).sum + 700L)
  }

  test("type-widened history KEEPS the batch path: pre-widen files " +
      "decode natively behind an up-casting view, batch ≡ row exact — " +
      "at DICTIONARY-PAGE scale (small fixtures never exercise the " +
      "mixed-page decode that a delegating close() broke)") {
    val t = fresh("widen")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v INT, p DECIMAL(6,2))")
    // Repeating values + enough rows: parquet dictionary-encodes the
    // pages, which is where the round-16 bench caught the NPE the
    // 100-row version of this test missed.
    spark.range(0, 200000)
      .selectExpr("id", "CAST(id % 1000 AS INT) AS v",
        "CAST(id % 777 AS DECIMAL(6,2)) / 4 AS p")
      .coalesce(2).writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN p TYPE DECIMAL(12,2)")
    spark.range(200000, 200100)
      .selectExpr("id", "id AS v", "CAST(id AS DECIMAL(12,2)) / 4 AS p")
      .writeTo(t).append()
    val read = spark.table(t)
    assert(scansColumnar(read),
      "pre-widen files must stay columnar behind the up-cast view")
    val batch = read.agg(sum("v"), sum("p"), count(lit(1))).head()
    // The row path must agree value-for-value (read.vectorized off).
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('read.vectorized'='false')")
    val row = spark.table(t).agg(sum("v"), sum("p"), count(lit(1))).head()
    assert(batch === row, "widened batch decode must equal the row path")
    assert(batch.getLong(2) === 200100L)
  }

  test("widened decode COMPOSES with merge-on-read deletes at " +
      "dictionary scale: selection remap over the up-cast view, " +
      "batch ≡ row exact") {
    val t = fresh("widenmor")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, v INT)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 100000).selectExpr("id", "CAST(id % 500 AS INT) AS v")
      .coalesce(1).writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"DELETE FROM $t WHERE id % 9 = 4")
    val read = spark.table(t)
    assert(scansColumnar(read),
      "widen + position deletes must keep the batch path")
    val batch = read.agg(sum("v"), count(lit(1))).head()
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('read.vectorized'='false')")
    val row = spark.table(t).agg(sum("v"), count(lit(1))).head()
    assert(batch === row)
    assert(batch.getLong(1) === (0L until 100000L).count(_ % 9 != 4))
  }

  test("grf-format tables keep the row stream") {
    val t = fresh("grf")
    spark.sql(s"CREATE TABLE $t (id BIGINT) TBLPROPERTIES ('write.format'='grf')")
    spark.range(0, 100).writeTo(t).append()
    val read = spark.table(t)
    assert(!scansColumnar(read))
    assert(read.count() === 100)
  }

  test("_file/_pos metadata columns keep the row stream") {
    val t = fresh("meta")
    spark.range(0, 100).writeTo(t).create()
    val read = spark.table(t).select(col("id"), col("_pos"))
    assert(!scansColumnar(read))
    assert(read.agg(max("_pos")).head().getLong(0) >= 0)
  }

  test("read.vectorized=false property forces the row stream") {
    val t = fresh("novec")
    spark.sql(s"CREATE TABLE $t (id BIGINT) TBLPROPERTIES ('read.vectorized'='false')")
    spark.range(0, 100).writeTo(t).append()
    assert(!scansColumnar(spark.table(t)))
    assert(spark.table(t).count() === 100)
  }

  test("read.vectorized=false also governs BRANCH reads (review finding)") {
    val t = fresh("novecbr")
    spark.sql(s"CREATE TABLE $t (id BIGINT) TBLPROPERTIES ('read.vectorized'='false')")
    spark.range(0, 100).writeTo(t).append()
    spark.sql(s"CALL graft_snap.system.create_branch('vec.novecbr', 'audit')")
    val branchRead = spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'")
    assert(!scansColumnar(branchRead),
      "the operational off-switch must hold on branch reads too")
    assert(branchRead.count() === 100)
  }

  test("columnar and row paths agree on a ranged split boundary") {
    val t = fresh("boundary")
    spark.sql(s"""CREATE TABLE $t (id BIGINT, s STRING)
      TBLPROPERTIES ('write.parquet.row-group-bytes'='32768',
                     'read.split.target-bytes'='32768')""")
    spark.range(0, 50000).selectExpr("id", "concat('v', id) AS s")
      .coalesce(1).writeTo(t).append()
    // Row-path twin: the same table with `_pos` COLLECTED (dropping it
    // pre-collect would let the optimizer prune it back out and re-plan
    // columnar) — identical physical files, both decoders.
    val columnar = spark.table(t).selectExpr("id", "s")
    val row = spark.table(t).selectExpr("id", "s", "_pos")
    assert(scansColumnar(columnar) && !scansColumnar(row))
    val a = columnar.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = row.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.length === 50000 && a.sameElements(b))
  }
}
