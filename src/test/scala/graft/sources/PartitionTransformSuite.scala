package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HIDDEN PARTITIONING (Iceberg partition transforms): writes route through
  * `days(ts)` / `bucket(n, id)` / `truncate(w, s)`, scans prune files by
  * pushing DATA predicates through the transform — the query never names a
  * partition column. Pins both the transform arithmetic (pre-1970 floors
  * included) and the scan volume ("fewer files opened, same answer"). */
class PartitionTransformSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ptx")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ptx.$name")
    s"$cat.ptx.$name"
  }

  private def state(name: String): SnapshotStore.TableState =
    SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("ptx", name)))

  /** The scan node's "(N rows, M files)" description after pushdown. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    val m = """graft-snapshot scan \((\d+) rows, (\d+) files\)""".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"no snapshot scan in plan:\n$plan"))
    m.group(2).toInt
  }

  // -- transform arithmetic (unit level) ------------------------------------

  test("time transform ordinals: epoch floors, pre-1970 toward -infinity") {
    val jan2_2024_noon = 1704196800000000L // 2024-01-02T12:00:00Z micros
    assert(PDays.eval(jan2_2024_noon, TimestampType) === 19724)
    assert(PHours.eval(jan2_2024_noon, TimestampType) === 19724 * 24 + 12)
    assert(PMonths.eval(jan2_2024_noon, TimestampType) === (2024 - 1970) * 12)
    assert(PYears.eval(jan2_2024_noon, TimestampType) === 54)
    // 1969-12-31T23:00Z — floorDiv must land on day -1, not day 0.
    val dec31_1969 = -3600000000L
    assert(PDays.eval(dec31_1969, TimestampType) === -1)
    assert(PHours.eval(dec31_1969, TimestampType) === -1)
    assert(PMonths.eval(dec31_1969, TimestampType) === -1)
    assert(PYears.eval(dec31_1969, TimestampType) === -1)
    // DateType source: the value already IS epoch days.
    assert(PDays.eval(19724, DateType) === 19724)
    assert(PMonths.eval(19724, DateType) === 648)
    assert(PDays.eval(null, TimestampType) === null)
  }

  test("truncate floors numbers toward -infinity and prefixes strings") {
    assert(PTruncate(10).eval(37L, LongType) === 30L)
    assert(PTruncate(10).eval(-7L, LongType) === -10L)
    assert(PTruncate(10).eval(-7, IntegerType) === -10)
    assert(PTruncate(3).eval(UTF8String.fromString("iceberg"), StringType)
      === UTF8String.fromString("ice"))
    assert(PTruncate(9).eval(UTF8String.fromString("short"), StringType)
      === UTF8String.fromString("short"))
  }

  test("bucket is deterministic, in range, and widening-stable (int 5 == long 5)") {
    val b = PBucket(8)
    val vals = (0L until 100L).map(v => b.eval(v, LongType).asInstanceOf[Int])
    assert(vals.forall(v => v >= 0 && v < 8))
    assert(vals.distinct.size > 1, "hash must spread values")
    assert(b.eval(5, IntegerType) === b.eval(5L, LongType))
    assert(b.eval(UTF8String.fromString("x"), StringType) ===
      b.eval(UTF8String.fromString("x"), StringType))
  }

  // -- write routing + scan pruning -----------------------------------------

  test("days(ts): one file per day per task; a ts range opens only its days") {
    val t = fresh("bydays")
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    // 6 days × 4 rows, single task → exactly 6 files, partitioned by day.
    spark.sql(s"""INSERT INTO $t
      SELECT id, timestamp'2024-01-10 06:00:00' + make_interval(0,0,0,CAST(id % 6 AS INT),0,0,id),
             CAST(id AS DOUBLE)
      FROM range(0, 24, 1, 1)""")
    val fs = state("bydays").currentFiles
    assert(fs.size === 6, fs.map(f => f.path -> f.partitionValues))
    // Partition values are day ordinals (2024-01-10 = epoch day 19732).
    assert(fs.map(_.partitionValues.head).toSet ===
      (19732 to 19737).map(d => d: Any).toSet)

    val q = spark.sql(s"SELECT sum(v) FROM $t WHERE " +
      "ts >= timestamp'2024-01-12 00:00:00' AND ts < timestamp'2024-01-14 00:00:00'")
    assert(scannedFiles(q) === 2, "2-day range must open exactly 2 day files")
    assert(q.collect().head.getDouble(0) ===
      (0 until 24).filter(i => i % 6 == 2 || i % 6 == 3).map(_.toDouble).sum)

    val point = spark.sql(s"SELECT count(*) FROM $t WHERE ts = timestamp'2024-01-11 06:00:01'")
    assert(scannedFiles(point) === 1)
    assert(point.collect().head.getLong(0) === 1L)
  }

  test("bucket(4, id): equality and IN prune to the key's bucket files") {
    val t = fresh("bybucket")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(0, 100, 1, 1)")
    val fs = state("bybucket").currentFiles
    // One file per NON-EMPTY bucket (the hash need not hit all 4 on this
    // key set) — pinned against the transform's own assignment.
    val buckets = (0L until 100L).map(PBucket(4).eval(_, LongType)).toSet
    assert(fs.map(_.partitionValues.head).toSet === buckets,
      fs.map(_.partitionValues))

    val q = spark.sql(s"SELECT v FROM $t WHERE id = 42")
    assert(scannedFiles(q) === 1, "point lookup must open one bucket file")
    assert(q.collect().toSeq === Seq(Row("v42")))

    val in = spark.sql(s"SELECT count(*) FROM $t WHERE id IN (1, 2, 3)")
    assert(scannedFiles(in) <= 3)
    assert(in.collect().head.getLong(0) === 3L)

    // A range predicate cannot prune BUCKETS (non-monotonic) — any
    // narrowing here comes from the per-file id min/max STATS channel
    // (which may legitimately skip buckets whose ids all sit >= 10).
    val r = spark.sql(s"SELECT count(*) FROM $t WHERE id < 10")
    assert(scannedFiles(r) <= buckets.size)
    assert(r.collect().head.getLong(0) === 10L)
  }

  test("truncate(3, s): prefix routing; string ranges prune") {
    val t = fresh("bytrunc")
    spark.sql(s"CREATE TABLE $t (s STRING, n BIGINT) " +
      "PARTITIONED BY (truncate(3, s))")
    spark.sql(s"INSERT INTO $t VALUES ('apple', 1), ('apric', 2), " +
      "('banjo', 3), ('bongo', 4), ('cedar', 5)")
    val fs = state("bytrunc").currentFiles
    assert(fs.map(_.partitionValues.head.toString).toSet ===
      Set("app", "apr", "ban", "bon", "ced"))

    val q = spark.sql(s"SELECT sum(n) FROM $t WHERE s >= 'b' AND s < 'c'")
    assert(scannedFiles(q) === 2, "b-range must open ban + bon only")
    assert(q.collect().head.getLong(0) === 7L)

    val eq = spark.sql(s"SELECT n FROM $t WHERE s = 'cedar'")
    assert(scannedFiles(eq) === 1)
    assert(eq.collect().toSeq === Seq(Row(5L)))
  }

  test("NULL source values route to a null partition; IS [NOT] NULL prunes") {
    val t = fresh("withnull")
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $t VALUES (1, timestamp'2024-03-01 00:00:00'), " +
      "(2, NULL), (3, timestamp'2024-03-02 00:00:00')")
    val fs = state("withnull").currentFiles
    assert(fs.size === 3)
    assert(fs.count(_.partitionValues.head == null) === 1)

    val nulls = spark.sql(s"SELECT id FROM $t WHERE ts IS NULL")
    assert(scannedFiles(nulls) === 1, "IS NULL must open only the null-day file")
    assert(nulls.collect().toSeq === Seq(Row(2L)))

    val notNulls = spark.sql(s"SELECT count(*) FROM $t WHERE ts IS NOT NULL")
    assert(scannedFiles(notNulls) === 2)
    assert(notNulls.collect().head.getLong(0) === 2L)

    // A range predicate also excludes the all-null file (NULL never matches).
    val r = spark.sql(s"SELECT count(*) FROM $t WHERE ts >= timestamp'2024-03-02 00:00:00'")
    assert(scannedFiles(r) === 1)
    assert(r.collect().head.getLong(0) === 1L)
  }

  test("transforms survive the metadata log: restart, reload, still pruning") {
    val t = fresh("durable")
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(2, id))")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "timestamp'2024-02-01 12:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) " +
      "FROM range(0, 12, 1, 1)")
    val before = state("durable")
    assert(before.partitionTransforms === Seq(PDays, PBucket(2)))

    SnapshotStore.tables.clear() // restart: reload from the durable log
    val after = state("durable")
    assert(after.partitionTransforms === Seq(PDays, PBucket(2)))
    assert(after.currentFiles.map(_.partitionValues).toSet ===
      before.currentFiles.map(_.partitionValues).toSet)

    val q = spark.sql(s"SELECT count(*) FROM $t WHERE " +
      "ts >= timestamp'2024-02-02 00:00:00' AND ts < timestamp'2024-02-03 00:00:00'")
    assert(scannedFiles(q) <= 2, "one day x two buckets after reload")
    assert(q.collect().head.getLong(0) === 4L)

    // `.files` renders transformed labels, not raw column names.
    val labels = spark.sql(s"SELECT partition FROM $t.`files`")
      .collect().map(_.getString(0))
    assert(labels.forall(l => l.startsWith("ts_day=") && l.contains("id_bucket=")),
      labels.toSeq)
  }

  test("row-level DELETE and time travel work on a transform-partitioned table") {
    val t = fresh("rowlevel")
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "timestamp'2024-04-01 08:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT),0,0,0) " +
      "FROM range(0, 10, 1, 1)")
    // The ts predicate is NOT metadata-decidable (transform field) — it
    // must fall to the row-level rewrite and still only touch day files
    // that can match.
    spark.sql(s"DELETE FROM $t WHERE ts >= timestamp'2024-04-02 00:00:00'")
    assert(spark.table(t).count() === 5L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1")
      .collect().head.getLong(0) === 10L)
    // The day-1 file survived by path identity (never scanned/rewritten).
    val v1 = SnapshotStore.filesAt(
      SnapshotStore.keyOf(cat, Seq("ptx", "rowlevel")), 1L).map(_.path).toSet
    val now = state("rowlevel").currentFiles.map(_.path).toSet
    assert((v1 intersect now).size === 1)
  }

  test("unsupported transform types and unknown transforms fail loudly at CREATE") {
    val t = fresh("badcreate")
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $t (id BIGINT, v STRING) PARTITIONED BY (days(v))"))
    assert(e1.getMessage.contains("does not accept"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $t (id BIGINT, v DOUBLE) PARTITIONED BY (truncate(3, v))"))
    assert(e2.getMessage.contains("does not accept"), e2.getMessage)
  }
}
