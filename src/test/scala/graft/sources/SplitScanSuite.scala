package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SPLIT-BY-OFFSET scan planning: one big data file is cut into several
  * scan tasks on its recorded chunk boundaries (parquet row groups / grf
  * byte checkpoints carried in the manifest), so a compacted
  * one-file-per-partition table does not serialize its scan into one task
  * — and `_pos` row identity stays FILE-global, keeping position deletes
  * and row-level rewrites split-agnostic. */
class SplitScanSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.split")
    spark.sql(s"DROP TABLE IF EXISTS $cat.split.$name")
    s"$cat.split.$name"
  }

  /** Leaf scan task count of a freshly planned read of `sql`. */
  private def scanTasks(sql: String): Int = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n$plan")
    scans.map(_.inputRDD.getNumPartitions).sum
  }

  /** One wide single-task write so the table holds exactly ONE data file. */
  private def loadOneFile(t: String, rows: Int): Unit = {
    import spark.implicits._
    (0 until rows).map(i => (i.toLong, s"v$i-" + ("x" * 64), i % 7))
      .toDF("id", "payload", "bucket")
      .coalesce(1)
      .writeTo(t).append()
  }

  test("a one-file parquet table scans with N tasks (row-group splits), " +
      "rows and order semantics unchanged") {
    val t = fresh("pq")
    // Tiny row groups + tiny split target → several splits per file.
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096', " +
      "'read.split.target-bytes'='16384')")
    loadOneFile(t, 5000)
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("split", "pq")))
    assert(st.currentFiles.size === 1)
    val f = st.currentFiles.head
    assert(f.splitPoints.size > 4, s"expected many row groups, got ${f.splitPoints}")
    assert(f.sizeBytes > 0L)
    assert(scanTasks(s"SELECT * FROM $t") > 1)
    // Every row exactly once across splits.
    assert(spark.sql(s"SELECT count(*), count(DISTINCT id) FROM $t")
      .collect().head === Row(5000L, 5000L))
    assert(spark.sql(s"SELECT sum(id) FROM $t").collect().head.getLong(0) ===
      (0L until 5000L).sum)
  }

  test("a one-file grf table scans with N tasks (byte-checkpoint splits)") {
    val t = fresh("grf")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.format'='grf', 'write.grf.chunk-bytes'='8192', " +
      "'read.split.target-bytes'='16384')")
    loadOneFile(t, 5000)
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("split", "grf")))
    assert(st.currentFiles.size === 1)
    assert(st.currentFiles.head.splitPoints.size > 4)
    assert(scanTasks(s"SELECT * FROM $t") > 1)
    assert(spark.sql(s"SELECT count(*), count(DISTINCT id), sum(id) FROM $t")
      .collect().head === Row(5000L, 5000L, (0L until 5000L).sum))
  }

  test("split targets group chunks: a large target yields one task per file") {
    val t = fresh("whole")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096')") // default 128M target
    loadOneFile(t, 5000)
    assert(scanTasks(s"SELECT * FROM $t") === 1)
  }

  test("`_pos` identity is split-agnostic: a MOR delete lands on the same " +
      "rows whether the scan was split or not") {
    val t = fresh("morpos")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096', " +
      "'read.split.target-bytes'='16384', " +
      "'write.delete.mode'='merge-on-read')")
    loadOneFile(t, 5000)
    assert(scanTasks(s"SELECT * FROM $t") > 1) // the delete's scan IS split
    spark.sql(s"DELETE FROM $t WHERE id % 10 = 3")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 4500L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id % 10 = 3")
      .collect().head.getLong(0) === 0L)
    // Deleted positions skip in EVERY split of the follow-up read.
    assert(spark.sql(s"SELECT sum(id) FROM $t").collect().head.getLong(0) ===
      (0L until 5000L).filterNot(_ % 10 == 3).sum)
  }

  test("a COW rewrite over a split scan rewrites exactly once per row") {
    val t = fresh("cow")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096', " +
      "'read.split.target-bytes'='16384')")
    loadOneFile(t, 5000)
    spark.sql(s"UPDATE $t SET bucket = -1 WHERE id < 100")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 5000L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE bucket = -1")
      .collect().head.getLong(0) === 100L)
    assert(spark.sql(s"SELECT count(DISTINCT id) FROM $t")
      .collect().head.getLong(0) === 5000L)
  }

  test("split metadata survives the metadata log round-trip") {
    val t = fresh("durable")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096', " +
      "'read.split.target-bytes'='16384')")
    loadOneFile(t, 5000)
    val k = SnapshotStore.keyOf(cat, Seq("split", "durable"))
    val before = SnapshotStore.stateOf(k).currentFiles.head
    SnapshotStore.tables.clear() // "restart": reload from disk
    val after = SnapshotStore.stateOf(k).currentFiles.head
    assert(after.sizeBytes === before.sizeBytes)
    assert(after.splitPoints === before.splitPoints)
    assert(scanTasks(s"SELECT * FROM $t") > 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 5000L)
  }

  test("time travel and the changes relation read split files exactly") {
    val t = fresh("tt")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload STRING, bucket INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes'='4096', " +
      "'read.split.target-bytes'='16384')")
    loadOneFile(t, 3000) // v1
    spark.sql(s"INSERT INTO $t VALUES (99999, 'late', 0)") // v2
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1")
      .collect().head.getLong(0) === 3000L)
    val changes = spark.read.option("startingVersion", 1)
      .option("endingVersion", 1).table(s"$t.changes")
    assert(changes.count() === 3000L)
  }
}
