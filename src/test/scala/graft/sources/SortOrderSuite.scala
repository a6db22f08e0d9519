package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `write.sort-order` table metadata ([[SortOrders]]): writes sort rows
  * before they reach the file writers (Spark's
  * RequiresDistributionAndOrdering — no writer-side buffering), and
  * compaction RESTORES the clustering globally, so per-file sort-key
  * stats stay tight and a range predicate opens few files. */
class SortOrderSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.so")
    spark.sql(s"DROP TABLE IF EXISTS $cat.so.$name")
    s"$cat.so.$name"
  }
  private def keyOf(name: String) = SnapshotStore.keyOf(cat, Seq("so", name))

  private def scannedFiles(sql: String): Long =
    spark.sql(sql).queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions
    }.sum.toLong

  test("a range-distributed write against a sorted table lands range-" +
      "clustered (per-file min/max of a shuffled insert near-disjoint)") {
    val t = fresh("w")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='k', " +
      "'write.distribution-mode'='range')")
    // A deliberately shuffled frame: without the declared order each task's
    // file would span the whole key range.
    spark.range(0, 10000).selectExpr("CAST(hash(id) % 10000 AS BIGINT) AS k",
      "CAST(id AS STRING) AS v").writeTo(t).append()
    val st = SnapshotStore.stateOf(keyOf("w"))
    val kId = FieldIds.requireId(st.schema, "k")
    val files = st.currentFiles.filter(_.rowCount > 1)
    assert(files.nonEmpty)
    // With a global sort requirement Spark range-partitions the write, so
    // the per-file [min,max] spans must not all cover the whole range:
    // total span of files ≈ the key range, not files × range.
    val spans = files.map { f =>
      val s = f.stats(kId)
      s.max.asInstanceOf[Long] - s.min.asInstanceOf[Long]
    }
    val range = 10000L + 10000L // hash % can be negative: ~[-10000, 10000]
    assert(spans.sum <= range * 3 / 2,
      s"files must cover near-disjoint ranges, got spans=$spans")
  }

  test("compaction restores clustering: overlapping small files fold into " +
      "range-disjoint files and a key-range predicate opens fewer") {
    val t = fresh("c")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='k', " +
      "'write.parquet.row-group-bytes'='65536')")
    // Four commits, EACH spanning the full key range — every file overlaps
    // every range predicate before compaction.
    (0 until 4).foreach { i =>
      spark.range(0, 4000).selectExpr(s"CAST((id * 7 + $i) % 4000 AS BIGINT) AS k",
        "repeat('x', 64) AS v").writeTo(t).append()
    }
    val before = scannedFiles(s"SELECT * FROM $t WHERE k BETWEEN 100 AND 120")
    val allBefore = scannedFiles(s"SELECT * FROM $t")
    assert(before === allBefore, "pre-compaction files all overlap the range")
    spark.sql(s"CALL $cat.system.rewrite_data_files('so.c', 4000)")
    val after = scannedFiles(s"SELECT * FROM $t WHERE k BETWEEN 100 AND 120")
    val allAfter = scannedFiles(s"SELECT * FROM $t")
    assert(allAfter > 1, s"compaction target must keep several files: $allAfter")
    assert(after < allAfter,
      s"post-compaction range predicate must skip files: $after of $allAfter")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE k BETWEEN 100 AND 120")
      .collect().head.getLong(0) === 84L) // 21 keys x 4 rows
  }

  test("sort order is validated at CREATE and SET; DESC parses; unknown " +
      "columns are refused") {
    val t = fresh("v")
    intercept[Exception](spark.sql(
      s"CREATE TABLE $t (a BIGINT) TBLPROPERTIES ('${SortOrders.Prop}'='nope')"))
    spark.sql(s"CREATE TABLE $t (a BIGINT, b STRING)")
    intercept[Exception](spark.sql(
      s"ALTER TABLE $t SET TBLPROPERTIES ('${SortOrders.Prop}'='a SIDEWAYS')"))
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('${SortOrders.Prop}'='a DESC, b')")
    assert(SortOrders.of(SnapshotStore.stateOf(keyOf("v")).properties,
      SnapshotStore.stateOf(keyOf("v")).schema) === Seq(("a", false), ("b", true)))
    spark.sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'y')")
    assert(spark.sql(s"SELECT a FROM $t ORDER BY a").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L))
  }
}
