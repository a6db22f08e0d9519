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

  test("zorder(a, b) layout: compaction z-clusters BOTH dimensions — a " +
      "point predicate on either column opens a fraction of the files, " +
      "where the linear 'a, b' twin prunes only its leading column") {
    val tz = fresh("z")
    val tl = fresh("zlin")
    spark.sql(s"CREATE TABLE $tz (a BIGINT, b BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a, b)')")
    spark.sql(s"CREATE TABLE $tl (a BIGINT, b BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='a, b')")
    // A 64×64 grid, 16 rows per cell, inserted in shuffled order.
    val src = spark.range(0, 65536).selectExpr(
      "CAST(hash(id) % 64 AS BIGINT) + 64 AS a",
      "CAST((id DIV 64) % 64 AS BIGINT) AS b",
      "CAST(id AS STRING) AS v")
    src.writeTo(tz).append()
    src.writeTo(tl).append()
    spark.sql(s"CALL $cat.system.rewrite_data_files('so.z', 4096)")
    spark.sql(s"CALL $cat.system.rewrite_data_files('so.zlin', 4096)")
    val zAll = scannedFiles(s"SELECT * FROM $tz")
    val lAll = scannedFiles(s"SELECT * FROM $tl")
    assert(zAll >= 8, s"fixture: want several z files, got $zAll")
    // Trailing-column point predicate: the z layout tiles BOTH
    // dimensions, the linear layout leaves b unclustered inside every
    // run of a — z must open strictly fewer files.
    val zB = scannedFiles(s"SELECT * FROM $tz WHERE b = 7")
    val lB = scannedFiles(s"SELECT * FROM $tl WHERE b = 7")
    assert(zB * 2 <= zAll, s"z layout must prune on b: $zB of $zAll")
    assert(zB < lB || lB == lAll,
      s"linear layout cannot prune the trailing column: z=$zB lin=$lB/$lAll")
    // Leading-dimension predicate still prunes on the z layout too.
    val zA = scannedFiles(s"SELECT * FROM $tz WHERE a = 71")
    assert(zA * 2 <= zAll, s"z layout must prune on a: $zA of $zAll")
    // Answers identical to the linear twin (layout never changes rows).
    assert(spark.sql(s"SELECT * FROM $tz WHERE b = 7").collect().map(_.toString).sorted
      === spark.sql(s"SELECT * FROM $tl WHERE b = 7").collect().map(_.toString).sorted)
  }

  test("zorder normalization: dimensions far above the low 31 bits still " +
      "cluster (manifest min/max rescale the Morton inputs); the " +
      "write path itself z-sorts under range distribution") {
    val t = fresh("zwide")
    spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a, b)', " +
      "'write.distribution-mode'='range')")
    // a lives ONLY in bits 32+ — a raw low-31-bit interleave sees zero
    // variation; the manifest-normalized key must still tile it. The
    // insert itself runs the V2 `zorder2` ordering through the ordered
    // (range) distribution — the write-path seam.
    spark.range(0, 16384).selectExpr(
      "CAST(shiftleft(CAST(hash(id) % 32 AS BIGINT) + 32, 32) AS BIGINT) AS a",
      "CAST((id DIV 32) % 32 AS BIGINT) AS b")
      .writeTo(t).append()
    val st0 = SnapshotStore.stateOf(keyOf("zwide"))
    assert(st0.currentFiles.nonEmpty &&
      st0.currentFiles.forall(_.sortKey.startsWith("z:")),
      s"the range-mode write must stamp z keys: ${st0.currentFiles.map(_.sortKey)}")
    // Compaction under range mode would hand its shuffle to AQE (which
    // coalesces this tiny fixture to one file) — drop to the task-local
    // z-sort so the explicit range repartition keeps its file count.
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('write.distribution-mode')")
    spark.sql(s"CALL $cat.system.rewrite_data_files('so.zwide', 1024)")
    val all = scannedFiles(s"SELECT * FROM $t")
    assert(all >= 12, s"fixture: want many files, got $all")
    val hit = scannedFiles(
      s"SELECT * FROM $t WHERE a = ${7L << 32}")
    assert(hit * 2 <= all,
      s"normalized z key must prune a high-bit dimension: $hit of $all")
    val hitB = scannedFiles(s"SELECT * FROM $t WHERE b = 3")
    assert(hitB * 2 <= all, s"and the low dimension: $hitB of $all")
  }

  test("zorder spec validation: malformed forms, unknown and non-integral " +
      "columns refuse at CREATE/SET; files stamp a z sortKey (never a " +
      "linear ordering report)") {
    val t = fresh("zval")
    intercept[Exception](spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a)')"))
    intercept[Exception](spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a, nope)')"))
    intercept[Exception](spark.sql(s"CREATE TABLE $t (a BIGINT, s STRING) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a, s)')"))
    intercept[Exception](spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) " +
      s"TBLPROPERTIES ('${SortOrders.Prop}'='zorder(a, a)')"))
    spark.sql(s"CREATE TABLE $t (a BIGINT, b BIGINT)")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      s"('${SortOrders.Prop}'='zorder(a, b)')")
    spark.sql(s"INSERT INTO $t SELECT id % 9, id % 7 FROM range(0, 200)")
    val st = SnapshotStore.stateOf(keyOf("zval"))
    val aId = FieldIds.requireId(st.schema, "a")
    val bId = FieldIds.requireId(st.schema, "b")
    assert(st.currentFiles.nonEmpty &&
      st.currentFiles.forall(_.sortKey == s"z:$aId,$bId"),
      s"z writes must stamp the z key, got ${st.currentFiles.map(_.sortKey)}")
    // And the z stamp never reports a LINEAR ordering to scans.
    assert(SortOrders.of(st.properties, st.schema) === Nil)
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
