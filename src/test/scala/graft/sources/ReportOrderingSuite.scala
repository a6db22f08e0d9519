package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SORTED-SCAN ORDERING (`SupportsReportOrdering`,
  * [[MemScan.outputOrdering]]): a scan whose every file was WRITTEN under
  * the table's current `write.sort-order` reports that ordering, and
  * Spark stops re-sorting data that is already sorted on disk. The
  * contract:
  *
  *   - ORDER BY the sort key over a compacted range-distributed table
  *     has NO Sort in the physical plan; with `read.report-ordering`
  *     off the Sort reappears and the answer is identical;
  *   - the gate is per-FILE: one file written before the order was
  *     declared suppresses reporting (never a wrong order), and
  *     `rewrite_data_files` converges the stamps;
  *   - bucketed+sorted twins merge-join with ZERO Exchange AND ZERO
  *     Sort — the 100 TB pattern: co-located AND co-sorted storage
  *     makes the join a pure streaming merge.
  */
class ReportOrderingSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ord")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ord.$name")
    s"$cat.ord.$name"
  }

  private def sorts(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: SortExec => s }.size
  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s }.size

  test("ORDER BY the sort key over a compacted range-distributed table " +
      "plans with NO Sort; the property off restores it, answers equal") {
    val t = fresh("rng")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.distribution-mode' = 'range')""")
    spark.range(0, 20000).selectExpr("pmod(id * 7919, 20000) AS k", "id AS v")
      .repartition(4).writeTo(t).append()
    // Range-distributed + compacted into ONE file: a single sorted task.
    spark.sql(s"CALL $cat.system.rewrite_data_files('ord.rng', 1000000)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      assert(sorts(q) === 0,
        s"a sorted single-file scan must satisfy ORDER BY without a " +
          s"Sort:\n${q.queryExecution.executedPlan}")
      val sorted = q.collect().map(_.getLong(0)).toSeq
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.report-ordering' = 'false')")
      val off = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      assert(sorts(off) === 1, "with reporting off the Sort must be paid")
      assert(off.collect().map(_.getLong(0)).toSeq === sorted,
        "reporting must never change the answer")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("the per-file gate: a file written BEFORE the order was declared " +
      "suppresses reporting; compaction converges the stamps") {
    val t = fresh("gate")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.range(0, 1000).selectExpr("id AS k", "id AS v").coalesce(1)
      .writeTo(t).append() // unsorted, unstamped
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('write.sort-order' = 'k', 'write.distribution-mode' = 'range')")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val before = spark.sql(s"SELECT k FROM $t ORDER BY k")
      assert(sorts(before) === 1,
        "a pre-declaration file must suppress ordering (it may not be sorted)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Compact under AQE (its shuffle coalescing is what shapes the range
    // write into one file at this size — the compacted target shape).
    spark.sql(s"CALL $cat.system.rewrite_data_files('ord.gate', 1000000)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val after = spark.sql(s"SELECT k FROM $t ORDER BY k")
      assert(sorts(after) === 0,
        s"after compaction every file is stamped:\n${after.queryExecution.executedPlan}")
      assert(after.collect().map(_.getLong(0)).toSeq === (0L until 1000L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a RENAME-SWAP cannot make stamps lie: field-id-keyed sort " +
      "stamps stop reporting when the property's name resolves to a " +
      "different column") {
    val t = fresh("swap")
    spark.sql(s"""CREATE TABLE $t (a BIGINT, b BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'a',
                     'write.distribution-mode' = 'range')""")
    spark.range(0, 5000).selectExpr("pmod(id * 7919, 5000) AS a", "id AS b")
      .writeTo(t).append()
    spark.sql(s"CALL $cat.system.rewrite_data_files('ord.swap', 1000000)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assert(sorts(spark.sql(s"SELECT a, b FROM $t ORDER BY a")) === 0,
        "fixture: stamps serve before the swap")
      // The trap: after the swap, property 'a' NAMES old b, but the
      // files are physically sorted by old a. Name-keyed stamps would
      // still match and elide a Sort the data does not satisfy.
      spark.sql(s"ALTER TABLE $t RENAME COLUMN a TO z")
      spark.sql(s"ALTER TABLE $t RENAME COLUMN b TO a")
      val q = spark.sql(s"SELECT a, z FROM $t ORDER BY a")
      assert(sorts(q) === 1,
        s"the swapped column must re-sort:\n${q.queryExecution.executedPlan}")
      assert(q.collect().map(_.getLong(0)).toSeq === (0L until 5000L),
        "and the answer must actually be ordered by the NEW a")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("MULTI-partition sorted ORDER BY: a range-distributed multi-FILE " +
      "table concatenates its partitions in range order — no Sort, no " +
      "Exchange; overlapping file ranges k-way merge instead") {
    val t = fresh("rngm")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.distribution-mode' = 'range')""")
    // Distinct keys (a permutation) so consecutive compacted files are
    // STRICTLY range-disjoint.
    spark.range(0, 40000).selectExpr("pmod(id * 7919, 40000) AS k", "id AS v")
      .repartition(4).writeTo(t).append()
    // Compact into MANY range-disjoint sorted files — the 100 TB shape.
    // (AQE off for the compaction too: its shuffle coalescing would fold
    // these small range partitions back into one file. The conf reset
    // rides the SAME finally as everything else — a fixture failure must
    // not leak AQE-off into later tests.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql(s"CALL $cat.system.rewrite_data_files('ord.rngm', 4000)")
      val files = SnapshotStore.stateOf(
        SnapshotStore.keyOf(cat, Seq("ord", "rngm"))).currentFiles
      assert(files.size > 3, s"fixture needs many files, got ${files.size}")
      val q = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      val plan = q.queryExecution.executedPlan
      assert(sorts(q) === 0 && shuffles(q) === 0,
        s"range-disjoint files must concatenate, not re-sort:\n$plan")
      val rc = plan.collect { case r: RangeConcatExec => r }
      assert(rc.nonEmpty, s"expected the RangeConcat node:\n$plan")
      // Strictly-disjoint UNSPLIT files: the exec may claim
      // RangePartitioning (every key value provably in one partition).
      assert(rc.head.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
        s"unsplit strict fixture must claim RangePartitioning, got " +
          s"${rc.head.outputPartitioning}")
      val rows = q.collect().map(_.getLong(0)).toSeq
      assert(rows === (0L until 40000L), "the order must actually hold")
      // A SPLIT sorted file still concatenates (slices of one sorted
      // file are ordered by byte offset) but must NOT claim clustering:
      // a key run crossing a slice boundary would live in two
      // partitions, and manifest stats cannot see inside the file.
      val ts = fresh("rngs")
      spark.sql(s"""CREATE TABLE $ts (k BIGINT, pad STRING)
        TBLPROPERTIES ('write.sort-order' = 'k',
                       'write.parquet.row-group-bytes' = '4096',
                       'read.split.target-bytes' = '16384')""")
      spark.range(0, 20000).selectExpr("id AS k", "repeat('x', 40) AS pad")
        .coalesce(1).writeTo(ts).append()
      val qs = spark.sql(s"SELECT k FROM $ts ORDER BY k")
      val plans = qs.queryExecution.executedPlan
      val rcs = plans.collect { case r: RangeConcatExec => r }
      assert(rcs.nonEmpty && sorts(qs) === 0,
        s"a split sorted file still concatenates:\n$plans")
      assert(!rcs.head.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
        "a split file must NOT claim RangePartitioning (intra-file " +
          "slice boundaries are unknowable)")
      assert(qs.collect().map(_.getLong(0)).toSeq === (0L until 20000L))
      // Property-off twin: the Sort reappears, the answer is identical.
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.report-ordering' = 'false')")
      val off = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      assert(sorts(off) === 1, "with reporting off the Sort must be paid")
      assert(off.collect().map(_.getLong(0)).toSeq === rows)
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.report-ordering' = 'true')")
      // A sorted APPEND makes ranges OVERLAP (it straddles several
      // compacted files): every file is stamped, concatenation is no
      // longer provable — but the K-WAY MERGE is: the append's stream
      // merges with exactly the files it straddles, untouched files
      // stay pass-through, still no Sort and no Exchange. (The append
      // writes through the table's range distribution; with AQE off a
      // 32-partition shuffle would mint 32 tiny straddling files and
      // push the overlap component past the merge fan-in bound — which
      // correctly keeps the Sort, but is not this pin. Shrink the
      // shuffle for the append so the component stays mergeable.)
      val shufBefore = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try spark.sql(s"INSERT INTO $t SELECT id AS k, id AS v FROM range(0, 5000)")
      finally spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
      val q2 = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      val plan2 = q2.queryExecution.executedPlan
      assert(sorts(q2) === 0 && shuffles(q2) === 0,
        s"sorted-overlapping files must merge, not re-sort:\n$plan2")
      assert(plan2.collect { case m: SortedMergeExec => m }.nonEmpty,
        s"expected the SortedMerge node:\n$plan2")
      val r2 = q2.collect().map(_.getLong(0)).toSeq
      assert(r2 === r2.sorted)
      assert(r2.length === rows.length + 5000)
      // Merge off (`read.merge-scan = false`): the Sort reappears, the
      // answer is identical — the A/B lever.
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.merge-scan' = 'false')")
      val moff = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      assert(sorts(moff) === 1,
        s"with merge planning off the Sort must be paid:\n" +
          moff.queryExecution.executedPlan)
      assert(moff.collect().map(_.getLong(0)).toSeq === r2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bucketed + sorted twins: SortMergeJoin with ZERO Exchange and " +
      "ZERO Sort (co-located, co-sorted storage)") {
    val a = fresh("smj_a")
    val b = fresh("smj_b")
    Seq(a -> "v", b -> "w").foreach { case (t, c) =>
      spark.sql(s"""CREATE TABLE $t (k BIGINT, $c BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('read.preserve-partitioning' = 'true',
                       'write.sort-order' = 'k')""")
    }
    // One write task: one sorted file per bucket (the compacted shape).
    spark.range(0, 4000).selectExpr("id AS k", "id * 2 AS v").coalesce(1)
      .writeTo(a).append()
    spark.range(0, 4000).selectExpr("id AS k", "id * 3 AS w").coalesce(1)
      .writeTo(b).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    try {
      val q = spark.table(a).join(spark.table(b), "k")
      val plan = q.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a SortMergeJoin:\n$plan")
      assert(shuffles(q) === 0, s"expected zero Exchange:\n$plan")
      assert(sorts(q) === 0,
        s"co-sorted buckets must merge-join without Sort nodes:\n$plan")
      assert(q.count() === 4000L)
      assert(q.selectExpr("sum(v + w)").head().getLong(0) ===
        (0L until 4000L).map(_ * 5).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.join.preferSortMergeJoin")
    }
  }
}
