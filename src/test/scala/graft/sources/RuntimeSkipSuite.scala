package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** RUNTIME data-column FILE skipping ([[RuntimeFilePruning]]): the fact
  * side of a star join pruned at execution by the dimension's ACTUAL
  * join keys, at manifest-stats granularity — partition-style dynamic
  * pruning with no partitioning declared. The scan reports the leading
  * sort column (range-clustered by compaction) and bloom columns as
  * dynamically filterable; Spark plans the dim-side subquery; the
  * delivered IN-list drops files whose [min, max] box or bloom proves
  * them empty. Sound like static stats pushdown: predicates stay
  * residual, a file drops only when NO row can match. */
class RuntimeSkipSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rs")
    spark.sql(s"DROP TABLE IF EXISTS $cat.rs.$name")
    s"$cat.rs.$name"
  }

  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case n => Seq(n)
    }
  /** The fact-side MemScan: the one carrying runtime filters. */
  private def runtimeScan(p: SparkPlan): Option[MemScan] =
    nodes(p).collectFirst {
      case b: BatchScanExec if b.runtimeFilters.nonEmpty =>
        b.scan.asInstanceOf[MemScan]
    }

  test("star join runtime-skips fact files on the SORTED key: the dim's " +
      "actual keys open one file of eight, no partitioning declared") {
    val fact = fresh("factsort")
    spark.sql(s"""CREATE TABLE $fact (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.distribution-mode' = 'range')""")
    spark.range(0, 16000).selectExpr("id AS k", "id AS v")
      .repartition(4).writeTo(fact).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql(s"CALL $cat.system.rewrite_data_files('rs.factsort', 2000)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(SnapshotStore.stateOf(SnapshotStore.keyOf(cat,
      Seq("rs", "factsort"))).currentFiles.size >= 6, "fixture: many files")
    val dim = fresh("dimsort")
    spark.sql(s"CREATE TABLE $dim (k BIGINT, grp STRING)")
    // Keys clustered inside ONE fact file's range; a decoy group proves
    // the dim's static filter (not the whole dim) feeds the pruning.
    spark.sql(s"INSERT INTO $dim VALUES (100, 'a'), (150, 'a'), " +
      "(180, 'a'), (9000, 'z')")
    val q = spark.sql(s"SELECT sum(f.v) AS s FROM $fact f JOIN $dim d " +
      "ON f.k = d.k WHERE d.grp = 'a'")
    assert(q.collect().head.getLong(0) === 100L + 150L + 180L)
    val scan = runtimeScan(finalPlan(q)).getOrElse(
      fail(s"no runtime-filtered scan:\n${finalPlan(q)}"))
    assert(scan.currentFileCount <= 2,
      s"the dim's keys land in one sorted file; opened " +
        s"${scan.currentFileCount}")
  }

  test("star join runtime-skips fact files through the BLOOM on a " +
      "scattered key min/max cannot prune") {
    val fact = fresh("factbloom")
    spark.sql(s"""CREATE TABLE $fact (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats.bloom-columns' = 'k')""")
    // Interleaved commits: every file's k range covers the whole domain.
    for (j <- 0 until 4)
      spark.sql(s"INSERT INTO $fact SELECT id * 4 + $j AS k, id AS v " +
        "FROM range(0, 2000, 1, 1)")
    val dim = fresh("dimbloom")
    spark.sql(s"CREATE TABLE $dim (k BIGINT, grp STRING)")
    // Both keys ≡ 1 (mod 4): only the j = 1 file can hold them.
    spark.sql(s"INSERT INTO $dim VALUES (5, 'a'), (401, 'a'), (6, 'z')")
    val q = spark.sql(s"SELECT sum(f.v) AS s FROM $fact f JOIN $dim d " +
      "ON f.k = d.k WHERE d.grp = 'a'")
    assert(q.collect().head.getLong(0) === 1L + 100L)
    val scan = runtimeScan(finalPlan(q)).getOrElse(
      fail(s"no runtime-filtered scan:\n${finalPlan(q)}"))
    assert(scan.currentFileCount === 1,
      s"blooms must keep only the ≡1 (mod 4) file; opened " +
        s"${scan.currentFileCount}")
  }

  test("read.runtime-file-skipping = false stops reporting — no runtime " +
      "filter plans, identical answer") {
    val fact = fresh("factoff")
    spark.sql(s"""CREATE TABLE $fact (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'read.runtime-file-skipping' = 'false')""")
    spark.range(0, 4000).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo(fact).append()
    val dim = fresh("dimoff")
    spark.sql(s"CREATE TABLE $dim (k BIGINT, grp STRING)")
    spark.sql(s"INSERT INTO $dim VALUES (7, 'a'), (11, 'a')")
    val q = spark.sql(s"SELECT sum(f.v) AS s FROM $fact f JOIN $dim d " +
      "ON f.k = d.k WHERE d.grp = 'a'")
    assert(q.collect().head.getLong(0) === 18L)
    assert(runtimeScan(finalPlan(q)).isEmpty,
      s"the off-switch must stop reporting:\n${finalPlan(q)}")
  }

  test("soundness: runtime skipping never changes a join's answer " +
      "(A/B against the off-switch, several key shapes)") {
    val on = fresh("ab_on")
    val off = fresh("ab_off")
    for ((t, extra) <- Seq(on -> "", off -> ", 'read.runtime-file-skipping' = 'false'"))
      spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
        TBLPROPERTIES ('write.sort-order' = 'k',
                       'stats.bloom-columns' = 'k'$extra)""")
    for (t <- Seq(on, off); j <- 0 until 3)
      spark.sql(s"INSERT INTO $t SELECT id * 3 + $j AS k, id AS v " +
        "FROM range(0, 500, 1, 1)")
    val dim = fresh("ab_dim")
    spark.sql(s"CREATE TABLE $dim (k BIGINT, grp STRING)")
    spark.sql(s"INSERT INTO $dim VALUES (3, 'a'), (4, 'a'), (5, 'a'), " +
      "(1000000, 'a'), (7, 'b')")
    for (pred <- Seq("d.grp = 'a'", "d.grp = 'b'", "d.grp IN ('a', 'b')")) {
      val a = spark.sql(s"SELECT f.k, f.v FROM $on f JOIN $dim d " +
        s"ON f.k = d.k WHERE $pred ORDER BY f.k").collect().toSeq
      val b = spark.sql(s"SELECT f.k, f.v FROM $off f JOIN $dim d " +
        s"ON f.k = d.k WHERE $pred ORDER BY f.k").collect().toSeq
      assert(a === b, s"answers diverged under '$pred'")
    }
  }
}
