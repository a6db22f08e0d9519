package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** STORAGE-PARTITIONED JOINS over the snapshot catalog: two tables
  * partitioned by the same transform spec (`bucket(8, k)`, identity, …)
  * and opted into `read.preserve-partitioning` join with ZERO Exchange —
  * the scans report `KeyGroupedPartitioning`, the catalog's
  * FunctionCatalog face resolves the transforms, and EnsureRequirements
  * matches the sides by the bound function's canonical name. At 100 TB
  * this is the persisted-store probe pattern: the big bucketed side is
  * never re-shuffled. Values are pinned against the shuffled twin. */
class StoragePartitionedJoinSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.spj")
    spark.sql(s"DROP TABLE IF EXISTS $cat.spj.$name")
    s"$cat.spj.$name"
  }

  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }.size

  private def scans(df: DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  /** Both fixture tables, same spec, preserve-partitioning on. */
  private def buildPair(spec: String, suffix: String): (String, String) = {
    val a = fresh(s"a_$suffix")
    val b = fresh(s"b_$suffix")
    spark.sql(s"""CREATE TABLE $a (k BIGINT, v BIGINT)
      PARTITIONED BY ($spec)
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.sql(s"""CREATE TABLE $b (k BIGINT, w BIGINT)
      PARTITIONED BY ($spec)
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v")
      .writeTo(a).append()
    spark.range(0, 3000).selectExpr("id AS k", "id * 3 AS w")
      .writeTo(b).append()
    (a, b)
  }

  /** The bare join — no aggregate on top, so the ONLY possible Exchange
    * in the plan is one feeding the join itself. */
  private def joined(a: String, b: String): DataFrame =
    spark.table(a).join(spark.table(b), "k")

  private def check(q: DataFrame, expectedRows: Long, expectedSum: Long): Unit = {
    val r = q.agg(count(lit(1)).as("n"), sum(expr("v + w")).as("s")).head()
    assert(r.getLong(0) === expectedRows)
    assert(r.getLong(1) === expectedSum)
  }

  test("bucket(8,k) x bucket(8,k): zero Exchange, exact answer") {
    val (a, b) = buildPair("bucket(8, k)", "bucket")
    // AQE off: the pin is the STATIC storage-partitioned plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined(a, b)
      assert(scans(q).size === 2, "both sides must be catalog scans")
      assert(shuffles(q) === 0,
        s"expected a storage-partitioned join with no Exchange:\n${q.queryExecution.executedPlan}")
      check(q, 2000L, (0L until 2000L).map(i => i * 5).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("identity-partitioned tables co-locate the same way") {
    val (a, b) = buildPair("k", "ident")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined(a, b)
      assert(shuffles(q) === 0,
        s"identity spec should co-locate:\n${q.queryExecution.executedPlan}")
      check(q, 2000L, (0L until 2000L).map(i => i * 5).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("without the opt-in property the join shuffles (and agrees)") {
    val a = fresh("a_noopt")
    val b = fresh("b_noopt")
    spark.sql(s"CREATE TABLE $a (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $b (k BIGINT, w BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v").writeTo(a).append()
    spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS w").writeTo(b).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined(a, b)
      assert(shuffles(q) > 0, "no opt-in => ordinary shuffled join")
      check(q, 2000L, (0L until 2000L).map(i => i * 5).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("mixed partition-spec history reports unknown and still answers") {
    val a = fresh("a_mixed")
    spark.sql(s"""CREATE TABLE $a (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(8, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.range(0, 500).selectExpr("id AS k", "id AS v").writeTo(a).append()
    spark.sql(s"CALL $cat.system.evolve_partition_spec('spj.a_mixed', 'bucket(4, k)')")
    spark.range(500, 1000).selectExpr("id AS k", "id AS v").writeTo(a).append()
    val (b, _) = (fresh("b_mixed"), ())
    spark.sql(s"""CREATE TABLE $b (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.range(0, 1000).selectExpr("id AS k", "id AS w").writeTo(b).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined(a, b)
      // Old-spec files make grouping unsound — the scan must NOT claim it.
      assert(shuffles(q) > 0, "mixed specs must fall back to shuffling")
      check(q, 1000L, (0L until 1000L).map(i => i * 2).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partially-clustered distribution: a multi-file probe keeps its " +
      "per-file splits and the store side replicates — zero Exchange, " +
      "parallelism above the group count") {
    val store = fresh("store_pc")
    val probe = fresh("probe_pc")
    spark.sql(s"""CREATE TABLE $store (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(8, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.sql(s"""CREATE TABLE $probe (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(8, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS w")
      .writeTo(store).append()
    // Several appends → several files PER BUCKET on the probe: fully
    // grouped SPJ would merge them into 8 tasks (the skew trap at 100 TB
    // — one huge key group = one straggler task); partially-clustered
    // keeps the probe's splits and replicates the store's matching group
    // to each, still with ZERO Exchange.
    (0 until 3).foreach { _ =>
      spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v")
        .writeTo(probe).append()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
      "true")
    try {
      val q = spark.table(probe).join(spark.table(store), "k")
      assert(shuffles(q) === 0,
        s"partially-clustered SPJ must not add an Exchange:\n${q.queryExecution.executedPlan}")
      val tasks = q.queryExecution.toRdd.getNumPartitions
      assert(tasks > 8,
        s"expected per-split tasks (> 8 bucket groups), got $tasks — " +
          "the probe side was fully grouped")
      check(q, 6000L, 3L * (0L until 2000L).map(i => i * 5).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    }
  }

  test("split-planned files keep grouping: splits of one bucket share a task group") {
    val a = fresh("a_split")
    val b = fresh("b_split")
    spark.sql(s"""CREATE TABLE $a (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true',
        'write.parquet.row-group-bytes'='32768',
        'read.split.target-bytes'='32768')""")
    spark.sql(s"""CREATE TABLE $b (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('read.preserve-partitioning'='true')""")
    spark.range(0, 100000).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo(a).append()
    spark.range(0, 1000).selectExpr("id AS k", "id AS w").writeTo(b).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined(a, b)
      assert(shuffles(q) === 0,
        s"ranged splits share their file's partition key:\n${q.queryExecution.executedPlan}")
      check(q, 1000L, (0L until 1000L).map(i => i * 2).sum)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
