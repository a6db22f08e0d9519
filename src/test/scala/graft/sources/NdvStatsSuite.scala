package graft.sources

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** NDV sketches in manifests ([[NdvSketch]]: per-file HLL registers next
  * to min/max/nulls, merged slot-wise at plan time) feeding
  * `estimateStatistics().columnStats()` — the distinct counts cost-based
  * join reordering needs to see CATALOG-table cardinalities. Pins the
  * sketch's accuracy, the metadata-log round-trip, widening stability,
  * and the CBO consequence: stats flip a deliberately bad join order on
  * catalog tables with NO ANALYZE step (the manifests ARE the stats). */
class NdvStatsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ndv")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ndv.$name")
    s"$cat.ndv.$name"
  }

  test("sketch accuracy: within ~10% at 512 registers") {
    Seq(100L, 5000L, 100000L).foreach { n =>
      val sk = NdvSketch.empty
      (0L until n).foreach(i =>
        NdvSketch.hash(i, LongType).foreach(sk.add))
      val est = sk.estimate
      assert(math.abs(est - n) <= math.max(4, n / 10),
        s"estimate $est too far from true $n")
    }
  }

  test("int and widened-long values hash identically; strings tracked") {
    assert(NdvSketch.hash(5, IntegerType) === NdvSketch.hash(5L, LongType))
    assert(NdvSketch.hash(1.5f, FloatType) === NdvSketch.hash(1.5d, DoubleType))
    assert(NdvSketch.hash(UTF8String.fromString("x"), StringType).isDefined)
  }

  test("merge across files == sketch of the union") {
    val a = NdvSketch.empty
    val b = NdvSketch.empty
    val whole = NdvSketch.empty
    (0L until 3000L).foreach { i =>
      val h = NdvSketch.hash(i, LongType).get
      if (i % 2 == 0) a.add(h) else b.add(h)
      whole.add(h)
    }
    assert(a.mergeInPlace(b).estimate === whole.estimate)
  }

  test("manifest round-trip: NDV survives restart, scan reports distinct counts") {
    val t = fresh("roundtrip")
    spark.range(0, 10000)
      .selectExpr("id", "id % 37 AS small", "concat('u', id % 500) AS s")
      .writeTo(t).create()
    def distinctOf(col: String): Option[Long] = {
      val scan = spark.table(t).queryExecution.optimizedPlan.collectLeaves().head
      val stats = scan.stats.attributeStats
      stats.find(_._1.name == col).flatMap(_._2.distinctCount).map(_.toLong)
    }
    // CBO stats conversion is gated on the conf.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      SnapshotStore.tables.clear() // "restart": reload manifests from disk
      val id = distinctOf("id")
      val small = distinctOf("small")
      val s = distinctOf("s")
      assert(id.exists(v => math.abs(v - 10000) <= 1000), s"id ndv: $id")
      assert(small.exists(v => math.abs(v - 37) <= 4), s"small ndv: $small")
      assert(s.exists(v => math.abs(v - 500) <= 50), s"s ndv: $s")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  /** Leaf relation names in join-tree order (left-deep traversal). */
  private def joinLeafOrder(plan: LogicalPlan): Seq[String] = plan match {
    case j: Join => joinLeafOrder(j.left) ++ joinLeafOrder(j.right)
    case other => other.collectLeaves().map(_.toString.linesIterator
      .next().trim)
  }

  test("CBO join reorder on catalog tables: manifest stats flip the order") {
    val fa = fresh("fact_a")
    val fb = fresh("fact_b")
    val d = fresh("dim")
    spark.range(0, 20000)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS xa").writeTo(fa).create()
    spark.range(0, 20000)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS xb").writeTo(fb).create()
    spark.range(0, 8)
      .selectExpr("id AS k", "CAST(id AS STRING) AS name").writeTo(d).create()
    val sql = s"""SELECT count(*) AS n
      FROM $fa a JOIN $fb b ON a.k = b.k JOIN $d dm ON a.k = dm.k"""
    def leafOrder(cbo: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      val plan = spark.sql(sql).queryExecution.optimizedPlan
      val join = plan.collectFirst { case j: Join => j }
        .getOrElse(fail("no join in optimized plan"))
      joinLeafOrder(join).map {
        case s if s.contains("fact_a") => "fact_a"
        case s if s.contains("fact_b") => "fact_b"
        case s if s.contains("dim") => "dim"
        case s => s
      }
    }
    try {
      val without = leafOrder(cbo = false)
      val withCbo = leafOrder(cbo = true)
      assert(without === Seq("fact_a", "fact_b", "dim"),
        s"baseline should keep the written (bad) order, got $without")
      assert(withCbo.take(2).contains("dim"),
        s"CBO + manifest NDV should pull the 8-row dim before the second " +
          s"fact, got $withCbo")
      // Stats must be invisible in the answer.
      assert(spark.sql(sql).head().getLong(0) === 8L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }

  test("NDV tracking survives a type widen (old sketches stay valid)") {
    val t = fresh("widen")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v INT)")
    spark.range(0, 1000).selectExpr("id", "CAST(id % 100 AS INT) AS v")
      .writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.range(1000, 2000).selectExpr("id", "id % 100 AS v")
      .writeTo(t).append()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val scan = spark.table(t).queryExecution.optimizedPlan.collectLeaves().head
      val v = scan.stats.attributeStats.find(_._1.name == "v")
        .flatMap(_._2.distinctCount).map(_.toLong)
      // Both vintages hold the same 100 values; int-vs-long hashing is
      // canonical, so the merged estimate must see ~100, not ~200.
      assert(v.exists(e => math.abs(e - 100) <= 10), s"v ndv after widen: $v")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("chunked manifests pre-merge NDV per chunk: a fresh planner's " +
      "stats merge is bounded by chunk count, estimates unchanged") {
    val t = fresh("chunkstats")
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='8')")
    // 32 files (hash-spread ids) → a 4-chunk index at 8 entries/chunk.
    spark.range(0, 20000).repartition(32)
      .selectExpr("id", "concat('u', id % 500) AS s")
      .writeTo(t).append()
    def distinctOf(col: String): Option[Long] = {
      val scan = spark.table(t).queryExecution.optimizedPlan
        .collectLeaves().head
      scan.stats.attributeStats.find(_._1.name == col)
        .flatMap(_._2.distinctCount).map(_.toLong)
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // Resident path: per-file merge (the cache IS the fast path).
      val resident = distinctOf("id")
      // Restart: the lazy chunked snapshot plans stats from the index's
      // pre-merged summaries — |chunks| register arrays per column, not
      // |files| — and HLL union associativity makes the estimate EXACTLY
      // the per-file merge's.
      SnapshotStore.tables.clear()
      val before = MetadataLog.statsMergeInputs.get()
      val fresh0 = distinctOf("id")
      val inputs = MetadataLog.statsMergeInputs.get() - before
      assert(fresh0 === resident,
        s"chunk-merged estimate must equal the per-file merge: " +
          s"$fresh0 vs $resident")
      assert(fresh0.exists(e => math.abs(e - 20000) <= 2000)
        , s"id ndv: $fresh0")
      assert(inputs > 0 && inputs < 32,
        s"fresh planning should merge O(chunks) register arrays " +
          s"(expected ~4/column), merged $inputs for a 32-file table")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
