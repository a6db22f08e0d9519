package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-file BLOOM FILTERS in manifest stats ([[FileBloom]]): the skip
  * min/max cannot make — a point predicate on a high-NDV column
  * SCATTERED across files (every file's [min, max] box covers the whole
  * domain) opens ~1 file instead of all. Sound by construction (a bloom
  * has no false negatives; predicates stay residual), opt-in via
  * `stats.bloom-columns`, serialized in the metadata log like the NDV
  * sketch, density-self-sized at file close. */
class BloomStatsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.bloom")
    spark.sql(s"DROP TABLE IF EXISTS $cat.bloom.$name")
    s"$cat.bloom.$name"
  }

  private def files(name: String): Vector[SnapshotStore.DataFile] =
    SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("bloom", name)))
      .currentFiles

  /** The scan node's "(N rows, M files)" description after pushdown. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    val m = """graft-snapshot scan \((\d+) rows, (\d+) files\)""".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"no snapshot scan in plan:\n$plan"))
    m.group(2).toInt
  }

  /** Three commits holding interleaved ids {3k+j | k} — every file's
    * [min, max] spans the whole domain, so range stats alone can never
    * skip a point predicate. */
  private def buildScattered(t: String): Unit = {
    for (j <- 0 until 3)
      spark.sql(s"INSERT INTO $t SELECT id * 3 + $j, concat('u', id * 3 + $j) " +
        s"FROM range(0, 100, 1, 1)")
  }

  test("point predicate on a scattered high-NDV column opens ~1 file " +
      "where min/max opens all") {
    val t = fresh("scatter")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id, v')")
    buildScattered(t)
    assert(files("scatter").size === 3)
    // Every file carries a bloom for both columns.
    assert(files("scatter").forall(f =>
      f.stats.values.count(_.bloom != null) === 2))

    // id = 5 lives only in the j = 2 file; min/max cannot prove that
    // (all three boxes cover [j, 297+j]) — the bloom can.
    val pointQ = spark.sql(s"SELECT v FROM $t WHERE id = 5")
    assert(scannedFiles(pointQ) === 1, "bloom must skip the other two files")
    assert(pointQ.collect().toSeq === Seq(Row("u5")))

    // String blooms prune too.
    val strQ = spark.sql(s"SELECT id FROM $t WHERE v = 'u7'")
    assert(scannedFiles(strQ) === 1)
    assert(strQ.collect().toSeq === Seq(Row(7L)))

    // A value NO file holds scans nothing and answers empty.
    val missQ = spark.sql(s"SELECT v FROM $t WHERE id = 1000000")
    assert(scannedFiles(missQ) === 0)
    assert(missQ.collect().isEmpty)
  }

  test("IN-list values prune per value — range and bloom compose") {
    val t = fresh("inlist")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id')")
    buildScattered(t)
    // 5 and 8 both live in the j = 2 file; 1000000 is out of every range.
    val q = spark.sql(s"SELECT count(*) AS n FROM $t " +
      "WHERE id IN (5, 8, 1000000)")
    assert(scannedFiles(q) === 1)
    assert(q.collect().head.getLong(0) === 2L)
  }

  test("soundness A/B: answers identical with blooms off, for point, IN, " +
      "and non-equality shapes") {
    val tOn = fresh("ab_on")
    val tOff = fresh("ab_off")
    spark.sql(s"CREATE TABLE $tOn (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id, v')")
    spark.sql(s"CREATE TABLE $tOff (id BIGINT, v STRING)")
    buildScattered(tOn); buildScattered(tOff)
    for (pred <- Seq("id = 17", "id IN (4, 5, 6, 7)", "id <=> 42",
        "v = 'u11'", "id > 290", "id % 7 = 0")) {
      val a = spark.sql(s"SELECT id, v FROM $tOn WHERE $pred ORDER BY id")
        .collect().toSeq
      val b = spark.sql(s"SELECT id, v FROM $tOff WHERE $pred ORDER BY id")
        .collect().toSeq
      assert(a === b, s"answers diverged under '$pred'")
    }
  }

  test("blooms survive the metadata log: skipping still works after restart") {
    val t = fresh("durbloom")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id')")
    buildScattered(t)
    SnapshotStore.tables.clear() // "restart"
    val q = spark.sql(s"SELECT v FROM $t WHERE id = 5")
    assert(scannedFiles(q) === 1)
    assert(q.collect().toSeq === Seq(Row("u5")))
  }

  test("bloom survives int → bigint widening: canonical hashes keep " +
      "pre-widen filters valid for post-widen literals") {
    val t = fresh("widen")
    spark.sql(s"CREATE TABLE $t (id INT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id')")
    buildScattered(t)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE BIGINT")
    val q = spark.sql(s"SELECT v FROM $t WHERE id = ${5L}")
    assert(scannedFiles(q) === 1)
    assert(q.collect().toSeq === Seq(Row("u5")))
  }

  test("density self-sizing: a low-NDV column folds to a few bytes; the " +
      "max-bytes cap bounds a high-NDV column's weight") {
    val t = fresh("size")
    spark.sql(s"CREATE TABLE $t (lo BIGINT, hi BIGINT) " +
      "TBLPROPERTIES ('stats.bloom-columns'='lo, hi', " +
      "'stats.bloom-max-bytes'='1024')")
    spark.sql(s"INSERT INTO $t SELECT id % 4, id FROM range(0, 40000, 1, 1)")
    val st = files("size").head.stats
    val loBytes = st.values.collectFirst {
      case s if s.bloom != null && s.min == 0L => s.bloom.bytes.length }.get
    assert(loBytes <= 1 + 64, s"4-distinct column should fold tiny, got $loBytes")
    // 40k distinct at a 1 KiB cap is too dense to prune usefully — the
    // bloom is DROPPED, never stored as dead manifest weight.
    val hiBloom = st.values.collectFirst {
      case s if s.max == 39999L => s.bloom }.get
    assert(hiBloom == null, "overloaded bloom must be dropped")
    // And the answer is still right without it.
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE hi = 123")
      .collect().head.getLong(0) === 1L)
  }

  test("grf format collects blooms through the same stats seam") {
    val t = fresh("grf")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) TBLPROPERTIES " +
      "('write.format'='grf', 'stats.bloom-columns'='id')")
    buildScattered(t)
    val q = spark.sql(s"SELECT v FROM $t WHERE id = 5")
    assert(scannedFiles(q) === 1)
    assert(q.collect().toSeq === Seq(Row("u5")))
  }

  test("point-key upsert probes only the bloom-matching file: equality-" +
      "delete pruning through the data files' blooms where key ranges " +
      "all overlap") {
    val t = fresh("equps")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('stats.bloom-columns'='id')")
    buildScattered(t) // 3 files, every id range covers the domain
    import spark.implicits._
    // id = 5 lives only in the j = 2 file; the single-key upsert's
    // delete has range [5, 5], which every file's box covers — only the
    // blooms can prune the probes.
    SnapshotUpsert.upsertBatch(t, Seq((5L, "U5")).toDF("id", "v"), Seq("id"))
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("bloom", "equps")))
    val eq = SnapshotStore.eqDeletes(st.currentDeletes)
    assert(eq.size === 1, s"fixture: one eq delete expected, got $eq")
    val parts = ScanSplits.partitions(st.currentFiles,
      SnapshotStore.deleteMap(st.currentDeletes), Long.MaxValue, eq,
      SnapshotStore.idTypes(st.schema))
    val probed = parts.collect {
      case p: MemFilePartition if p.eqDeletePaths.nonEmpty => p.path }
    assert(probed.length === 1,
      s"blooms must keep the probe on 1 of 3 overlapping files: $probed")
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 5").collect().toSeq ===
      Seq(Row("U5")))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()
      .head.getLong(0) === 300L)
  }

  test("malformed stats.bloom-max-bytes fails loudly at CREATE and ALTER") {
    val t = fresh("badprop")
    val e1 = intercept[Exception](spark.sql(s"CREATE TABLE $t (id BIGINT) " +
      "TBLPROPERTIES ('stats.bloom-max-bytes'='banana')"))
    assert(e1.getMessage.contains("stats.bloom-max-bytes"), e1.getMessage)
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t SET TBLPROPERTIES ('stats.bloom-max-bytes'='-5')"))
    assert(e2.getMessage.contains("stats.bloom-max-bytes"), e2.getMessage)
  }
}
