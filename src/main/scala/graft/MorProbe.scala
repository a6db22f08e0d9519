package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Merge-on-read vs copy-on-write cost probe — measures the exact trade
  * the `write.delete.mode` property buys on the day-partitioned fact shape
  * ([[CowProbe]]'s): at each growth factor, IDENTICAL twin tables take the
  * same scattered small DELETE (~0.1% of keys, hitting EVERY partition —
  * the worst case for copy-on-write, the normal case for GDPR-style
  * erasure), one in each mode:
  *
  *   - write side: COW must rewrite every touched file (O(table) I/O for a
  *     scattered delete); MOR writes O(deleted-rows) position bytes into
  *     per-file delete files and rewrites NOTHING (`files_rw` = 0).
  *   - read side: the MOR table then pays the delete-set union at scan
  *     time (`read tax`), until `rewrite_data_files` folds the deletes in
  *     and the read returns to clean speed.
  *
  * Statements mutate the tables, so each is timed once per factor; reads
  * are min-of-2 after a warm run. Usage: `runMain graft.MorProbe
  * [factors…]` (default 1 4 10); one CSV line per factor.
  * `SPARK_GRAFT_MOR_MODULUS` (default 997) sets the delete density —
  * rows where `k % modulus = 5` are deleted (~1/modulus of the table) —
  * so sweeping it charts the READ-TAX-vs-density curve that tells a
  * deployment when the carried deletes warrant a compaction run.
  */
object MorProbe {

  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 4, 10) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-mor-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val basePartitions = 8
    val orders = graft.queries.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").persist()
    val baseRows = orders.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def stateOf(name: String) =
      SnapshotStore.stateOf(SnapshotStore.keyOf("graft_snap", Seq("probe", name)))
    def readS(t: String): Double = {
      def run() = time(spark.sql(s"SELECT sum(v) AS s FROM $t").collect())
      run(); math.min(run(), run())
    }

    println("factor,parts,rows,files,deleted_rows," +
      "cow_del_s,cow_files_rw,mor_del_s,mor_files_rw,mor_del_files," +
      "cow_read_s,mor_read_s,compact_s,mor_read_after_s")
    factors.foreach { f =>
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.probe")
      val amplified = orders
        .withColumn("_rep", explode(sequence(lit(0), lit(f - 1))))
        .select(
          (col("_rep").cast("long") * 1000000000L + col("o_orderkey")).as("k"),
          col("o_totalprice").as("v"),
          concat(lit("p"),
            (col("_rep") * basePartitions +
              pmod(col("o_orderkey"), lit(basePartitions)))).as("pk"))
        .repartition(col("pk")).persist()
      amplified.count()
      amplified.createOrReplaceTempView(s"mor_probe_src_$f")

      def build(name: String, props: String): String = {
        val t = s"graft_snap.probe.$name"
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, pk STRING) " +
          s"PARTITIONED BY (pk) $props")
        spark.sql(s"INSERT INTO $t SELECT k, v, pk FROM mor_probe_src_$f")
        t
      }
      val cowT = build(s"morp_cow_$f", "")
      val morT = build(s"morp_mor_$f",
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")

      val rows = baseRows * f
      val files = stateOf(s"morp_cow_$f").currentFiles.size
      // ~1/modulus of keys, coprime to the mod-8 routing: every partition
      // hit (defaults to ~0.1%).
      val modulus = sys.env.getOrElse("SPARK_GRAFT_MOR_MODULUS", "997").toInt
      val delPred = s"k % $modulus = 5"
      val nDel = spark.sql(s"SELECT count(*) AS n FROM $cowT WHERE $delPred")
        .collect().head.getLong(0)

      val cowBefore = stateOf(s"morp_cow_$f").currentFiles.map(_.path).toSet
      val cowDelS = time(spark.sql(s"DELETE FROM $cowT WHERE $delPred"))
      val cowRw = (cowBefore --
        stateOf(s"morp_cow_$f").currentFiles.map(_.path).toSet).size

      val morBefore = stateOf(s"morp_mor_$f").currentFiles.map(_.path).toSet
      val morDelS = time(spark.sql(s"DELETE FROM $morT WHERE $delPred"))
      val morState = stateOf(s"morp_mor_$f")
      val morRw = (morBefore -- morState.currentFiles.map(_.path).toSet).size
      val morDelFiles = morState.currentDeletes.size

      val cowReadS = readS(cowT)
      val morReadS = readS(morT)
      val compactS = time(spark.sql(
        s"CALL graft_snap.system.rewrite_data_files('probe.morp_mor_$f')"))
      val morReadAfterS = readS(morT)

      println(f"$f,${basePartitions * f},$rows,$files,$nDel," +
        f"$cowDelS%.2f,$cowRw,$morDelS%.2f,$morRw,$morDelFiles," +
        f"$cowReadS%.3f,$morReadS%.3f,$compactS%.2f,$morReadAfterS%.3f")
      spark.sql(s"DROP TABLE $cowT")
      spark.sql(s"DROP TABLE $morT")
      amplified.unpersist()
    }

    // PHASE 2 — deletion-vector trigger sweep (`SPARK_GRAFT_MOR_TRIGGERS`,
    // default 20): one MOR table takes K successive scattered DELETE
    // statements WITHOUT compaction; after each, the carried delete-
    // structure count and the scan time. Pre-DV, structures grew one per
    // statement per touched file and the read tax climbed with trigger
    // count; with merge-on-write vectors the count stays ONE per touched
    // data file and the read cost stays flat — bounded by deleted ROWS,
    // not by write cadence.
    val triggers = sys.env.getOrElse("SPARK_GRAFT_MOR_TRIGGERS", "20").toInt
    if (triggers > 0) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.probe")
      val t = "graft_snap.probe.morp_triggers"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, pk STRING) " +
        "PARTITIONED BY (pk) " +
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $t SELECT o_orderkey AS k, " +
        s"o_totalprice AS v, concat('p', o_orderkey % $basePartitions) AS pk " +
        s"FROM (SELECT * FROM parquet.`$sfDir/orders.parquet`)")
      println("trigger,del_structs,max_structs_per_file,read_s")
      (1 to triggers).foreach { i =>
        spark.sql(s"DELETE FROM $t WHERE k % 1009 = $i")
        val st = stateOf("morp_triggers")
        val structs = st.currentDeletes.size
        val maxPerFile = SnapshotStore.deleteMap(st.currentDeletes)
          .values.map(_.size).maxOption.getOrElse(0)
        println(f"$i,$structs,$maxPerFile,${readS(t)}%.3f")
      }
      spark.sql(s"DROP TABLE $t")
    }
    spark.stop()
  }
}
