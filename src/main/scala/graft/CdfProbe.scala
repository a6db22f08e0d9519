package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Change-feed cost probe — the 100 TB CDC claim, measured: reading ONE
  * commit's changes from the `.changes` relation must cost O(that commit's
  * changed files), NOT O(table). At each growth factor the probe builds a
  * merge-on-read fact table (day-partitioned shape, [[MorProbe]]'s), takes
  * a CONSTANT-SIZE scattered delete (same absolute key range at every
  * factor), and times:
  *
  *   - `cdf_commit_s`: `.changes` with `startingVersion` pinned to the
  *     delete commit — the per-commit tail a CDC consumer reads. Flat as
  *     the table grows: keep-mode partitions open only the files the
  *     delete touched, and stop at the last kept position.
  *   - `full_scan_s`: a full-table aggregate — the linear yardstick.
  *   - `cdf_history_s`: the whole history as changes (INSERT replay +
  *     the delete) — linear like the scan, the expected worst case.
  *
  * Usage: `runMain graft.CdfProbe [factors…]` (default 1 4 10); one CSV
  * line per factor.
  */
object CdfProbe {

  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 4, 10) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-cdf-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val basePartitions = 8
    val orders = graft.queries.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").persist()
    val baseRows = orders.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def min2(f: => Unit): Double = { time(f); math.min(time(f), time(f)) }

    println("factor,rows,files,changed_rows,cdf_commit_s,full_scan_s,cdf_history_s")
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
      amplified.createOrReplaceTempView(s"cdf_probe_src_$f")

      val t = s"graft_snap.probe.cdfp_$f"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, pk STRING) " +
        "PARTITIONED BY (pk) " +
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $t SELECT k, v, pk FROM cdf_probe_src_$f") // v1
      // Constant-size delete at every factor: only replica 0's low keys
      // match, so the CHANGE is fixed while the TABLE grows f-fold.
      spark.sql(s"DELETE FROM $t WHERE k < 5000") // v2: delta commit
      val st = SnapshotStore.stateOf(
        SnapshotStore.keyOf("graft_snap", Seq("probe", s"cdfp_$f")))
      val files = st.currentFiles.size
      val changed = spark.read.option("startingVersion", "2")
        .table(s"$t.changes").count()

      val cdfCommitS = min2(
        spark.read.option("startingVersion", "2").table(s"$t.changes")
          .agg(sum("v")).collect())
      val fullScanS = min2(
        spark.sql(s"SELECT sum(v) AS s FROM $t").collect())
      val cdfHistoryS = min2(
        spark.table(s"$t.changes").agg(sum("v")).collect())

      println(f"$f,${baseRows * f},$files,$changed," +
        f"$cdfCommitS%.3f,$fullScanS%.3f,$cdfHistoryS%.3f")
      spark.sql(s"DROP TABLE $t")
      amplified.unpersist()
    }
    spark.stop()
  }
}
