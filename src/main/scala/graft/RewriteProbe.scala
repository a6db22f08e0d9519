package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Scoped-vs-full compaction probe: a month-partitioned lineitem fact
  * accumulates small files in EVERY partition (the daily-commit shape),
  * and the nightly maintenance choice is `rewrite_data_files` whole vs
  * `where => 'p = <newest>'`. The claim under measure: scoped wall
  * tracks the SELECTED partition's share of the data, not the table —
  * at 100 TB the difference between an overnight job and an impossible
  * one. Also reports the untouched-file count (path-identity survival:
  * everything the scoped rewrite did NOT pay for).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.RewriteProbe [commits]`
  * (default 4 commits per partition). One CSV line per variant:
  * `variant,parts,files_before,files_after,untouched_files,wall_s`.
  * Statements mutate the table, so each variant rebuilds its own copy
  * and is timed once — the scoped:full RATIO is the signal. */
object RewriteProbe {

  def main(args: Array[String]): Unit = {
    val commits = if (args.isEmpty) 4 else args(0).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"),
        "graft-rewrite-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.queries.Tables.lineitem(spark, sfDir)
      .withColumn("p", (month(col("l_shipdate")) % lit(8)).cast("int"))
      .select("p", "l_orderkey", "l_quantity", "l_extendedprice",
        "l_shipdate")
      .persist()
    li.count()

    def build(name: String): String = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.probe")
      spark.sql(s"DROP TABLE IF EXISTS graft_snap.probe.$name")
      val t = s"graft_snap.probe.$name"
      spark.sql(s"CREATE TABLE $t (p INT, l_orderkey BIGINT, " +
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_shipdate TIMESTAMP) " +
        "PARTITIONED BY (p)")
      // `commits` appends, each landing files in EVERY partition — the
      // daily-commit small-file shape compaction exists for.
      for (i <- 0 until commits)
        li.filter(col("l_orderkey") % commits === i).writeTo(t).append()
      t
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def files(name: String): Vector[SnapshotStore.DataFile] =
      SnapshotStore.stateOf(
        SnapshotStore.keyOf("graft_snap", Seq("probe", name))).currentFiles

    println("variant,parts,files_before,files_after,untouched_files,wall_s")
    // FULL rewrite: every partition pays.
    locally {
      build("rw_full")
      val before = files("rw_full")
      val w = time(spark.sql(
        "CALL graft_snap.system.rewrite_data_files('probe.rw_full')")
        .collect())
      val after = files("rw_full")
      val untouched = before.map(_.path).toSet
        .intersect(after.map(_.path).toSet).size
      println(f"full,8,${before.size},${after.size},$untouched,$w%.2f")
    }
    // SCOPED rewrite: one partition pays; the rest survive by path.
    locally {
      build("rw_scoped")
      val before = files("rw_scoped")
      val w = time(spark.sql(
        "CALL graft_snap.system.rewrite_data_files('probe.rw_scoped', " +
          "1000000, where => 'p = 3')").collect())
      val after = files("rw_scoped")
      val untouched = before.map(_.path).toSet
        .intersect(after.map(_.path).toSet).size
      println(f"scoped,8,${before.size},${after.size},$untouched,$w%.2f")
    }
    spark.stop()
  }
}
