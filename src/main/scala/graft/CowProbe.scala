package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Copy-on-write commit-cost probe for the file-backed snapshot catalog:
  * grows a partitioned table by ADDING partitions of fixed size — the
  * production shape (a day-partitioned fact table grows by days) — and at
  * each size measures the three statement classes the partition machinery
  * exists to separate:
  *
  *   - `merge_part`: MERGE whose source keys live in ONE partition, with
  *     the partition predicate in the ON clause. File-grained COW must
  *     rewrite only that partition's files (`files_rw` column is the
  *     evidence); the group-discovery subquery is the remaining
  *     table-sized READ, so wall grows sub-linearly while rewrite I/O
  *     stays flat.
  *   - `delete_part`: DELETE on the partition predicate — a metadata-only
  *     commit ([[graft.sources.SnapshotCatalog]]'s `SupportsDeleteV2`
  *     path); flat at any size, zero files read or written.
  *   - `merge_all`: MERGE touching keys in EVERY partition — the honest
  *     O(table) read+rewrite upper bound the other two rows are measured
  *     against.
  *
  * Statements mutate the table, so each is timed once per factor (no
  * min-of-3); the factor sweep itself is the signal. Usage:
  * `runMain graft.CowProbe [factors…]` (default 1 4 10). One CSV line per
  * factor: `factor,parts,rows,total_files,merge_part_s,files_rw_part,
  * delete_part_s,files_rw_delete,merge_all_s,files_rw_all`.
  */
object CowProbe {

  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 4, 10) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-cow-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val basePartitions = 8
    val orders = graft.queries.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").persist()
    val baseRows = orders.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def filesOf(name: String): Set[String] = {
      val k = SnapshotStore.keyOf("graft_snap", Seq("probe", name))
      SnapshotStore.stateOf(k).currentFiles.map(_.path).toSet
    }

    println("factor,parts,rows,total_files,merge_part_s,files_rw_part," +
      "delete_part_s,files_rw_delete,merge_all_s,files_rw_all")
    factors.foreach { f =>
      val name = s"cow_f$f"
      val t = s"graft_snap.probe.$name"
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.probe")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, pk STRING) PARTITIONED BY (pk)")
      // Fresh keys per replica (high-digit tag) and replica-major partition
      // ids: factor f = f× MORE partitions of the SAME size, disjoint keys.
      // Clustered by pk before the write so each task streams one
      // partition's file (the write-distribution best practice this
      // catalog's per-(task, partition) writers reward).
      val amplified = orders
        .withColumn("_rep", explode(sequence(lit(0), lit(f - 1))))
        .select(
          (col("_rep").cast("long") * 1000000000L + col("o_orderkey")).as("k"),
          col("o_totalprice").as("v"),
          concat(lit("p"),
            (col("_rep") * basePartitions +
              pmod(col("o_orderkey"), lit(basePartitions)))).as("pk"))
        .repartition(col("pk"))
      amplified.createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO $t SELECT k, v, pk FROM ${name}_src")
      val rows = baseRows * f
      val total = filesOf(name).size

      // One partition's keys (p3 lives in replica 0 at every factor). The
      // change batches derive from the amplified source frame, not the
      // table (a MERGE source self-referencing its target is its own can
      // of worms, and real change batches arrive from outside anyway).
      amplified.filter(col("pk") === "p3")
        .select(col("k"), (col("v") * 2).as("v"))
        .createOrReplaceTempView(s"${name}_upd_part")
      val before1 = filesOf(name)
      val tPart = time(spark.sql(
        s"""MERGE INTO $t t USING ${name}_upd_part s
           |ON t.k = s.k AND t.pk = 'p3'
           |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
      val rwPart = (before1 -- filesOf(name)).size

      val before2 = filesOf(name)
      val tDel = time(spark.sql(s"DELETE FROM $t WHERE pk = 'p5'"))
      val rwDel = (before2 -- filesOf(name)).size

      // Every third key — mod 3 is coprime to the mod-8 partition routing,
      // so the batch hits EVERY partition: the whole-table rewrite bound.
      amplified.filter(col("k") % 3 === 1)
        .select(col("k"), (col("v") * 3).as("v"))
        .createOrReplaceTempView(s"${name}_upd_all")
      val before3 = filesOf(name)
      val tAll = time(spark.sql(
        s"""MERGE INTO $t t USING ${name}_upd_all s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
      val rwAll = (before3 -- filesOf(name)).size

      println(f"$f,${basePartitions * f},$rows,$total,$tPart%.2f,$rwPart," +
        f"$tDel%.3f,$rwDel,$tAll%.2f,$rwAll")
      spark.sql(s"DROP TABLE $t")
    }
    spark.stop()
  }
}
