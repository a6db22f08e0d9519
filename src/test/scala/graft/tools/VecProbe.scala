package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decode A/B at sf×N: builds two ×N catalog copies of lineitem — identical
  * parquet files, one table with vectorized decode (default), one with
  * `read.vectorized=false` — and times the all-column raw scan on each.
  * At plain sf0.1 the ~0.2 s job floor compresses the ratio; growing the
  * data makes the decode loop dominate, which is the 100 TB regime.
  *
  * Phase 2 (round 15): a merge-on-read DELETE lands position-delete files
  * on BOTH copies, the two paths are asserted answer-identical, and the
  * same raw scan is re-timed — measuring that the batch path KEEPS its
  * decode win when deletes filter through the selection remap
  * (`MemReaders.SelectedColumnVector`) instead of demoting to row decode.
  *
  * `Test/runMain graft.tools.VecProbe <sfDir> [copies] [cpus]`
  */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 16
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = graft.SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "vec-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.queries.Tables.lineitem(spark, dir)
    def ensure(name: String, vectorized: Boolean): String = {
      val full = s"graft_snap.bench.$name"
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.bench")
      spark.sql(s"DROP TABLE IF EXISTS $full")
      val w = src.repartition(8).writeTo(full)
        .tableProperty("write.format", "parquet")
        .tableProperty("read.vectorized", vectorized.toString)
        .tableProperty("write.delete.mode", "merge-on-read")
      w.create()
      // Salted appends: distinct keys per copy, same byte volume.
      (1 until copies).foreach { i =>
        src.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
          .repartition(8).writeTo(full).append()
      }
      full
    }

    def rawScan(table: String): DataFrame =
      spark.table(table).agg(
        count(lit(1)).as("n"), sum("l_orderkey").as("sum_okey"),
        sum("l_partkey").as("sum_pkey"), sum("l_suppkey").as("sum_skey"),
        sum("l_linenumber").as("sum_ln"), min("l_quantity").as("min_qty"),
        max("l_extendedprice").as("max_price"), min("l_discount").as("min_disc"),
        max("l_tax").as("max_tax"), min("l_returnflag").as("min_rf"),
        max("l_linestatus").as("max_ls"), min("l_shipdate").as("min_ship"),
        max("l_shipdate").as("max_ship"))

    def time(table: String): Double = {
      rawScan(table).write.format("noop").mode("overwrite").save() // warm FS cache
      (1 to 5).map { _ =>
        val t = System.nanoTime()
        rawScan(table).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }.min
    }

    val vec = ensure(s"lineitem_vec_x$copies", vectorized = true)
    val row = ensure(s"lineitem_row_x$copies", vectorized = false)
    val rows = spark.table(vec).count()
    val tv = time(vec)
    val tr = time(row)
    println(f"[vecprobe] rows=$rows copies=$copies vectorized=$tv%.2f s row=$tr%.2f s ratio=${tr / tv}%.2f")

    // Phase 2: the SAME scan over merge-on-read position deletes — the
    // batch path must keep (most of) its win, not demote to row decode.
    Seq(vec, row).foreach(t =>
      spark.sql(s"DELETE FROM $t WHERE l_orderkey % 10 = 3"))
    val a = rawScan(vec).collect().head.toString
    val b = rawScan(row).collect().head.toString
    require(a == b, s"batch/row paths disagree under deletes:\n  $a\n  $b")
    val survivors = spark.table(vec).count()
    val tvd = time(vec)
    val trd = time(row)
    println(f"[vecprobe] deleted: rows=$survivors vectorized=$tvd%.2f s row=$trd%.2f s ratio=${trd / tvd}%.2f")
    spark.sql(s"DROP TABLE IF EXISTS $vec")
    spark.sql(s"DROP TABLE IF EXISTS $row")
    spark.stop()
  }
}
