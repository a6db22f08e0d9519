package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew probe: a planted hot join key, measured with AQE skew-join
  * splitting OFF vs ON — the evidence that the engine's runtime re-plan
  * (not just the a-priori [[graft.operators.SaltedJoin]]) bounds task-time
  * skew. Usage: `runMain graft.SkewProbe <sfDir> [factor]`.
  *
  * Shape: lineitem replicated ×factor, with a third of the rows remapped
  * onto ONE hot key (the rest spread over 4000 cold keys), sort-merge
  * joined to a 4001-row-per-replica build side and aggregated. Broadcast
  * is disabled for the probe (AQE skew splitting applies to sort-merge
  * joins; a broadcast join has no skewed shuffle partition to split) and
  * the skew thresholds are scaled to the fixture (defaults assume
  * 256 MB partitions; the mechanism, not the constant, is what the probe
  * certifies — at 100 TB the defaults engage unmodified).
  *
  * Reported per mode: wall seconds, task count, max / p50 task millis and
  * their ratio — the "one straggler owns the stage" number skew splitting
  * exists to cut. The two modes compute identical results (sbt-checked in
  * SaltedJoinSuite for the salting twin; here the probe asserts equal
  * row counts as a cheap guard).
  */
object SkewProbe {

  /** Per-STAGE task durations: the skew claim is about the JOIN stage's
    * straggler; a whole-query max would be polluted by the scan stage's
    * own single-row-group task (the fixture parquet is one row group). */
  private final class TaskDurations extends org.apache.spark.scheduler.SparkListener {
    private val durs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, java.lang.Long)]
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) durs.add((te.stageId, te.taskInfo.duration))
    def snapshot(): Map[Int, Seq[Long]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var v = durs.poll()
      while (v != null) { out += ((v._1, v._2.longValue())); v = durs.poll() }
      out.toSeq.groupMap(_._1)(_._2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-skew-probe")
      // Fixture-scaled skew thresholds (the defaults assume 256 MB
      // cluster partitions; the mechanism, not the constants, is what
      // the probe certifies — at 100 TB the defaults engage unmodified).
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.queries.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .withColumn("_rep", explode(sequence(lit(1), lit(factor))))
    // Hot key: one key owns a third of the fact side; cold keys uniform.
    // The sha payload rides through the join into the aggregate: it makes
    // the hot partition incompressibly heavy (a bare 16-byte row shuffles
    // too small at fixture scale to trip byte thresholds) and is what a
    // real fact row's carried columns look like to the shuffle.
    val fact = li.withColumn("jk",
      when(col("l_orderkey") % 3 === 0, lit(0L))
        .otherwise(pmod(col("l_orderkey"), lit(4000L)) + 1L))
      .withColumn("pay", sha2(concat(col("l_orderkey").cast("string"),
        col("_rep").cast("string")), 256))
      // Upstream fan-out: AQE splits a skewed partition at MAP-OUTPUT
      // granularity, and the fixture fact side is ONE single-row-group
      // parquet file = one map task = nothing to split. A cluster's fact
      // side always arrives from a prior many-task stage; the round-robin
      // repartition reproduces that (24 map outputs per reduce partition).
      .repartition(24)
    val dim = spark.range(0, 4001L).select(col("id").as("jk"),
      (col("id") * 7 % 100).as("disc"))

    // Aggregate on a key DIFFERENT from the join key: grouping on jk would
    // let the aggregate reuse the join's hash partitioning, and AQE then
    // declines to split the skewed partitions (splitting would force an
    // extra shuffle — `forceOptimizeSkewedJoin` stays at its default).
    // Joining on jk and rolling up by the dim attribute is also the
    // realistic shape: the hot key is a join-side artifact, not the
    // report's grain.
    def joined(): DataFrame =
      fact.join(dim, "jk")
        .groupBy("disc")
        .agg(graft.queries.Q.dsum(col("l_extendedprice") * (lit(100) - col("disc")) / 100.0)
          .as("rev"), sum(length(col("pay"))).as("pay_len"), count(lit(1)).as("n"))

    def run(): Unit = joined().write.format("noop").mode("overwrite").save()

    val durs = new TaskDurations
    spark.sparkContext.addSparkListener(durs)
    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(math.min(xs.size - 1, (xs.size * p).toInt))

    println("mode,wall_s,rows,stage,tasks,max_task_ms,p50_task_ms,max_over_p50")
    Seq("false" -> "skew_off", "true" -> "skew_on").foreach { case (flag, label) =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
      // Warm scan/codegen, then measure.
      run()
      org.apache.spark.sql.graftbridge.GraftPlanBridge.drainListenerBus(spark)
      durs.snapshot()
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.GraftPlanBridge.drainListenerBus(spark)
      val byStage = durs.snapshot()
      val rows = joined().count()
      durs.snapshot()
      // Top stages by straggler: the join stage is the one whose max the
      // skew split cuts (and whose task count it grows); the scan stage's
      // single heavy task is invariant between the modes.
      byStage.toSeq.sortBy(-_._2.max).take(3).foreach { case (sid, ds) =>
        val mx = ds.max
        val p50 = pct(ds, 0.5)
        println(f"$label,$wall%.2f,$rows,$sid,${ds.size},$mx,$p50," +
          f"${mx.toDouble / math.max(1L, p50)}%.1f")
      }
    }
    spark.stop()
  }
}
