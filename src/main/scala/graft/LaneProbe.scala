package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-lane drill-down for optimization rounds: runs the NAMED registered
  * queries with Bench's exact methodology (noop sink, min-of-N) and
  * attributes each lane's wall to the Spark jobs it ran, keyed by call
  * site — the local[N] stand-in for the Spark UI's job table (the UI is
  * off in this harness). Purely a measurement harness: never used by the
  * bench or the declared queries.
  *
  * Usage: `runMain graft.LaneProbe <queryName>[,<queryName>...] [passes]`
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench's knobs, same defaults).
  */
object LaneProbe {

  /** (callSite -> (jobs, totalSec)), plus job count and scheduled wall. */
  private final class JobTally extends SparkListener {
    val starts = mutable.Map[Int, (String, Long)]()
    val bySite = mutable.Map[String, (Int, Double)]()
    var jobs = 0
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val props = Option(e.properties)
      val site = props
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("unknown")
      starts(e.jobId) = (site, e.time)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      starts.remove(e.jobId).foreach { case (site, t0) =>
        val sec = (e.time - t0) / 1e3
        val (n, tot) = bySite.getOrElse(site, (0, 0.0))
        bySite(site) = (n + 1, tot + sec)
        jobs += 1
      }
    }
    def reset(): Unit = synchronized { starts.clear(); bySite.clear(); jobs = 0 }
    def report(top: Int): String = synchronized {
      val rows = bySite.toSeq.sortBy(-_._2._2).take(top).map {
        case (site, (n, tot)) => f"    $tot%8.3f s  x$n%-4d $site"
      }
      rows.mkString("\n")
    }
  }

  /** Per-SQL-statement durations (QueryExecutionListener): the lane-level
    * view when one registered query runs many statements (MV scenarios,
    * governance gates). Keyed by the logical plan's head + a line hint. */
  private final class ExecTally
      extends org.apache.spark.sql.util.QueryExecutionListener {
    val rows = mutable.ArrayBuffer[(String, Double)]()
    private def keyOf(qe: org.apache.spark.sql.execution.QueryExecution): String = {
      val l = qe.logical
      val head = l.nodeName
      val detail = l.toString.linesIterator.take(2).mkString(" | ").take(140)
      s"$head: $detail"
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = synchronized {
      rows += ((s"[$funcName] ${keyOf(qe)}", durationNs / 1e9))
    }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
    def reset(): Unit = synchronized { rows.clear() }
    def report(top: Int): String = synchronized {
      rows.sortBy(-_._2).take(top)
        .map { case (k, s) => f"    $s%8.3f s  $k" }.mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSet).getOrElse(Set.empty)
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(
        SparkSession.builder().master(s"local[$cpus]"),
        appName = "graft-lane-probe",
        shufflePartitions = cpus.toIntOption.getOrElse(32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)
    val execs = new ExecTally
    spark.listenerManager.register(execs)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names.contains(q._1))
    require(qs.nonEmpty, s"no registered query matches $names")
    // Same JVM/codegen warm-up as Bench: one cheap throwaway execution.
    SparkEntry.queries.get("q10_top_customers").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    qs.foreach { case (name, fn) =>
      val walls = (1 to passes).map { i =>
        val last = i == passes
        if (last) { tally.reset(); execs.reset() } // attribute the warmest pass
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val sec = (System.nanoTime() - t0) / 1e9
        if (last) {
          // Let the async listener bus drain before reading the tallies.
          Thread.sleep(300)
          println(f"\n== $name: pass $i = $sec%.3f s, ${tally.jobs} jobs; top call sites:")
          println(tally.report(top = 25))
          println(s"  -- statements:")
          println(execs.report(top = 25))
        }
        sec
      }
      println(f"== $name: min=${walls.min}%.3f s over $passes passes " +
        walls.map(w => f"$w%.2f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
