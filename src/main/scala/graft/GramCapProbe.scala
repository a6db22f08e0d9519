package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{IncrementalCuration, PipelineRunner, Tables}
import graft.sources.SnapshotStore

/** SIZE of the maintained span-removal gram index, capped vs uncapped
  * ([[graft.queries.IncrementalCuration]]'s `gram_cap`): the corpus is
  * duplicated VERBATIM K× (distinct doc_ids, identical text — every
  * gram's distinct-doc count grows ∝ K), delivered one copy per trigger.
  * The uncapped (gram, doc_id) pairs index grows linearly with the
  * mirror; the capped index EVICTS a gram's pairs once its count reaches
  * the cap, so after ~cap triggers the table is bounded by
  * `still-unsaturated grams × cap` and stops growing — while the
  * published sinks stay row-identical (asserted at the end; the p06 gate
  * pins the same against the DuckDB oracle).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.GramCapProbe [copies] [cap]`
  * (defaults 6, 3). Spec shape: `span_removal → token_count → select` —
  * no near_dup_drop, which would retract the verbatim copies and hold
  * counts flat. Prints one line per trigger per mode with the live pairs
  * row count.
  */
object GramCapProbe {

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(6)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SessionFactory
      .configure(SparkSession.builder()
        .master(s"local[${SessionFactory.defaultCores}]"), "graft-gramcap-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val one = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .persist()
    val n = one.count()
    println(s"[gramcap] base corpus $n docs × $copies verbatim copies, " +
      s"cap=$cap, dir=$dir")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gcprobe")

    def copy(k: Int): DataFrame =
      one.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text"))

    /** (live pairs, physical rows): live applies the eviction's equality
      * deletes; physical is what sits on disk until compaction folds the
      * merge-on-read deltas (maintainState's threshold). */
    def pairsCount(sink: String): (Long, Long) = {
      val t = s"${sink}_grams"
      if (!spark.catalog.tableExists(t)) (0L, 0L)
      else {
        val parts = t.split('.')
        val physical = SnapshotStore
          .stateOf(SnapshotStore.keyOf(parts.head, parts.tail.toSeq))
          .snapshots.lastOption.fold(0L)(_.files.map(_.rowCount).sum)
        (spark.table(t).count(), physical)
      }
    }

    def run(tag: String, capOpt: Option[Int]): Seq[(Int, Long, Double)] = {
      val src = s"graft_snap.gcprobe.src_$tag"
      val sink = s"graft_snap.gcprobe.sink_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $src")
      spark.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
      val capLine = capOpt.fold("")(c => s"\n    gram_cap: $c")
      val spec = graft.catalog.PipelineSpec.fromYaml(
        s"""pipeline: gcprobe_$tag
           |source:
           |  table: $src
           |  changes: true
           |  refresh: incremental
           |steps:
           |  - op: span_removal$capLine
           |  - op: token_count
           |  - op: select
           |    cols: doc_id, n_tokens
           |sink:
           |  table: $sink
           |""".stripMargin)
      val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-gcprobe-$tag-" +
        java.util.UUID.randomUUID
      val engine = new IncrementalCuration(spark, spec, ckpt)
      engine.resetState()
      engine.ensureState()
      (0 until copies).map { k =>
        copy(k).writeTo(src).append()
        val batch = copy(k).withColumn("_change_type", lit("INSERT"))
          .withColumn("_commit_version", lit(k + 1L))
          .withColumn("_commit_timestamp", current_timestamp())
        val t0 = System.nanoTime()
        engine.processBatch(batch, k.toLong)
        val wall = (System.nanoTime() - t0) / 1e6
        val (live, physical) = pairsCount(sink)
        println(f"[gramcap] $tag trigger=$k pairs=$live physical=$physical " +
          f"wall=$wall%.0f ms")
        (k, live, wall)
      }
    }

    val un = run("uncapped", None)
    val cp = run(s"capped", Some(cap))
    val a = spark.table("graft_snap.gcprobe.sink_uncapped")
      .orderBy("doc_id").collect().toSeq
    val b = spark.table("graft_snap.gcprobe.sink_capped")
      .orderBy("doc_id").collect().toSeq
    require(a == b, "capped and uncapped sinks must be row-identical")
    val growthUn = un.last._2.toDouble / math.max(1, un.head._2)
    val growthCp = cp.last._2.toDouble / math.max(1, cp.head._2)
    println(f"[gramcap] sinks identical (${a.size} rows); pairs growth " +
      f"first→last: uncapped ${growthUn}%.2f×, capped ${growthCp}%.2f×")
    spark.stop()
  }
}
