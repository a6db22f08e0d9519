package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming throughput probe — the one unmeasured corner of the streaming
  * slice (its CORRECTNESS is pinned by the sbt MemoryStream suite and the
  * q17/q37/q18 oracle batch twins; this measures RATE).
  *
  * Two representative stateful shapes, both through `MemoryStream` so the
  * source adds no I/O cost and the number is the ENGINE's sustained
  * rows/second on this host:
  *
  *   - `tumbling`: watermarked tumbling-window count/sum
  *     ([[graft.streaming.EventPipelines.tumblingCounts]]) — the shuffle +
  *     windowed-state path every metering pipeline runs;
  *   - `tws_totals`: per-key running totals through the Spark 4
  *     `transformWithState` arbitrary-state API on the RocksDB provider
  *     ([[graft.streaming.EventPipelines.runningTotals]]) — the
  *     point-lookup-per-row custom-state path.
  *
  * Rows arrive in `batches` micro-batches of `batchRows` each (default
  * 10 × 100k), timestamps advance ~1 s per row so windows roll over and
  * the watermark actually evicts state. Keys cycle through 50k users —
  * large enough that RocksDB state is real, small enough to stay hot.
  *
  * Usage: `runMain graft.StreamProbe [batchRows] [batches]`. Prints one
  * CSV line per shape: `shape,rows,wall_s,rows_per_s`.
  */
object StreamProbe {

  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-stream-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def eventsFor(b: Int): Seq[graft.streaming.EventPipelines.Event] = {
      val off = b.toLong * batchRows
      (0 until batchRows).map { i =>
        val k = off + i
        graft.streaming.EventPipelines.Event(
          user_id = k % 50000,
          ts = new Timestamp(base + k * 1000L),
          value = (k % 97).toDouble)
      }
    }
    def evFor(b: Int): Seq[(Timestamp, String, Double, Long)] = {
      val off = b.toLong * batchRows
      (0 until batchRows).map { i =>
        val k = off + i
        (new Timestamp(base + k * 1000L),
          if (k % 3 == 0) "click" else if (k % 3 == 1) "view" else "purchase",
          (k % 97).toDouble, k % 50000)
      }
    }

    val totalRows = batchRows.toLong * nBatches
    println("shape,rows,wall_s,rows_per_s")

    // Shape 1: watermarked tumbling windows (append mode, noop-equivalent
    // memory sink — emitted aggregate rows are tiny vs the input volume).
    locally {
      val input = MemoryStream[(Timestamp, String, Double, Long)]
      val name = s"probe_tumbling_${System.nanoTime()}"
      val q = graft.streaming.EventPipelines
        .tumblingCounts(input.toDF()
          .toDF("ts", "event_type", "value", "user_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { b =>
          input.addData(evFor(b)); q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"tumbling,$totalRows,$wall%.2f,${totalRows / wall}%.0f")
      } finally q.stop()
    }

    // Shape 2: transformWithState running totals on RocksDB.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    locally {
      val input = MemoryStream[graft.streaming.EventPipelines.Event]
      val name = s"probe_tws_${System.nanoTime()}"
      val q = graft.streaming.EventPipelines.runningTotals(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { b =>
          input.addData(eventsFor(b)); q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"tws_totals,$totalRows,$wall%.2f,${totalRows / wall}%.0f")
      } finally q.stop()
    }

    // Shape 3: stream-stream interval join (click→purchase attribution,
    // [[graft.streaming.EventPipelines.attributePurchases]]) — the third
    // stateful shape a production pipeline runs, and the most state-heavy:
    // unlike the windowed agg (one row per key·window) or tws (one value
    // per key), BOTH input sides are buffered row-for-row in the state
    // store until the watermark + join interval lets them evict, so every
    // micro-batch pays puts for all arriving rows plus range-scan lookups
    // against the opposite buffer — its rows/s is dominated by state-store
    // commit cost (RocksDB here, set by shape 2; same provider a deployment
    // runs). Every click gets exactly one purchase 5 min later, so the
    // match work is real (|matches| = |clicks|), not an empty-join fast
    // path. Rows counted = both sides summed.
    locally {
      val half = batchRows / 2
      def clicksFor(b: Int): Seq[(Timestamp, Long)] = {
        val off = b.toLong * half
        (0 until half).map { i =>
          val k = off + i
          (new Timestamp(base + k * 1000L), k % 50000)
        }
      }
      def purchasesFor(b: Int): Seq[(Timestamp, Double, Long)] = {
        val off = b.toLong * half
        (0 until half).map { i =>
          val k = off + i
          (new Timestamp(base + k * 1000L + 300000L), (k % 97).toDouble, k % 50000)
        }
      }
      val clicks = MemoryStream[(Timestamp, Long)]
      val purchases = MemoryStream[(Timestamp, Double, Long)]
      val name = s"probe_ssjoin_${System.nanoTime()}"
      val q = graft.streaming.EventPipelines.attributePurchases(
          clicks.toDF().toDF("ts", "user_id"),
          purchases.toDF().toDF("ts", "value", "user_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { b =>
          clicks.addData(clicksFor(b)); purchases.addData(purchasesFor(b))
          q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val rows = 2L * half * nBatches
        println(f"ss_join,$rows,$wall%.2f,${rows / wall}%.0f")
      } finally q.stop()
    }
    spark.stop()
  }
}
