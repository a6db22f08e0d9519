package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{MetadataLog, SnapshotStore}

/** DURABLE-METADATA-LOG cost probe: measures what the file-backed commit
  * protocol actually costs as a table's HISTORY and FILE COUNT grow — the
  * two dimensions that decide whether the metadata plane survives 100×.
  *
  *   - commit latency: append one manifest + claim `v<N+1>.json`. The
  *     contract says O(current files) manifest bytes + O(snapshots)
  *     summary bytes per commit — so latency should grow with FILE COUNT,
  *     stay near-flat in HISTORY DEPTH (each old snapshot contributes one
  *     summary line, its manifest is never rewritten).
  *   - cold load: newest metadata file + LIVE manifests only — O(live
  *     inventory), never O(history × files).
  *
  * Usage: `runMain graft.LogProbe [commitsPerStep] [filesPerCommit...]`
  * (defaults 40 commits at 1/8/32 files per commit). Prints one line per
  * configuration; wall times are medians over the step's commits.
  */
object LogProbe {

  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(40)
    require(commits >= 2, s"commitsPerStep must be >= 2 (half-medians), got $commits")
    val widths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 8, 32)
    val spark = SessionFactory
      .configure(SparkSession.builder().master("local[4]"), "graft-log-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cat = "graft_snap"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.logprobe")

    widths.foreach { width =>
      val table = s"t_w$width"
      val name = s"$cat.logprobe.$table"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name (id BIGINT, v DOUBLE)")
      val k = SnapshotStore.keyOf(cat, Seq("logprobe", table))

      // Synthetic file descriptors: the probe measures the METADATA plane,
      // so commits carry descriptor-only files (no data IO in the timing).
      def fakeFiles(n: Int, tag: String): Vector[SnapshotStore.DataFile] = {
        val dir = SnapshotStore.stateOf(k).dataDir
        (0 until n).map(i => SnapshotStore.DataFile(
          s"$dir/$tag-$i.parquet", Vector.empty, 100L,
          Map(1 -> SnapshotStore.ColStats(1L, 100L, 0L)),
          1024L, Vector((0L, 4L)), writeCols = Vector((1, "id"), (2, "v"))))
          .toVector
      }

      val walls = (1 to commits).map { c =>
        val files = fakeFiles(width, s"c$c")
        val t0 = System.nanoTime()
        SnapshotStore.commit(k, files, replace = false)
        (System.nanoTime() - t0) / 1e6
      }
      def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val firstHalf = median(walls.take(commits / 2))
      val secondHalf = median(walls.drop(commits / 2))

      // Cold load: clear the cache, time the warehouse reload. With lazy
      // manifest residency the load reads SUMMARIES only — resident file
      // entries right after load must be ZERO regardless of history depth,
      // and touching currentFiles materializes exactly ONE snapshot's
      // inventory.
      SnapshotStore.tables.clear()
      val t0 = System.nanoTime()
      val st = SnapshotStore.stateOf(k)
      val loadMs = (System.nanoTime() - t0) / 1e6
      val residentAtLoad = st.snapshots.map(_.residentFileEntries).sum
      val live = st.currentFiles.size // forces the CURRENT manifest only
      val residentAfterScanPlan = st.snapshots.map(_.residentFileEntries).sum
      println(f"[logprobe] width=$width%3d commits=$commits " +
        f"medianCommitMs(first half)=$firstHalf%7.2f " +
        f"(second half)=$secondHalf%7.2f " +
        f"coldLoadMs=$loadMs%8.2f liveFiles=$live%6d " +
        f"snapshots=${st.snapshots.size}%4d " +
        f"residentEntries(load)=$residentAtLoad%6d " +
        f"(after current-files touch)=$residentAfterScanPlan%6d")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }

    // LOAD-TIME-vs-HISTORY probe: same live inventory width, growing
    // history depth — cold load must stay near-flat (summaries only) and
    // the post-load resident entries must be zero at every depth.
    val width = widths.max
    Seq(commits, commits * 4).foreach { depth =>
      val table = s"t_hist_$depth"
      val name = s"$cat.logprobe.$table"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name (id BIGINT, v DOUBLE)")
      val k = SnapshotStore.keyOf(cat, Seq("logprobe", table))
      val dir = SnapshotStore.stateOf(k).dataDir
      (1 to depth).foreach { c =>
        val files = (0 until width).map(i => SnapshotStore.DataFile(
          s"$dir/h$c-$i.parquet", Vector.empty, 100L,
          Map(1 -> SnapshotStore.ColStats(1L, 100L, 0L)),
          1024L, Vector((0L, 4L)), writeCols = Vector((1, "id"), (2, "v"))))
          .toVector
        // Truncate-overwrite: live inventory stays `width` files while
        // history deepens — isolating depth from live size.
        SnapshotStore.commit(k, files, replace = true)
      }
      SnapshotStore.tables.clear()
      val t0 = System.nanoTime()
      val st = SnapshotStore.stateOf(k)
      val loadMs = (System.nanoTime() - t0) / 1e6
      val resident = st.snapshots.map(_.residentFileEntries).sum
      println(f"[logprobe] historyDepth=$depth%4d liveFiles=${st.currentFiles.size}%4d " +
        f"coldLoadMs=$loadMs%8.2f residentEntries(load)=$resident%6d " +
        f"lazySnapshots=${st.snapshots.count(_.isLazy)}%4d/${st.snapshots.size}%4d")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
    spark.stop()
  }
}
