package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** DELETION VECTORS — Iceberg v3's position-delete shape: ONE bitmap per
  * data file replacing the accumulated per-commit position-delete files.
  *
  * WHY: every merge-on-read statement appends one position-delete file
  * per data file it touches, so a hot table's readers union a list of
  * tiny delete files that GROWS WITH TRIGGER COUNT until compaction
  * fires — read amplification bounded by write cadence, not by data.
  * A deletion vector folds all of a data file's dead positions into one
  * structure REWRITTEN ON MERGE: readers load exactly one delete
  * structure per data file, forever, and its size is bounded by the
  * file's row count (~a bit per row dense, ~2 bytes per deletion
  * sparse), not by how many statements produced it.
  *
  * FORMAT (roaring-style, the public Roaring bitmap container scheme
  * over 64-bit positions): positions are grouped by `pos >>> 16` (the
  * container KEY); each container stores the low 16 bits either as a
  * sorted array of chars (≤ [[ArrayCutoff]] entries — 2 bytes each) or
  * as a 65536-bit bitmap (8 KiB fixed, the dense case). Containers are
  * written key-ascending, so decoding yields sorted positions without a
  * sort:
  *
  * {{{
  *   int32  magic "GRDV"
  *   int64  cardinality
  *   int32  containerCount
  *   per container:
  *     int64 key            // position >>> 16
  *     int8  type           // 0 = array, 1 = bitmap
  *     array:  int32 n, n × uint16 values (ascending)
  *     bitmap: 8192 bytes, little-endian longs, bit i = low-16 value i
  *   }}}
  *
  * MERGE-ON-WRITE ([[mergeOnWrite]]): at delta-commit time the driver
  * folds each targeted data file's EXISTING structures (prior `pos`
  * files or its current `dv`) with the commit's task-written position
  * files into one fresh vector, recorded as a `kind = "dv"` manifest
  * entry whose `supersedes` lists the folded predecessor paths — the
  * change feed uses that lineage to tell a SUPERSEDE (same deaths,
  * new encoding — emit nothing) from a real delta. The cost is
  * O(deleted positions of touched files) driver I/O per commit — the
  * same bytes Iceberg v3 rewrites when it merges DVs — and it buys
  * every subsequent reader a single-structure probe.
  *
  * Readers need no special casing: [[RowFiles.readDeletes]] sniffs the
  * magic and decodes either format, so scans, change-feed
  * reconstruction, and compaction all consume DVs through the exact
  * code path that consumed position files.
  */
private[sources] object DeletionVectors {

  val Magic = 0x47524456 // "GRDV"

  /** Containers at or below this cardinality serialize as sorted arrays
    * (2 bytes/entry); above it the 8 KiB bitmap is smaller. 4096 × 2 B =
    * 8 KiB — the standard Roaring cutoff. */
  val ArrayCutoff = 4096

  /** Serialize sorted distinct `positions` as a deletion vector. */
  def write(pathStr: String, positions: Array[Long],
      conf: Configuration): Unit = {
    val p = new Path(pathStr)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(
        p.getFileSystem(conf).create(p, false), 1 << 16))
    try {
      out.writeInt(Magic)
      out.writeLong(positions.length.toLong)
      // One pass: containers are contiguous runs of equal (pos >>> 16).
      var containerCount = 0
      var i = 0
      while (i < positions.length) {
        var j = i + 1
        val key = positions(i) >>> 16
        while (j < positions.length && (positions(j) >>> 16) == key) j += 1
        containerCount += 1
        i = j
      }
      out.writeInt(containerCount)
      i = 0
      while (i < positions.length) {
        val key = positions(i) >>> 16
        var j = i + 1
        while (j < positions.length && (positions(j) >>> 16) == key) j += 1
        val n = j - i
        out.writeLong(key)
        if (n <= ArrayCutoff) {
          out.writeByte(0)
          out.writeInt(n)
          var t = i
          while (t < j) { out.writeChar((positions(t) & 0xFFFF).toInt); t += 1 }
        } else {
          out.writeByte(1)
          val words = new Array[Long](1024)
          var t = i
          while (t < j) {
            val low = (positions(t) & 0xFFFF).toInt
            words(low >>> 6) |= 1L << (low & 63)
            t += 1
          }
          var w = 0
          while (w < 1024) { out.writeLong(words(w)); w += 1 }
        }
        i = j
      }
    } finally out.close()
  }

  /** Decode a deletion vector (magic already consumed by the caller's
    * sniff) into its sorted positions. */
  def readBody(in: java.io.DataInputStream, path: String): Array[Long] = {
    val cardinality = in.readLong()
    require(cardinality >= 0 && cardinality <= Int.MaxValue,
      s"deletion vector $path: implausible cardinality $cardinality")
    val out = new Array[Long](cardinality.toInt)
    var filled = 0
    val containers = in.readInt()
    var c = 0
    while (c < containers) {
      val key = in.readLong()
      val base = key << 16
      in.readByte() match {
        case 0 =>
          val n = in.readInt()
          var t = 0
          while (t < n) { out(filled) = base | in.readChar().toLong; filled += 1; t += 1 }
        case 1 =>
          var w = 0
          while (w < 1024) {
            var word = in.readLong()
            val wordBase = base | (w.toLong << 6)
            while (word != 0L) {
              val bit = java.lang.Long.numberOfTrailingZeros(word)
              out(filled) = wordBase | bit.toLong
              filled += 1
              word &= word - 1
            }
            w += 1
          }
        case other => sys.error(s"deletion vector $path: bad container type $other")
      }
      c += 1
    }
    require(filled == out.length,
      s"deletion vector $path: $filled positions decoded, header said ${out.length}")
    out
  }

  /** Commits whose delta touches MORE data files than this fold as a
    * Spark job instead of a driver loop. The statement class DVs exist
    * for — a scattered GDPR-style DELETE over a 100 TB table — touches
    * ~every file (millions); folding them serially on the driver would
    * serialize millions of filesystem read+write round-trips on one
    * thread. Below the threshold the driver loop wins (no job-scheduling
    * latency on a 3-file MERGE). */
  val DistributeThreshold = 16

  /** Instrumentation: data files folded ON THE DRIVER — the observable
    * for the no-O(N)-driver-loop pin (a wide commit must leave it flat). */
  val driverFoldFiles = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Merge already-SORTED position arrays (prior pos files, prior DVs,
    * and task files all serialize sorted) into one sorted distinct
    * long[] — primitive end-to-end: the boxed-HashSet alternative pays
    * ~32 bytes/entry and re-sorts what was sorted. */
  private[sources] def mergeSorted(inputs: Seq[Array[Long]]): Array[Long] = {
    var total = 0
    inputs.foreach(a => total += a.length)
    val buf = new Array[Long](total)
    var off = 0
    inputs.foreach { a =>
      System.arraycopy(a, 0, buf, off, a.length); off += a.length
    }
    java.util.Arrays.sort(buf)
    var w = 0
    var i = 0
    while (i < buf.length) {
      if (w == 0 || buf(w - 1) != buf(i)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    if (w == buf.length) buf else java.util.Arrays.copyOf(buf, w)
  }

  /** Fold ONE data file's prior structures + this commit's task files
    * into a fresh vector. Runs driver-side for narrow commits and
    * TASK-side for wide ones — inputs are plain paths plus a shipped
    * conf, outputs a serializable manifest entry. */
  private def foldOne(dataPath: String, priorPaths: Vector[String],
      newPaths: Vector[String], dataDir: String,
      conf: Configuration): SnapshotStore.DeleteFile = {
    val positions = mergeSorted(
      (priorPaths ++ newPaths).map(p => RowFiles.readDeletes(p, conf)))
    val dvPath = s"$dataDir/dv-${UUID.randomUUID.toString.take(12)}.grfdv"
    write(dvPath, positions, conf)
    SnapshotStore.DeleteFile(dvPath, dataPath, positions.length.toLong,
      kind = "dv", supersedes = priorPaths)
  }

  /** Fold this commit's task-written position-delete files with each
    * targeted data file's existing delete structures into ONE deletion
    * vector per data file. Returns (dv manifest entries, superseded
    * EXISTING paths, folded-new paths to physically delete post-commit —
    * the task files were never referenced by any snapshot).
    *
    * DISTRIBUTION: above [[DistributeThreshold]] touched files the fold
    * runs as a Spark job — one task per slice of files, each reading its
    * files' O(deleted positions) bytes and writing one vector — leaving
    * the driver nothing but the returned manifest entries (metadata-
    * scale). A failed task fails the statement before anything commits;
    * vectors written by lost speculative/retried attempts are
    * unreferenced orphans the normal expire GC retires. */
  def mergeOnWrite(st: SnapshotStore.TableState,
      posNew: Vector[SnapshotStore.DeleteFile], dataDir: String,
      conf: Configuration):
      (Vector[SnapshotStore.DeleteFile], Set[String], Vector[String]) = {
    if (posNew.isEmpty) return (Vector.empty, Set.empty, Vector.empty)
    val priorByData = st.currentDeletes
      .filter(d => d.kind == "pos" || d.kind == "dv")
      .groupBy(_.dataPath)
    val work: Vector[(String, Vector[String], Vector[String])] =
      posNew.groupBy(_.dataPath).toVector.map { case (dp, news) =>
        (dp, priorByData.getOrElse(dp, Vector.empty).map(_.path),
          news.map(_.path))
      }
    val superseded = work.iterator.flatMap(_._2).toSet
    val sparkOpt = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val entries =
      if (work.size <= DistributeThreshold || sparkOpt.isEmpty)
        work.map { case (dp, priors, news) =>
          driverFoldFiles.incrementAndGet()
          foldOne(dp, priors, news, dataDir, conf)
        }
      else {
        val sc = sparkOpt.get.sparkContext
        val shipped = new org.apache.spark.util.SerializableConfiguration(conf)
        val dir = dataDir
        val slices = math.min(work.size,
          math.max(sc.defaultParallelism, 1) * 2)
        sc.parallelize(work, slices)
          .map { case (dp, priors, news) =>
            foldOne(dp, priors, news, dir, shipped.value)
          }
          .collect().toVector
      }
    (entries, superseded, posNew.map(_.path))
  }
}
