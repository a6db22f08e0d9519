package graft.sources

import org.apache.spark.sql.connector.expressions.{NamedReference, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.types.DataType

/** RUNTIME data-column FILE skipping — the fact side of a star join
  * pruned by the dimension's ACTUAL join keys, at manifest-stats
  * granularity. Spark's dynamic-pruning machinery plans a subquery over
  * the (broadcast) dimension side for every column a scan reports
  * filterable and re-filters the scan at execution with an IN-list of
  * the real keys; partitioned tables get that for free through identity
  * partition values, but at 100 TB the common layout is a table RANGE-
  * CLUSTERED on its sort key (compaction's output) or bloom-indexed on
  * a scattered key (`stats.bloom-columns`) — where per-FILE min/max and
  * membership filters prune exactly as well as partitions would, with
  * no partitioning declared at all.
  *
  * This object is the efficient evaluator for that path. The generic
  * [[StatsPredicates.definitelyExcludes]] is O(|IN| ) per excluded
  * file — fine for static pushdown's short lists, quadratic pain for a
  * runtime IN carrying thousands of join keys against a million-file
  * manifest. Here the values decode ONCE per scan:
  *
  *   - values sort (type-interpreted ordering) → per file ONE binary
  *     search answers "does any value land in [min, max]" in O(log n);
  *   - values hash ONCE (canonical [[NdvSketch.hash]] form) → a file
  *     whose range overlaps probes its bloom only for the values inside
  *     its range (capped — a file overlapping thousands of keys is
  *     kept, sound and cheap).
  *
  * Soundness is [[StatsPredicates]]'s: a file drops only when NO value
  * can satisfy the predicate — null-counted columns, missing stats, and
  * unsupported shapes keep the file; predicates stay residual. Only the
  * shapes dynamic pruning actually emits are specialized (a bare IN or
  * `=` on one column); anything else falls back to the generic
  * per-file evaluator. */
private[sources] object RuntimeFilePruning {

  /** Bloom probes per file are capped: a file whose range overlaps more
    * than this many IN values is kept on range evidence alone (probing
    * thousands of hashes per file buys little — such a file almost
    * certainly holds one). */
  private val MaxBloomProbesPerFile = 128

  /** One decoded runtime predicate: sorted values + aligned canonical
    * hashes for a single stats column. */
  private final case class Decoded(id: Int, dt: DataType,
      sorted: Array[Any], hashes: Array[Long], hasNull: Boolean,
      ord: Ordering[Any])

  /** Decode `p` when it is the specialized shape (IN / `=` over ONE
    * stats column with all-literal values); None → caller falls back. */
  private def decode(p: VPredicate,
      cols: StatsPredicates.StatCols): Option[Decoded] = {
    def colOf(e: VExpression): Option[(Int, DataType)] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        cols.get(r.fieldNames()(0).toLowerCase)
      case _ => None
    }
    val (col, raw) = p.name() match {
      case "IN" if p.children().length >= 2 =>
        (colOf(p.children()(0)), p.children().drop(1).toSeq)
      case "=" | "<=>" if p.children().length == 2 =>
        colOf(p.children()(0)) match {
          case c @ Some(_) => (c, Seq(p.children()(1)))
          case None => (colOf(p.children()(1)), Seq(p.children()(0)))
        }
      case _ => (None, Nil)
    }
    col.flatMap { case (id, dt) =>
      val lits = raw.map {
        case l: VLiteral[_] if l.dataType == dt => Some(l.value)
        case _ => None
      }
      if (lits.exists(_.isEmpty)) None
      else {
        val hasNull = lits.exists(_.get == null)
        val vals = lits.flatMap(_.toSeq).filter(_ != null).toArray
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(dt)
        java.util.Arrays.sort(vals.asInstanceOf[Array[AnyRef]],
          ord.asInstanceOf[Ordering[AnyRef]])
        // A value the canonical hash cannot cover (never the case for
        // stats-supported types, but a placeholder hash would FALSE-SKIP)
        // disables bloom probing for the whole predicate.
        val hashOpts = vals.map(v => NdvSketch.hash(v, dt))
        val hashes =
          if (hashOpts.exists(_.isEmpty)) null else hashOpts.map(_.get)
        Some(Decoded(id, dt, vals, hashes, hasNull, ord))
      }
    }
  }

  /** Filter `files` by the runtime predicates. Each predicate prunes
    * independently (they arrive conjunctive). */
  def prune(files: Vector[SnapshotStore.DataFile],
      predicates: Array[VPredicate],
      cols: StatsPredicates.StatCols): Vector[SnapshotStore.DataFile] = {
    var out = files
    predicates.foreach { p =>
      decode(p, cols) match {
        case Some(d) => out = out.filterNot(f => excludes(d, f))
        case None =>
          if (StatsPredicates.usable(p, cols))
            out = out.filterNot(f =>
              StatsPredicates.definitelyExcludes(p, cols, f.stats, f.rowCount))
      }
    }
    out
  }

  /** Can file `f` provably satisfy NO value of `d`? O(log |values|)
    * range search + capped bloom probes. */
  private def excludes(d: Decoded, f: SnapshotStore.DataFile): Boolean = {
    val s = f.stats.getOrElse(d.id, return false)
    // A null IN-value matches nothing under IN/=; under <=> it matches
    // null rows — conservatively keep any file when the list holds null
    // (the <=> shape with a pure-null list is rare enough not to carve).
    if (d.hasNull) return false
    if (s.nulls == f.rowCount) return true // all-null column
    if (s.min == null || s.max == null) {
      // No range box (long-string invalidation) — bloom may still decide,
      // but only within the probe cap.
      val b = s.bloom
      if (b == null || d.hashes == null ||
        d.hashes.length > MaxBloomProbesPerFile) return false
      return !d.hashes.exists(h => FileBloom.mightContain(b.bytes, h))
    }
    val mn = TypeWidening.coerce(d.dt, s.min)
    val mx = TypeWidening.coerce(d.dt, s.max)
    // First sorted value >= min (binary search on the decoded array).
    var lo = 0
    var hi = d.sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (d.ord.lt(d.sorted(mid), mn)) lo = mid + 1 else hi = mid
    }
    if (lo == d.sorted.length) return true // every value below the box
    // First sorted value > max — the second binary search (a linear walk
    // here would be O(in-range values) per file, the cost this decoder
    // exists to avoid).
    var lo2 = lo
    var hi2 = d.sorted.length
    while (lo2 < hi2) {
      val mid = (lo2 + hi2) >>> 1
      if (d.ord.gt(d.sorted(mid), mx)) hi2 = mid else lo2 = mid + 1
    }
    val end = lo2
    if (end == lo) return true // nearest value jumps past the box
    val b = s.bloom
    if (b == null || d.hashes == null ||
      end - lo > MaxBloomProbesPerFile) return false
    var i = lo
    while (i < end) {
      if (FileBloom.mightContain(b.bytes, d.hashes(i))) return false
      i += 1
    }
    true
  }
}
