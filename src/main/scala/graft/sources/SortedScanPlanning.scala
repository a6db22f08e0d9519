package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** GLOBAL-SORT elision over sorted scans — the piece Spark itself does
  * not close: `SupportsReportOrdering` feeds the physical
  * `RemoveRedundantSorts` / `EnsureRequirements` machinery, which happily
  * drops LOCAL sorts and join-side sorts over a reported ordering, but a
  * GLOBAL `ORDER BY` additionally requires the child's
  * `outputPartitioning` to satisfy `OrderedDistribution` — and a V2 scan
  * has no way to report range partitioning, so even a fully-sorted,
  * range-distributed table pays `Exchange rangepartitioning + Sort` to
  * produce an order it already has on disk.
  *
  * Two provable cases, tried in order:
  *
  *   - **≤1 planned partition**: per-partition order is global by
  *     definition — drop the Sort outright;
  *   - **range-disjoint multi-partition** (the 100 TB case): when every
  *     file's leading-sort-column range is disjoint from the next
  *     (manifest stats prove it — the shape compaction's range
  *     distribution produces), the scan's partitions CONCATENATED in
  *     file-range order ARE the global order. The Sort is replaced by
  *     [[RangeConcat]], planned as [[RangeConcatExec]]: a zero-work
  *     node that permutes the child RDD's partitions (no shuffle, no
  *     sort, no row is touched) and reports `RangePartitioning` +
  *     the order, so downstream requirements stay satisfied.
  *
  * Feasibility and the permutation come from the scan's own metadata
  * ([[MemScan.rangeConcatPermutation]]) — plan-time cost is O(files)
  * over resident manifests. Multi-partition scans whose ranges overlap
  * keep their Sort: per-partition order says nothing global there.
  */
private[graft] object SortedScanSortElision extends Rule[LogicalPlan] {

  /** Install into `spark.experimental.extraOptimizations` — the ONE
    * logical batch that runs AFTER Early Scan Push-Down has built the
    * ScanRelation and attached its reported ordering (the extension
    * seams — operator-optimization and pre-CBO — both run before it).
    * Idempotent; called from the session-bound analysis rules. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(SortedScanSortElision))
      spark.experimental.extraOptimizations = cur :+ SortedScanSortElision
  }

  private def scanOf(p: LogicalPlan): Option[DataSourceV2ScanRelation] =
    p match {
      case r: DataSourceV2ScanRelation => Some(r)
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        scanOf(c)
      case _ => None
    }

  private def singlePartition(r: DataSourceV2ScanRelation): Boolean =
    r.scan match {
      case m: MemScan => m.planTimePartitionCount <= 1
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ Sort(order, true, child, _) =>
      scanOf(child) match {
        case Some(r) if r.ordering.exists(o =>
            SortOrder.orderingSatisfies(o, order)) =>
          if (singlePartition(r)) child
          else r.scan match {
            case m: MemScan =>
              // Memoized feasibility probes at plan time; the execs
              // recompute at execution (runtime filtering may remove
              // files — removal preserves disjointness, sortedness and
              // strictness). Range-concat (pure partition permutation)
              // first; the k-way merge serves the sorted-but-OVERLAPPING
              // file sets concat refuses.
              val strict = order.length > 1
              m.rangeConcatProbe(strict) match {
                case Some((_, mayClaim)) =>
                  RangeConcat(order, m, strict, mayClaim, child)
                case None => m.mergeGroupsProbe(strict) match {
                  case Some((_, mayClaim)) =>
                    SortedMerge(order, m, r.output, strict, mayClaim, child)
                  case None => s
                }
              }
            case _ => s
          }
        case _ => s
      }
  }
}

/** Logical: global order produced by concatenating the child scan's
  * range-disjoint partitions in range order (replaces a global Sort).
  * `mayClaimClustering` = plan-time STRICT disjointness held everywhere
  * AND no file was split (gates the exec's RangePartitioning claim —
  * see [[MemScan.rangeConcatPermutation]]). */
private[sources] final case class RangeConcat(order: Seq[SortOrder],
    scan: MemScan, strictOnly: Boolean, mayClaimClustering: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan):
      RangeConcat = copy(child = newChild)
}

private[graft] object RangeConcatStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeConcat(order, scan, strict, mayClaim, child) =>
      RangeConcatExec(order, scan, strict, mayClaim, planLater(child)) :: Nil
    case SortedMerge(order, scan, scanOut, strict, mayClaim, child) =>
      SortedMergeExec(order, scan, scanOut, strict, mayClaim,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Knobs for the sorted-overlapping K-WAY MERGE plan
  * ([[MemScan.mergeGroups]] / [[SortedMergeExec]]). */
private[graft] object SortedScanMergePlanning {
  /** `read.merge-scan = false` disables (the A/B lever — answers must be
    * identical, the plan keeps its global Sort);
    * `read.merge-scan.max-fan-in` bounds one component's merge width. */
  val EnabledProp = "read.merge-scan"
  val FanInProp = "read.merge-scan.max-fan-in"

  /** Default fan-in bound: one merge task streaming 16 sorted inputs is
    * comfortably cheaper than re-sorting them, while a component wider
    * than this says the table is NOT in the compacted-plus-appends shape
    * — the parallel Sort is the better plan there. */
  val DefaultFanIn = 16

  def fanInOf(props: Map[String, String]): Int = {
    if (props.get(EnabledProp).exists(_.equalsIgnoreCase("false"))) return 0
    props.get(FanInProp).map(raw =>
      raw.trim.toIntOption.filter(n => n >= 2 && n <= 1024).getOrElse(
        throw new IllegalArgumentException(
          s"$FanInProp must be an integer in [2, 1024], got '$raw'")))
      .getOrElse(DefaultFanIn)
  }
}

/** Logical: global order produced by k-way-merging the child scan's
  * range-overlapping partition groups and concatenating the (range-
  * disjoint) groups in range order — replaces a global Sort over a scan
  * whose files are all sorted but not range-disjoint. `scanOutput` is
  * the SCAN RELATION's output (the merged components read through the
  * connector's own row readers, which emit scan-shaped rows; an
  * attribute-only Project between scan and Sort is re-applied after the
  * merge). */
private[sources] final case class SortedMerge(order: Seq[SortOrder],
    scan: MemScan, scanOutput: Seq[Attribute], strictOnly: Boolean,
    mayClaimClustering: Boolean, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan):
      SortedMerge = copy(child = newChild)
}

/** Physical: one output partition per range-connected component.
  * SINGLETON components pass their planned child partition through
  * untouched (keeping the vectorized decode — at steady state the big
  * compacted files are all singletons); MERGED components k-way-merge
  * their files' streams read through the CONNECTOR'S OWN row readers,
  * created directly off the scan's reader factory. The direct readers
  * are forced by Spark itself: `DataSourceRDD` tracks a per-TASK
  * current-reader state (Spark 4's `ReaderState`, keyed by task attempt
  * id), so two lazily interleaved partition iterators of one DSv2 scan
  * inside one task close each other's reader mid-batch — a merge CANNOT
  * ride the planned child for its overlapping streams.
  *
  * Merging compares FULL row order (boundary-equal leading keys
  * interleave correctly on secondary columns); memory is one head row
  * per stream. No shuffle, no sort. Downstream total-order consumers
  * read output partitions in index order exactly as they would a
  * Sort's. */
private[sources] final case class SortedMergeExec(order: Seq[SortOrder],
    scan: MemScan, scanOutput: Seq[Attribute], strictOnly: Boolean,
    mayClaimClustering: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputOrdering: Seq[SortOrder] = order
  // RangePartitioning additionally promises every key value lives in ONE
  // partition — true only when every inter-component boundary was
  // STRICTLY disjoint (see MemScan.mergeGroups).
  // Plan-time count from the MEMOIZED probe (outputPartitioning is read
  // repeatedly during planning; the fresh recompute is for execution).
  private def planTimeGroups: Int =
    scan.mergeGroupsProbe(strictOnly).map(_._1.length).getOrElse(0)
  override def outputPartitioning: Partitioning =
    if (mayClaimClustering) RangePartitioning(order, planTimeGroups)
    else UnknownPartitioning(planTimeGroups)

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // Recomputed against the EXECUTED file set (runtime filtering may
    // have removed files since planning; removal preserves sortedness
    // and disjointness, and can only narrow components). Deterministic
    // per file set, so plan-time and execution-time calls agree unless
    // the set changed — where a silent wrong order is worse than a loud
    // retry. Runtime filtering can also remove the OVERLAPS themselves —
    // the survivors may be fully range-disjoint, which mergeGroups
    // reports as None (concat's case): degrade to the pure permutation
    // rather than failing a set that got EASIER.
    val (groups, _) = scan.mergeGroups(strictOnly)
      .orElse(scan.rangeConcatPermutation(strictOnly)
        .map { case (perm, claim) => (perm.map(Seq(_)), claim) })
      .getOrElse(throw new IllegalStateException(
        "SortedMerge: the scan's sorted-overlap grouping no longer holds " +
          "at execution — rerun the query (files changed under the plan?)"))
    val covered = groups.map(_.length).sum
    require(covered == rdd.getNumPartitions,
      s"SortedMerge: groups cover $covered partitions but the scan " +
        s"produced ${rdd.getNumPartitions}")
    val parts = scan.planInputPartitions()
    require(parts.length == covered,
      s"SortedMerge: ${parts.length} input partitions vs $covered grouped")
    new MergedScanRDD(rdd, groups.map(_.toArray).toArray,
      scan.toBatch.createReaderFactory(), parts, scanOutput, output, order)
  }

  override protected def withNewChildInternal(newChild: SparkPlan):
      SortedMergeExec = copy(child = newChild)
}

/** Partition i is the k-way merge of input partitions `groups(i)` —
  * passed through the planned child when the group is a singleton, read
  * through fresh connector row readers when it merges (see
  * [[SortedMergeExec]] for why the child's partitions cannot be
  * interleaved within one task). Narrow dependency; no shuffle. Merged
  * rows are scan-shaped and re-projected to the child's output (identity
  * unless an attribute-only Project sat between scan and Sort — the
  * projection also converts to UnsafeRow, which downstream operators
  * and the result serializer require); heads are copied off the
  * readers' reused row buffers, one live row per stream. */
private[sources] final class MergedScanRDD(
    prev: RDD[InternalRow], groups: Array[Array[Int]],
    factory: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    inputParts: Array[org.apache.spark.sql.connector.read.InputPartition],
    scanOutput: Seq[Attribute], projectList: Seq[Attribute],
    order: Seq[SortOrder])
    extends RDD[InternalRow](prev.context,
      Seq(new org.apache.spark.NarrowDependency[InternalRow](prev) {
        override def getParents(partitionId: Int): Seq[Int] =
          groups(partitionId).toSeq
      })) {

  private final class PassP(val index: Int,
      val parent: org.apache.spark.Partition)
      extends org.apache.spark.Partition
  private final class MergeP(val index: Int,
      val parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      extends org.apache.spark.Partition

  override protected def getPartitions: Array[org.apache.spark.Partition] = {
    val ps = firstParent[InternalRow].partitions
    groups.indices.map { i =>
      if (groups(i).length == 1) new PassP(i, ps(groups(i)(0)))
      else new MergeP(i, groups(i).map(inputParts)): org.apache.spark.Partition
    }.toArray
  }

  override def compute(split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext): Iterator[InternalRow] = {
    val mp = split match {
      case p: PassP =>
        return firstParent[InternalRow].iterator(p.parent, context)
      case m: MergeP => m
    }
    // Fresh row readers, one per member stream — independent lifecycles,
    // closed at task completion (idempotence-guarded); the open-reader
    // count is bounded by the fan-in cap.
    def rowsOf(part: org.apache.spark.sql.connector.read.InputPartition):
        Iterator[InternalRow] = {
      val reader = factory.createReader(part)
      var closed = false
      context.addTaskCompletionListener[Unit] { _ =>
        if (!closed) { closed = true; reader.close() }
      }
      new Iterator[InternalRow] {
        private var prepared = false
        private var done = false
        override def hasNext: Boolean = {
          if (!prepared && !done) {
            if (reader.next()) prepared = true else done = true
          }
          prepared
        }
        override def next(): InternalRow = { prepared = false; reader.get() }
      }
    }
    val ordering = new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(order, scanOutput)
    val project = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(projectList, scanOutput)
    final class Stream(val it: Iterator[InternalRow]) {
      var head: InternalRow = _
      def advance(): Boolean =
        if (it.hasNext) { head = it.next().copy(); true } else false
    }
    val heap = new java.util.PriorityQueue[Stream](mp.parts.length,
      (a: Stream, b: Stream) => ordering.compare(a.head, b.head))
    mp.parts.foreach { p =>
      val s = new Stream(rowsOf(p))
      if (s.advance()) heap.add(s)
    }
    new Iterator[InternalRow] {
      override def hasNext: Boolean = !heap.isEmpty
      override def next(): InternalRow = {
        val s = heap.poll()
        val out = s.head
        if (s.advance()) heap.add(s)
        project(out)
      }
    }
  }

  override protected def getPreferredLocations(
      split: org.apache.spark.Partition): Seq[String] = split match {
    case p: PassP => firstParent[InternalRow].preferredLocations(p.parent)
    case m: MergeP => m.parts.toSeq.flatMap(_.preferredLocations()).distinct
  }
}

/** Physical: permute the child's partitions into range order. Zero row
  * work — partitions stream through untouched; only their SCHEDULING
  * order changes, which is exactly what downstream total-order consumers
  * (collect, write, limit) read. */
private[sources] final case class RangeConcatExec(order: Seq[SortOrder],
    scan: MemScan, strictOnly: Boolean, mayClaimClustering: Boolean,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputOrdering: Seq[SortOrder] = order
  // RangePartitioning additionally promises every key value lives in ONE
  // partition — true only under STRICT file disjointness AND one
  // partition per file: a tolerated boundary tie, or a SPLIT file's
  // unknowable intra-file slice boundary, keeps the ORDER correct but
  // can put one key value in two partitions, and claiming clustering
  // there would let a parent elide an Exchange it needs.
  override def outputPartitioning: Partitioning =
    if (mayClaimClustering)
      RangePartitioning(order, child.outputPartitioning.numPartitions)
    else child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // Recompute against the EXECUTED file set (runtime filtering may have
    // removed files since planning; removal preserves disjointness). A
    // mismatch means the plan drifted in a way the rule cannot vouch for
    // — fail loudly; a silently wrong order is worse than a retry.
    val perm = scan.rangeConcatPermutation(strictOnly).map(_._1).getOrElse(
      throw new IllegalStateException(
        "RangeConcat: the scan's range-disjointness no longer holds at " +
          "execution — rerun the query (files changed under the plan?)"))
    require(perm.length == rdd.getNumPartitions,
      s"RangeConcat: permutation covers ${perm.length} partitions but the " +
        s"scan produced ${rdd.getNumPartitions}")
    if (perm == perm.indices) rdd else new ReorderedRDD(rdd, perm.toArray)
  }

  override protected def withNewChildInternal(newChild: SparkPlan):
      RangeConcatExec = copy(child = newChild)
}

/** `prev` with partitions re-indexed by `perm` — partition i of this RDD
  * is partition perm(i) of the parent, computed in place (narrow
  * dependency, locality preserved). */
private[sources] final class ReorderedRDD(
    prev: RDD[InternalRow], perm: Array[Int])
    extends RDD[InternalRow](prev) {
  private final class P(val index: Int, val parent: org.apache.spark.Partition)
      extends org.apache.spark.Partition

  override protected def getPartitions: Array[org.apache.spark.Partition] = {
    val ps = firstParent[InternalRow].partitions
    perm.indices.map(i => new P(i, ps(perm(i))): org.apache.spark.Partition)
      .toArray
  }

  override def compute(split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext): Iterator[InternalRow] =
    firstParent[InternalRow].iterator(
      split.asInstanceOf[P].parent, context)

  override protected def getPreferredLocations(
      split: org.apache.spark.Partition): Seq[String] =
    firstParent[InternalRow].preferredLocations(
      split.asInstanceOf[P].parent)
}
