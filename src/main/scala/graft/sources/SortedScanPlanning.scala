package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning}
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
              // Memoized feasibility probe at plan time; the exec
              // recomputes the permutation at execution (runtime
              // filtering may remove files — removal preserves both
              // disjointness and strictness).
              m.rangeConcatProbe(order.length > 1) match {
                case Some((_, mayClaim)) =>
                  RangeConcat(order, m, order.length > 1, mayClaim, child)
                case None => s
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
    case _ => Nil
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
