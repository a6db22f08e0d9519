package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** GLOBAL-SORT elision over single-partition sorted scans — the piece
  * Spark itself does not close: `SupportsReportOrdering` feeds the
  * physical `RemoveRedundantSorts` / `EnsureRequirements` machinery,
  * which happily drops LOCAL sorts and join-side sorts over a reported
  * ordering, but a GLOBAL `ORDER BY` additionally requires the child's
  * `outputPartitioning` to satisfy `OrderedDistribution` — and a V2 scan
  * has no way to report range partitioning, so even a ONE-file sorted
  * scan pays `Exchange rangepartitioning + Sort` to produce an order it
  * already has.
  *
  * This rule closes exactly the provable case: a global `Sort` whose
  * child is (an attribute-only projection over) a catalog scan that
  * REPORTS a satisfying ordering and plans AT MOST ONE input partition —
  * one partition makes per-partition order global by definition. The
  * partition count comes from the scan's own split planning (metadata
  * only; a compacted range-distributed table under the default split
  * size is the target shape). Multi-partition scans keep their Sort:
  * per-partition order says nothing about inter-partition order.
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
            SortOrder.orderingSatisfies(o, order)) && singlePartition(r) =>
          child
        case _ => s
      }
  }
}
