package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{InterpretedOrdering, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Fold a global `Sort` over a small batch [[LocalRelation]] into a
  * pre-sorted [[LocalRelation]] (optimization round 20, guide §2.4: remove
  * shuffles outright).
  *
  * Every model-plane fold (`est_*`, `spn_*`, the transparent-AQP family)
  * and every driver-side diagnostics op (`dedup_lsh_stats`, `rdc_matrix`,
  * ...) ends in `ORDER BY` over a LocalRelation of a handful of rows.
  * Spark still plans that as `Exchange rangepartitioning(...) + Sort` —
  * a range-sampling job plus a shuffle per query, ~20+ queries of pure
  * fixed overhead in the suite. Sorting the rows once at plan time with
  * the SAME `SortOrder` comparator Spark's SortExec would use (interpreted
  * here — bounded driver work on ≤ [[FoldLocalSort.maxRows]] rows, §5)
  * yields an identical result: same rows, same order (ties keep the
  * relation's original order — a stable sort refines the distributed
  * sort's arbitrary tie order deterministically).
  *
  * Guards: batch-only relations with no source stream, deterministic
  * subquery-free sort keys resolved against the child output, and a row
  * cap so a large `parallelize`d relation never turns into driver work.
  */
object FoldLocalSort extends Rule[LogicalPlan] {

  /** Above this the distributed sort is the right plan; every fold this
    * rule targets is orders of magnitude smaller.
    */
  val maxRows = 65536

  /** Default-ON kill switch, used by PlanDump/measurement to capture the
    * pre-r20 plan shape from the same binary.
    */
  val enabledKey = "spark.graft.foldLocalSort.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(enabledKey, "true").toBoolean) plan
    else fold(plan)

  private def fold(plan: LogicalPlan): LogicalPlan = plan transform {
    case Sort(order, true, lr @ LocalRelation(output, data, false, None), _)
        if data.nonEmpty && data.length <= maxRows &&
          order.forall(o =>
            o.deterministic && o.references.subsetOf(lr.outputSet) &&
              !o.exists(_.isInstanceOf[PlanExpression[_]])) =>
      // InterpretedOrdering binds the order expressions to the child
      // output; Seq.sorted is stable (TimSort), so equal keys keep the
      // relation's original row order.
      val ordering = new InterpretedOrdering(order, output)
      LocalRelation(output, data.sorted(ordering.asInstanceOf[Ordering[InternalRow]]),
        isStreaming = false)
  }
}
