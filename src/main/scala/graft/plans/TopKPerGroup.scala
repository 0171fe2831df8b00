package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Which ranking function the rewritten filter bounded. Semantics of
  * "keep rank ≤ k" per mode:
  *  - [[RowNum]]: exactly k rows per group (ties split arbitrarily,
  *    as row_number does);
  *  - [[Rnk]]: every row with fewer than k strict predecessors —
  *    boundary ties ALL survive, so a group may keep more than k;
  *  - [[DenseRnk]]: every row among the k smallest DISTINCT order
  *    values. */
sealed trait RankMode
case object RowNum extends RankMode
case object Rnk extends RankMode
case object DenseRnk extends RankMode

/** Native top-k-per-group: the whole-operator custom-plan path
  * (LogicalPlan + Rule + SparkStrategy + SparkPlan, registered via
  * [[graft.GraftExtensions]]).
  *
  * The standard Spark idiom
  *
  *   row_number()/rank()/dense_rank()
  *     OVER (PARTITION BY g ORDER BY o) <= k
  *
  * executes as Exchange → SORT THE ENTIRE PARTITION → Window →
  * Filter: O(n log n) comparisons and a full buffered sort per
  * partition, all to keep ~k rows per group. [[RewriteTopKPerGroup]]
  * recognizes exactly that pattern in the optimized plan and
  * replaces it with [[TopKPerGroup]], planned by
  * [[TopKPerGroupStrategy]] as a TWO-PHASE [[TopKPerGroupExec]]:
  * a partial pass keeps each group's per-partition winners (so at
  * most winners-per-group×partitions rows reach the exchange —
  * map-side reduction the window can never do), then the
  * post-shuffle final pass merges winners and emits each surviving
  * row with its rank. The subset argument is mode-uniform: a row's
  * strict-predecessor (or distinct-predecessor) count in any SUBSET
  * is ≤ its global count, so per-partition winners always contain
  * the global winners. O(n log k), bit-identical output for any
  * total ordering (ties behave exactly as the window function does).
  *
  * Memory profile: the PARTIAL pass holds per-partition winners —
  * for row_number exactly groups×k rows — in a heap map, guarded by
  * a task row budget (`spark.graft.topk.taskRowBudget`, default 4M
  * retained rows): past the budget the pass stops absorbing and
  * passes the remaining rows through unchanged, which is always
  * sound (the partial pass only needs to emit a SUPERSET of each
  * group's winners), so a near-unique group key degrades to a plain
  * shuffle instead of an OOM. The FINAL pass holds O(1) state: it
  * requires a (group, order) child ordering — Spark plans its
  * spillable SortExec over just the map-side winners (output-sized,
  * ≪ input) — and streams each group counting ranks, so no task
  * ever buffers a group.
  *
  * Kill-switch: `spark.graft.rewrite.topk=false` (the rewrite is
  * semantics-preserving, but a scale guardrail you can't disable is
  * a liability). The rewrite only fires on a single-expression
  * ranking window with a non-empty PARTITION BY — the global
  * (partition-less) case is the single-reducer anti-pattern
  * [[graft.operators.Ranks]] exists for.
  */
case class TopKPerGroup(partition: Seq[Expression], order: Seq[SortOrder],
                        k: Int, mode: RankMode, rnAttr: Attribute,
                        child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object RewriteTopKPerGroup extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewrite.topk", "true") == "true"

  /** rank bound from the filter condition:
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

  /** The ranking window functions all carry an UNBOUNDED PRECEDING →
    * CURRENT ROW frame (ROWS for row_number, RANGE for rank family);
    * the frame carries no extra semantics for them. */
  private def isRankingWindow(e: NamedExpression): Option[(Alias, RankMode)] =
    e match {
      case a @ Alias(WindowExpression(fn,
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))), _) =>
        fn match {
          case _: RowNumber => Some((a, RowNum))
          case _: Rank => Some((a, Rnk))
          case _: DenseRank => Some((a, DenseRnk))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case f @ LFilter(cond, w: LWindow)
        if w.windowExpressions.length == 1 && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty =>
        isRankingWindow(w.windowExpressions.head) match {
          case Some((alias, mode)) =>
            bound(cond, alias.exprId) match {
              case Some(k) if k >= 1 =>
                TopKPerGroup(w.partitionSpec, w.orderSpec, k, mode,
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
    case TopKPerGroup(p, o, k, mode, rn, child) =>
      val partial =
        TopKPerGroupExec(p, o, k, mode, rn, partial = true, planLater(child))
      TopKPerGroupExec(p, o, k, mode, rn, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Winners of one group under [[RowNum]]: bounded max-heap (the head
  * is the worst of the current k — evicted when a better row
  * arrives). */
private[plans] final class HeapGroup(k: Int,
                                     ord: java.util.Comparator[InternalRow]) {
  private val heap = new java.util.PriorityQueue[InternalRow](k,
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(b, a)
    })
  def add(row: InternalRow): Unit =
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(row.copy())
    }
  /** rows ascending with their 1-based row_number. */
  def emit(): Iterator[(InternalRow, Int)] = {
    val arr = heap.toArray(new Array[InternalRow](heap.size))
    java.util.Arrays.sort(arr, ord)
    arr.iterator.zipWithIndex.map { case (r, i) => (r, i + 1) }
  }
}

/** Winners of one group under [[Rnk]]/[[DenseRnk]]: an ordered map
  * of tie buckets keyed by a representative row (the comparator sees
  * only the ORDER BY columns, so tied rows share a bucket), trimmed
  * from the top so only keys that can still produce rank ≤ k
  * remain. */
private[plans] final class TieGroup(k: Int,
                                    ord: java.util.Comparator[InternalRow],
                                    dense: Boolean) {
  private val buckets =
    new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ord)
  private var total = 0

  def add(row: InternalRow): Unit = {
    val copied = row.copy()
    var bucket = buckets.get(copied)
    if (bucket == null) {
      bucket = new java.util.ArrayList[InternalRow]()
      buckets.put(copied, bucket)
    }
    bucket.add(copied); total += 1
    // trim keys that can no longer reach rank <= k
    var done = false
    while (!done && buckets.size > 0) {
      val last = buckets.lastEntry()
      val droppable =
        if (dense) buckets.size > k
        else total - last.getValue.size >= k // strict predecessors of last
      if (droppable) {
        total -= last.getValue.size
        buckets.remove(last.getKey)
      } else done = true
    }
  }

  /** (row, rank) ascending; rank per the mode's semantics. */
  def emit(): Iterator[(InternalRow, Int)] = {
    import scala.jdk.CollectionConverters._
    var cum = 0
    buckets.values().iterator().asScala.zipWithIndex.flatMap {
      case (bucket, denseIdx) =>
        val rank = if (dense) denseIdx + 1 else cum + 1
        cum += bucket.size
        bucket.iterator().asScala.map(r => (r, rank))
    }
  }
}

/** Per-group top-k winners. `partial = true` runs before the
  * exchange with no distribution requirement (map-side reduction, no
  * rank emitted): row_number uses a plain size-k max-heap,
  * rank/dense_rank a tie-aware ordered bucket map, and a retained-row
  * budget caps the task's heap — past it, remaining rows pass through
  * unchanged (a valid partial reduction is any per-group SUPERSET of
  * the winners). The final pass requires clustering AND (group,
  * order) ordering — Spark's spillable sort — and streams rows
  * counting the mode's 1-based rank with O(1) state; rank of a
  * winner among the winner superset equals its global rank because
  * every predecessor of a winner is itself a winner. */
case class TopKPerGroupExec(partition: Seq[Expression], order: Seq[SortOrder],
                            k: Int, mode: RankMode, rnAttr: Attribute,
                            partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rnAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partition))

  private def groupOrdering: Seq[SortOrder] =
    partition.map(SortOrder(_, Ascending)) ++ order

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupOrdering)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupOrdering

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partition
    val sortOrder = order
    val rnkMode = mode
    val kk = k
    val rn = rnAttr
    // resolved on the driver: retained-row budget for the partial
    // pass's heap (HeapGroup caps at k rows/group, TieGroup at the
    // tie-trimmed winner set), sized so a task's buffered winners
    // stay far below executor memory even at wide rows
    val budget = conf.getConfString("spark.graft.topk.taskRowBudget",
      "4000000").toLong
    if (partial) child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord: java.util.Comparator[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      val groups = new java.util.HashMap[UnsafeRow, AnyRef]()
      var overBudget = false
      while (iter.hasNext && !overBudget) {
        val row = iter.next()
        val key = keyProj(row)
        var group = groups.get(key)
        if (group == null) {
          group = rnkMode match {
            case RowNum => new HeapGroup(kk, ord)
            case Rnk => new TieGroup(kk, ord, dense = false)
            case DenseRnk => new TieGroup(kk, ord, dense = true)
          }
          groups.put(key.copy(), group)
          // worst-case retained rows ≈ groups×k; checked on group
          // creation so the common few-groups path never pays it
          if (groups.size().toLong * kk > budget) overBudget = true
        }
        group match {
          case g: HeapGroup => g.add(row)
          case g: TieGroup => g.add(row)
        }
      }
      import scala.jdk.CollectionConverters._
      val winners = groups.values().iterator().asScala.flatMap { group =>
        val ranked = group match {
          case g: HeapGroup => g.emit()
          case g: TieGroup => g.emit()
        }
        ranked.map(_._1)
      }
      // budget exceeded: ship the rest unreduced — the final pass is
      // exact over any winner superset, so this only costs shuffle
      winners ++ iter
    } else child.execute().mapPartitions { iter =>
      // clustered + sorted input: stream each group, count ranks,
      // emit while rank <= k — no per-group buffering at all
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord: java.util.Comparator[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      val outProj = UnsafeProjection.create(childOutput :+ rn, childOutput :+ rn)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = null
        private var seen = 0        // row_number within group
        private var prevRank = 0    // rank of the previous row
        private var prevRow: InternalRow = null
        private var ready = false
        private var out: InternalRow = null
        private def advance(): Unit = {
          while (!ready && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy(); seen = 0; prevRank = 0; prevRow = null
            }
            seen += 1
            val tied = prevRow != null && ord.compare(row, prevRow) == 0
            val rank = rnkMode match {
              case RowNum => seen
              case Rnk => if (tied) prevRank else seen
              case DenseRnk => if (tied) prevRank else prevRank + 1
            }
            prevRow = row.copy(); prevRank = rank
            if (rank <= kk) {
              out = outProj(joined(row, InternalRow(rank)))
              ready = true
            }
          }
        }
        override def hasNext: Boolean = { if (!ready) advance(); ready }
        override def next(): InternalRow = {
          if (!ready) advance()
          ready = false; out
        }
      }
    }
  }
}
