package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Primitive-long set kernels for the near-dup verify hot path.
  *
  * The HOF/built-in formulation (`size(array_intersect(a, b))`)
  * materializes the intersection ARRAY (allocation per candidate
  * pair) and hashes boxed elements. When both sides are SORTED
  * distinct long arrays — which the near-dup verifies control,
  * because they build the hashed shingle sets themselves — the
  * intersection CARDINALITY is a single allocation-free two-pointer
  * merge. [[SortedLongIntersectCountExpr]] emits that merge inline
  * into whole-stage codegen.
  *
  * PRECONDITION (caller-enforced, not checked): both arrays sorted
  * ascending with distinct elements. Unsorted input silently
  * undercounts — keep construction (`array_sort` at set build) and
  * verify in the same module. */
object SetOps {
  /** |A ∩ B| for sorted distinct long arrays — two-pointer merge. */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `|A ∩ B|` over sorted distinct `array<bigint>` columns (see
  * [[SetOps]] for the precondition). Codegen emits a static call —
  * the merge loop runs compiled inside the enclosing whole-stage
  * function with no boxing and no intermediate array. */
case class SortedLongIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    SetOps.intersectCountSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOps.intersectCountSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
