package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Order-preserving fixed-grid bucket id for a double: the top
  * `64 - shift` bits of the IEEE-754 "sortable bits" transform
  * (`bits = doubleToLongBits(d); if (bits < 0) bits = MIN_VALUE - bits`),
  * which maps doubles to signed longs such that `d1 <= d2` implies
  * `sortable(d1) <= sortable(d2)` (-0.0 and 0.0 collide — they are
  * equal anyway; NaN sorts after +Infinity, matching Spark's NaN
  * ordering).
  *
  * Because the grid is a pure function of the VALUE — sign, exponent
  * and the top mantissa bits — range-bucketing with it needs no
  * sampling pass at all: one aggregation over `bucket(v)` yields both
  * the populated bucket boundaries and the per-bucket counts, which
  * is what lets [[graft.operators.Ranks]] run exact rank selection in
  * two jobs instead of three. With the default `shift = 48` the id is
  * sign + 11 exponent bits + 4 mantissa bits: at most 2^16 distinct
  * ids over the entire double range (bounded driver-side counts
  * table at ANY data scale), 16 sub-buckets per power of two.
  * Degenerate case: data concentrated inside one bucket (constant
  * column) collapses the split — lower `shift` for finer grids.
  */
case class SortableBucketExpr(child: Expression, shift: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sortable_bucket"

  override def nullSafeEval(input: Any): Any =
    SortableBucketExpr.bucket(input.asInstanceOf[Double], shift)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bits = ctx.freshName("bits")
      s"""
      long $bits = java.lang.Double.doubleToLongBits($c);
      if ($bits < 0L) $bits = java.lang.Long.MIN_VALUE - $bits;
      ${ev.value} = $bits >> $shift;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SortableBucketExpr =
    copy(child = newChild)
}

object SortableBucketExpr {
  /** JVM kernel shared by eval and tests. */
  def bucket(d: Double, shift: Int): Long = {
    var bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0L) bits = Long.MinValue - bits
    bits >> shift
  }

  def sortableBucket(c: Column, shift: Int): Column =
    ColumnBridge.column(SortableBucketExpr(ColumnBridge.expression(c), shift))
}
