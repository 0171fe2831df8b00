package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a single-pass JVM loop.
  *
  * The higher-order-function formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, ...)))`)
  * is interpreted (HOFs don't participate in whole-stage codegen) and
  * re-evaluates the regex `split` for every output element — measured
  * ~1.5 ms/doc at 300 chars, which made shingling the dominant cost of
  * the whole near-dup suite. This expression tokenizes once and emits
  * all shingles in one pass (~µs/doc).
  *
  * Semantics identical to the HOF version: tokens = split(trim(s),
  * "\\s+"); fewer than n tokens → empty array; NULL in → NULL out.
  * With `distinct = true`, keeps the first occurrence of each shingle
  * (matching `array_distinct` order semantics).
  */
case class ShinglesExpr(child: Expression, shingleSize: Int, distinct: Boolean,
                        chars: Boolean = false)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($c);")
  }

  /** Never null for non-null input (empty array when too few tokens).
    * Public: called from generated code via reference obj.
    * `chars = true` slides over raw characters (no trim, no
    * separator) instead of whitespace tokens. */
  def kernel(input: UTF8String): ArrayData = {
    val str = input.toString
    val toks: Array[String] =
      if (chars) {
        // slide over CODEPOINTS, not UTF-16 units — a surrogate pair
        // (emoji, CJK-ext) must stay one "character", matching the
        // codepoint semantics of DuckDB substr in the oracle
        str.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      } else PortableHash.tokenize(str)
    val n = toks.length - shingleSize + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val sb = new java.lang.StringBuilder
    val seen = if (distinct) new java.util.LinkedHashSet[String]() else null
    val out = if (distinct) null else new Array[Any](n)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0 && !chars) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (distinct) seen.add(sb.toString)
      else out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (distinct) {
      val arr = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(arr)
    } else new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def shingles(c: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(c), n, distinct))

  def charNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(c), n,
      distinct = false, chars = true))
}
