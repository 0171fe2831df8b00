package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for dedup/fingerprint keys — the step
  * a multilingual corpus needs BEFORE exact/near dedup so that
  * byte-different renderings of the same text collide:
  *
  *  1. NFKC compatibility normalization (ligatures ﬁ→fi, fullwidth
  *     forms, compatibility variants);
  *  2. accent folding: NFD decompose, drop combining marks (é→e);
  *  3. locale-independent lowercase (Locale.ROOT);
  *  4. whitespace collapse + trim (any run of Unicode whitespace →
  *     one space).
  *
  * Custom expression with real codegen (same refobj pattern as
  * [[ShinglesExpr]]) — java.text.Normalizer in a per-row call, no
  * UDF, stays inside whole-stage codegen. Deterministic: the JDK
  * Unicode tables are fixed per JVM; cross-engine oracles should
  * grade ASCII fixtures or replicate with ICU-equivalent functions.
  */
case class NormalizeTextExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normExpr", this, classOf[NormalizeTextExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.kernel($c);")
  }

  /** Public: called from generated code via reference obj. */
  def kernel(input: UTF8String): UTF8String = {
    val s = input.toString
    val nfkc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val nfd = java.text.Normalizer.normalize(nfkc, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      i += Character.charCount(cp)
      val t = Character.getType(cp)
      val isMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || t == Character.ENCLOSING_MARK
      if (!isMark) {
        if (Character.isWhitespace(cp)) pendingSpace = started
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(Character.toLowerCase(cp))
          started = true
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def normalize(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
}
