package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the near-dup hot path.
  *
  * The array-higher-order-function formulations of MinHash/SimHash
  * are correct but slow: HOF lambdas are interpreted (no whole-stage
  * codegen), and each of the k permutations re-evaluates the md5 base
  * hash of every shingle — an O(k·shingles) md5 bill per row. These
  * expressions compute the md5 base hashes ONCE per token/shingle and
  * run the k permutations as a tight JVM loop — one pass per row,
  * ~30x less hashing.
  *
  * Semantics are bit-identical to the HOF versions (and to the DuckDB
  * oracle): base = int(md5(s)[0:15 hex], 16) mod P, affine
  * permutations (a_i·x + b_i) mod P with the shared
  * [[graft.dedup.NearDup.coeffs]] constants.
  */
object PortableHash {
  val P = 1000000007L

  /** Per-thread MD5 instance — getInstance per row is measurable at
    * millions of rows, and MessageDigest is not thread-safe. */
  private val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  def md(): MessageDigest = localMd.get()

  /** int(first 15 hex chars of md5(utf8), 16) % P — matches
    * `conv(substring(md5(c),1,15),16,10) % P` and DuckDB
    * `('0x'||substr(md5(s),1,15))::BIGINT % P`. */
  def baseHash(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = 7.5 bytes: bytes 0..6 fully + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    v % P
  }

  /** Raw 60-bit hash (no modulus) — matches DuckDB
    * `('0x'||substr(md5(s),1,15))::BIGINT`. Used where all 60 bits
    * carry signal (SimHash bit votes). */
  def baseHash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Whitespace tokenization matching split(trim(s), "\\s+"). */
  def tokenize(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty[String] else t.split("\\s+")
  }
}

/** 60-bit SimHash over whitespace tokens; NULL when no tokens.
  * 60 bits (vs the r1 30) double the hamming resolution AND give the
  * banded pair join 8-9-bit bands (256-512 buckets each) instead of
  * 4-5-bit ones — ~16x fewer bucket-join candidates at equal recall. */
case class SimHashExpr(child: Expression)
  extends UnaryExpression {

  val Bits = 60

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  /** Boxed Long, or null when the input has no tokens. Public: the
    * generated code calls it through a reference object. */
  def kernel(input: UTF8String): java.lang.Long = {
    val toks = PortableHash.tokenize(input.toString)
    if (toks.isEmpty) return null
    val md = PortableHash.md()
    val votes = new Array[Int](Bits)
    toks.foreach { t =>
      val h = PortableHash.baseHash60(md, t)
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashExpr", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = $ref.kernel($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** MinHash signature over word n-gram shingles; NULL when fewer than
  * `shingleSize` tokens. Coefficients (a_i, b_i) are passed in so the
  * oracle SQL generator and this expression share one constant list. */
case class MinHashSigExpr(child: Expression, shingleSize: Int,
                          coeffs: Seq[(Long, Long)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  private val as = coeffs.map(_._1).toArray
  private val bs = coeffs.map(_._2).toArray

  /** GenericArrayData signature, or null when fewer than shingleSize
    * tokens. Public: called from generated code via reference obj. */
  def kernel(input: UTF8String): ArrayData = {
    val toks = PortableHash.tokenize(input.toString)
    if (toks.length < shingleSize) return null
    val md = PortableHash.md()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - shingleSize) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val x = PortableHash.baseHash(md, sb.toString)
      var c = 0
      while (c < k) {
        val h = (as(c) * x + bs(c)) % PortableHash.P
        if (h < mins(c)) mins(c) = h
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigExpr", this, classOf[MinHashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r = $ref.kernel($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simHash(c: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(c)))

  def minHashSignature(c: Column, shingleSize: Int, coeffs: Seq[(Long, Long)]): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), shingleSize, coeffs))
}
