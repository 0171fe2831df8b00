package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg spec's BUCKET transform hash (spec "Appendix B:
  * 32-bit Hash Requirements"): murmur3_x86_32 with seed 0 over the
  * value's spec-mandated byte form — int/long/date/timestamp widen to
  * long and hash its 8-byte little-endian encoding; strings hash
  * their UTF-8 bytes. `bucket(N, v) = (hash(v) & Int.MaxValue) % N`.
  * Implemented from the public MurmurHash3 algorithm (Austin Appleby,
  * public domain) — Spark's own Murmur3 helpers use different
  * seeds/layouts and would NOT match external Iceberg writers. */
object IcebergTransforms {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k: Int): Int = {
    var k1 = k * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }
  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }
  private def fmix32(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  /** murmur3_x86_32(seed 0) of arbitrary bytes. */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nblocks = len >>> 2
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      val k = (data(base) & 0xFF) |
        ((data(base + 1) & 0xFF) << 8) |
        ((data(base + 2) & 0xFF) << 16) |
        ((data(base + 3) & 0xFF) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xFF) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xFF) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xFF
      h1 ^= mixK1(k1)
    }
    fmix32(h1, len)
  }

  /** murmur3_x86_32(seed 0) of the long's 8-byte little-endian form —
    * the hash of every integral Iceberg type (int widens to long). */
  def hashLong(v: Long): Int = {
    var h1 = mixH1(0, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix32(h1, 8)
  }

  private def bucketOf(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  // static entry points shared by eval and generated code
  def bucketLong(v: Long, n: Int): Int = bucketOf(hashLong(v), n)
  def bucketUtf8(s: UTF8String, n: Int): Int = bucketOf(hashBytes(s.getBytes), n)
  def bucketBinary(b: Array[Byte], n: Int): Int = bucketOf(hashBytes(b), n)
}

/** `bucket(n, child)` as a native codegen'd Catalyst expression —
  * the write-staging (and pruning) leg of Iceberg hidden
  * partitioning. Accepts the spec's hashable primitives. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket count must be positive, got $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket transform does not support ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Long], n)
    case StringType =>
      IcebergTransforms.bucketUtf8(input.asInstanceOf[UTF8String], n)
    case BinaryType =>
      IcebergTransforms.bucketBinary(input.asInstanceOf[Array[Byte]], n)
    case other => throw new UnsupportedOperationException(
      s"bucket transform does not support ${other.simpleString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the object's STATIC FORWARDERS — valid Java (`Foo.MODULE$` is
    // only a member of the mangled `Foo$` class and would fail Janino,
    // silently dropping the whole stage to interpreted execution)
    val helper = IcebergTransforms.getClass.getName.stripSuffix("$")
    child.dataType match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketLong((long)$c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketUtf8($c, $n)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketBinary($c, $n)")
      case other => throw new UnsupportedOperationException(
        s"bucket transform does not support ${other.simpleString}")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
