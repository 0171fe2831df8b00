package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE: merge per-row MinHash signatures into
  * the signature of the UNION of the rows' shingle sets.
  *
  * MinHash property: sig(A ∪ B) = elementwise-min(sig(A), sig(B)) —
  * so a group's merged signature estimates Jaccard against any other
  * set exactly as if it had been computed from the union directly.
  * Use cases: cluster-level signatures after near-dup clustering
  * (compare whole clusters, not members), incremental corpus
  * signatures (merge yesterday's signature with today's batch).
  *
  * This is graft's demonstration of the custom-AGGREGATE extension
  * tier (TypedImperativeAggregate): partial aggregation works —
  * each map task merges locally and ships one numHashes-long buffer,
  * and merge order cannot matter (min is commutative/associative),
  * so results are deterministic under any partitioning.
  */
case class MinHashMergeAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == numHashes,
        s"graft_minhash_merge: expected signature of length $numHashes, " +
          s"got ${arr.numElements()}")
      var i = 0
      while (i < numHashes) {
        val x = arr.getLong(i)
        if (x < buffer(i)) buffer(i) = x
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(0) == Long.MaxValue) null // no non-null input signatures
    else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashMergeAgg =
    copy(child = newChild)
}

object MinHashMergeAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `agg(MinHashMergeAgg.merge(sigCol))`. */
  def merge(sig: Column, numHashes: Int = graft.dedup.NearDup.NumHashes): Column =
    ColumnBridge.column(
      MinHashMergeAgg(ColumnBridge.expression(sig), numHashes)
        .toAggregateExpression())
}
