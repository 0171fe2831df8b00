package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over Spark's own sketch machinery —
  * the manual form of the optimizer's runtime bloom filter
  * (InjectRuntimeFilter), exposed as library primitives.
  *
  * Pattern: when a lookup side is too big to broadcast as an exact
  * hash set but its BLOOM fits comfortably (~1.2 MB per million items
  * at 1% fpp), build the bloom distributed (per-partition sketches,
  * merged), ship it as a plan literal, and probe it IN THE SCAN STAGE
  * of the big side — a codegen'd expression, no join, no shuffle.
  * Probe misses are definite non-members (no false negatives); only
  * the hit slice (true members + fpp of the big side) needs the exact
  * follow-up join, so the shuffled volume drops from the whole corpus
  * to the suspect sliver. Values are probed through xxhash64, the
  * same hash the aggregate puts — keep both sides on these wrappers.
  */
object BloomExpressions {

  /** Standard optimal bit count: -n·ln(p)/ln²2. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1); got $expectedItems, $fpp")
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate column building the bloom of `c`'s values (binary). */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression())

  /** Distributed bloom build: one job, ONE bounded collect — the
    * binary's size is set by expectedItems/fpp at plan time, never by
    * the data (the bounded-collect pattern of the IVF centroids). */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long,
                 fpp: Double): Array[Byte] =
    df.agg(bloomAgg(c, expectedItems, fpp).as("__bf"))
      .head.getAs[Array[Byte]](0)

  /** Membership probe of a built bloom — codegen'd literal probe
    * (Spark's BloomFilterMightContain), safe for scan-stage filters.
    * False positives at ~fpp; false negatives never. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(c))))
}
