package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested loop.
  *
  * Spark plans a plain non-equi join `pt BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin (or worse, a cartesian product) — O(n·m)
  * comparisons and a plan PlanLintSpec forbids. This operator runs
  * the classic fixed-grid bucketing instead: both sides are bucketed
  * on a time grid, the interval side explodes into every bucket it
  * covers, the join is a plain shuffled EQUI-join on
  * (keys, bucket), and the exact range predicate filters after.
  *
  * Exactness: a qualifying (point, interval) pair shares the
  * point's bucket — which the interval, covering the point, must
  * also cover — so no pair is missed; and since each pair meets in
  * EXACTLY ONE bucket (the point lives in one bucket), no dedup
  * pass is needed.
  *
  * Scale: replication factor on the interval side is
  * `width/bucketMs + 1` — pick `bucketMs` near the typical interval
  * width. Hot (key, bucket) cells are ordinary equi-join skew
  * (AQE skew-join or [[Skew.saltedJoin]] apply).
  */
object RangeJoin {

  private val B = "__rj_bucket"

  /** Inner-join `left` points (`ptCol`, numeric, e.g. epoch ms) to
    * `right` intervals [`loCol`, `hiCol`] sharing `keys`. Column
    * names must not collide across sides (alias before calling). */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      keys: Seq[String], ptCol: String,
                      loCol: String, hiCol: String,
                      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val lb = left.withColumn(B, floor(col(ptCol) / bucketMs).cast("long"))
    val rb = right.withColumn(B,
      explode(sequence(floor(col(loCol) / bucketMs).cast("long"),
        floor(col(hiCol) / bucketMs).cast("long"))))
    lb.join(rb, keys :+ B)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop(B)
  }
}
