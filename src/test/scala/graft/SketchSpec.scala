package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate sketches as the documented 100 TB alternatives to
  * exact operators: HyperLogLog distinct counts (one pass, fixed
  * memory, mergeable across partitions) vs exact countDistinct
  * (shuffle of every distinct value), and t-digest-style quantiles
  * (percentile_approx) vs the exact rank median. Sketches are not
  * oracle-hash-checkable across engines (implementation-defined), so
  * they are bounded against the exact answers here instead. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within rsd bound of exact") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"HLL error $err (exact=$exact approx=$approx)")
  }

  test("freqItems heavy-hitter sketch finds the hot key, one pass") {
    // a key holding 50% of rows MUST be reported at support 0.1
    // (freqItems guarantees no false negatives above the support)
    val li = Tables.lineitem(spark, sf)
      .select(when(col("l_orderkey") % 2 === 0, lit(1L))
        .otherwise(col("l_orderkey")).as("k"))
    val hits = li.stat.freqItems(Array("k"), 0.1)
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(hits.contains(1L), s"hot key missing from $hits")
  }

  test("percentile_approx close to exact rank median") {
    val li = Tables.lineitem(spark, sf)
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("q_median_price")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, m) =>
      val rel = math.abs(approx(k) - m) / m
      assert(rel <= 0.05, s"flag $k: approx ${approx(k)} vs exact $m")
    }
  }
}
