package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach a value from the latest
  * right row with `right.ts <= left.ts` within the same key.
  *
  * Spark has no native as-of join; the classic scalable formulation
  * is union → single (key)-partitioned sort → running `last(...,
  * ignoreNulls)` window — ONE shuffle total, no range cross join, no
  * per-row binary search. (A broadcast-range strategy only wins when
  * the right side is tiny; this version scales with both sides.)
  *
  * Tie semantics: at equal timestamps the right row is considered
  * visible to the left row (<=). Pass `tieBreak` columns that make
  * the right side's ordering total, or pre-dedup the right side, to
  * keep the matched value deterministic.
  */
object AsOfJoin {

  def lastPrior(left: DataFrame, right: DataFrame,
                keyCol: String, tsCol: String,
                valueCol: String, asCol: String,
                tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val leftCols = left.columns
    // union layout: all left columns + the carried right value + side tag
    val l = left
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__is_left", lit(1))
    val r0 = right.select(
      (col(keyCol) +: col(tsCol) +: col(valueCol).as("__val") +:
        tieBreak.map(col)): _*)
    val r = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.withColumn("__is_left", lit(0)).select(l.columns.map(col): _*)

    val ord: Seq[Column] = col(tsCol).asc +: col("__is_left").asc +:
      tieBreak.map(c => col(c).asc)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asCol, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) :+ col(asCol): _*)
  }
}
