package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication by key columns.
  *
  * Reproduces the silver-layer `dropDuplicates(primary_keys)` of the
  * reference (reference: data_lakehouse/etl_scripts/silver_layer/
  * silver_transformation.py:85-90), with a deterministic variant for
  * oracle-checked pipelines.
  *
  * Scale: both variants are a single hash-shuffle on the key —
  * partial (map-side) aggregation bounds shuffle volume for `first`,
  * and the window variant shuffles once then sorts within partitions.
  * No collect, no cross join; survives arbitrary row counts as long
  * as no single key is pathologically hot (for that, pre-aggregate
  * with a salt or fingerprint the key first).
  */
object Dedup {

  /** Spark's native dropDuplicates — arbitrary survivor (matches the
    * reference exactly; not deterministic across runs). */
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic keep-first: survivor is the row that sorts first
    * by `orderCols` per key (row_number over a key-partitioned
    * window). Pass enough order columns to make the sort total —
    * ties on the ordering make the survivor engine-dependent. */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: String*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-latest by timestamp/version columns (CDC-style upsert
    * compaction — the batch analog of streaming dropDuplicates). */
  def keepLatest(df: DataFrame, keys: Seq[String], orderCols: String*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
