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
    * by `orderCols` per key. Pass enough order columns to make the
    * sort total — ties on the ordering make the survivor
    * engine-dependent.
    *
    * Implemented as `min_by(whole-row, ordering-struct)` aggregation,
    * NOT a row_number window: hash aggregation gets true map-side
    * partial combine (one candidate row per key per map partition
    * crosses the wire, no per-partition sort), which is the cheaper
    * shape when keys are many and rows per key are few — the common
    * dedup case. Struct ordering compares orderCols
    * lexicographically with null-first asc semantics, matching the
    * window formulation exactly. */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: String*): DataFrame =
    keepBy(df, keys, orderCols, latest = false)

  /** Keep-latest by timestamp/version columns (CDC-style upsert
    * compaction — the batch analog of streaming dropDuplicates).
    * `max_by` aggregation; desc with nulls-last semantics (null
    * ordering keys never beat non-null), as the window version. */
  def keepLatest(df: DataFrame, keys: Seq[String], orderCols: String*): DataFrame =
    keepBy(df, keys, orderCols, latest = true)

  private def keepBy(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                     latest: Boolean): DataFrame = {
    val row = struct(df.columns.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    val pick = if (latest) max_by(row, ord) else min_by(row, ord)
    df.groupBy(keys.map(col): _*)
      .agg(pick.as("__row"))
      .select(col("__row.*"))
  }
}
