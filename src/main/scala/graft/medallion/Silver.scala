package graft.medallion

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Flatten}

/** Silver layer: flatten + dedup + ingestion timestamp.
  *
  * Reproduces reference silver semantics (reference:
  * data_lakehouse/etl_scripts/silver_layer/silver_transformation.py:
  * 62-117 `run_silver_streaming`): select `payload.*` plus lineage,
  * recursively flatten nested structs / explode arrays-of-structs,
  * deduplicate on the entity primary key, stamp `silver_ingest_ts`.
  *
  * The whole transform is shuffle-free except the dedup (one hash
  * exchange on the PK) — at 100 TB that single exchange is the
  * theoretical minimum for exact dedup.
  */
object Silver {

  /** Full silver transform over a bronze (payload-wrapped) frame. */
  def transform(bronze: DataFrame, primaryKeys: Seq[String]): DataFrame = {
    val unwrapped = {
      val lineage = bronze.columns.filter(_ != "payload").map(col)
      bronze.select(col("payload.*") +: lineage: _*)
    }
    val flat = Flatten(unwrapped)
    val available = primaryKeys.filter(flat.columns.contains)
    val deduped =
      if (available.nonEmpty) Dedup.byKey(flat, available) else flat
    deduped.withColumn("silver_ingest_ts", current_timestamp())
  }

  /** Deterministic variant for oracle checks: keep-first dedup by
    * `orderCol`, no wall-clock timestamp. */
  def transformDeterministic(bronze: DataFrame, primaryKeys: Seq[String],
                             orderCol: String): DataFrame = {
    val unwrapped = {
      val lineage = bronze.columns.filter(_ != "payload").map(col)
      bronze.select(col("payload.*") +: lineage: _*)
    }
    val flat = Flatten(unwrapped)
    val available = primaryKeys.filter(flat.columns.contains)
    if (available.nonEmpty) Dedup.keepFirst(flat, available, orderCol) else flat
  }
}
