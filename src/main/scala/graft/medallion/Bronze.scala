package graft.medallion

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze layer: raw ingestion with payload wrapping + lineage metadata.
  *
  * Reproduces reference bronze semantics (reference:
  * data_lakehouse/etl_scripts/bronze_layer/bronze_ingestion.py:60-87):
  * all source columns are wrapped into a single `payload` struct, and
  * two lineage columns are added — `ingest_file` (source file path,
  * from the parquet/json scan's `_metadata`) and `bronze_ingest_ts`.
  *
  * Works identically for batch DataFrames and streaming DataFrames
  * (the transform is a narrow projection — no shuffle, fully
  * codegen'd, appends cleanly at any scale).
  */
object Bronze {

  /** Wrap all current columns into a `payload` struct + lineage cols. */
  def wrap(df: DataFrame): DataFrame = {
    val payloadCols = df.columns.map(col)
    df.select(struct(payloadCols: _*).as("payload"))
      .withColumn("ingest_file", input_file_name())
      .withColumn("bronze_ingest_ts", current_timestamp())
  }

  /** Deterministic variant for oracle checks: lineage timestamp is a
    * fixed epoch so result hashes are stable across runs. */
  def wrapDeterministic(df: DataFrame): DataFrame = {
    val payloadCols = df.columns.map(col)
    df.select(struct(payloadCols: _*).as("payload"))
      .withColumn("bronze_ingest_ts", to_timestamp(lit("2026-01-01 00:00:00")))
  }

  /** Schema inference from a sample batch (reference:
    * bronze_ingestion.py:34-44 `infer_schema_from_batch`): read a
    * bounded sample, fail fast on empty sources. Used to pin the
    * schema of a subsequent streaming read. */
  def inferSchema(spark: SparkSession, path: String, format: String = "json"): StructType = {
    val sample = spark.read.format(format).option("multiLine", true).load(path)
    if (sample.schema.fields.isEmpty)
      throw new IllegalArgumentException(s"No files / no schema found at $path")
    sample.schema
  }

  /** Streaming bronze ingest: schema-pinned readStream + wrap.
    * Mirrors the reference's readStream(json).schema(...).load then
    * payload-wrap; caller attaches the sink/checkpoint. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 format: String = "json"): DataFrame =
    wrap(spark.readStream.format(format).option("multiLine", true)
      .schema(schema).load(path))
}
