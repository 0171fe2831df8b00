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

  /** Rescue transform behind [[readRescued]]/[[readStreamRescued]]:
    * applied to a `value` column of JSON lines. Exposed for testing
    * and for callers with their own text source. */
  def rescueJson(lines: DataFrame, schema: StructType): DataFrame = {
    val fields = schema.fieldNames.toSeq
    val parsed = from_json(col("value"), schema)
    val raw = from_json(col("value"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    // fields present in the row but absent from the pinned schema
    val extra = map_filter(col("__raw"),
      (k, _) => !array_contains(lit(fields.toArray), k))
    // fields the typed parse nulled while the raw text had a value —
    // a type violation (raw "null" text is a legitimate null, not a
    // violation)
    val bad = fields.map { f =>
      when(col("__p").getField(f).isNull &&
        col("__raw").getItem(f).isNotNull &&
        col("__raw").getItem(f) =!= "null",
        map(lit(f), col("__raw").getItem(f)))
        .otherwise(map().cast("map<string,string>"))
    }
    val rescuedMap = map_concat(extra +: bad: _*)
    lines
      .select(col("value"), parsed.as("__p"), raw.as("__raw"))
      .select(col("value"), col("__p"), col("__raw"),
        when(col("__raw").isNull, // not JSON at all: rescue the line
          map(lit("_raw"), col("value")))
          .otherwise(rescuedMap).as("__resc"))
      .select(fields.map(f => col("__p").getField(f).as(f)) :+
        when(size(col("__resc")) > 0, to_json(col("__resc")))
          .as("_rescued"): _*)
  }

  /** Schema-drift RESCUE ingest (the Auto Loader `_rescued_data`
    * behavior the reference's platform provides for free): read
    * line-delimited JSON against a PINNED schema with ZERO row loss —
    * a row that violates the schema keeps its parseable fields typed
    * and lands everything else in a `_rescued` JSON-string column:
    *
    *  - extra fields the schema doesn't know → rescued
    *  - type-violating fields (typed parse nulls them while raw text
    *    has a value) → rescued, other fields of the row still typed
    *  - lines that aren't JSON at all → whole line under `"_raw"`
    *
    * Conforming rows get `_rescued = NULL`, so
    * `WHERE _rescued IS NOT NULL` is the drift monitor. Narrow,
    * fully codegen'd (two from_json passes + map ops), zero shuffle
    * — the 100 TB cost is the same one scan the strict read pays. */
  def readRescued(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    rescueJson(spark.read.text(path), schema)

  /** Streaming twin of [[readRescued]] — same transform over
    * `readStream.text`, appends cleanly (no state). */
  def readStreamRescued(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    rescueJson(spark.readStream.text(path), schema)
}
