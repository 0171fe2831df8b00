package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Recursive flattening of nested structs and arrays-of-structs.
  *
  * Reproduces the silver-layer semantics of the reference
  * (reference: data_lakehouse/etl_scripts/silver_layer/
  * silver_transformation.py:37-57 `flatten_df`): every StructType
  * column `s` with field `c` becomes a top-level column `s_c`; every
  * ArrayType(StructType) column is exploded to one row per element,
  * then its struct is flattened on the next iteration. Repeats until
  * no nested columns remain.
  *
  * Spark-first: expressed as a single `select` per nesting level so
  * Catalyst collapses the projections into one; `explode` is the
  * built-in generator (whole-stage codegen'd). Struct field access is
  * a zero-cost projection on parquet (nested-column pruning pushes
  * the needed leaves into the scan).
  */
object Flatten {

  /** One flattening pass; returns None when already flat. */
  private def flattenOnce(df: DataFrame): Option[DataFrame] = {
    val fields = df.schema.fields
    val structCols = fields.collect {
      case f if f.dataType.isInstanceOf[StructType] => f.name
    }.toSet
    val arrayStructCols = fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] &&
        f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] => f.name
    }.toSet

    if (structCols.isEmpty && arrayStructCols.isEmpty) return None

    // Expand structs in-place (preserving column order, reference
    // appends expansions after the remaining columns — we keep the
    // reference's `select("*", expanded...).drop(s)` ordering:
    // non-struct columns first, then expansions in struct order.
    val kept: Seq[Column] = fields.collect {
      case f if !structCols.contains(f.name) => col(f.name)
    }.toSeq
    val expanded: Seq[Column] = fields.collect {
      case f if structCols.contains(f.name) =>
        f.dataType.asInstanceOf[StructType].fields.map { sub =>
          col(s"${f.name}.${sub.name}").as(s"${f.name}_${sub.name}")
        }.toSeq
    }.flatten.toSeq
    var out = df.select(kept ++ expanded: _*)

    // Explode arrays-of-structs (one row per element); the resulting
    // struct column is expanded on the next pass.
    arrayStructCols.foreach { a =>
      out = out.withColumn(a, explode(col(a)))
    }
    Some(out)
  }

  /** Fully flatten: repeat until no struct / array-of-struct columns. */
  def apply(df: DataFrame): DataFrame = {
    var cur = df
    var next = flattenOnce(cur)
    while (next.isDefined) { cur = next.get; next = flattenOnce(cur) }
    cur
  }
}
