package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality check framework.
  *
  * Re-expresses the reference's quality suite (reference:
  * data_lakehouse/data_quality_checks/silver_layer_data_quality_checks
  * .py and gold_layer_data_quality_checks.py): each check returns the
  * VIOLATING rows, so an empty result means the check passes. All
  * checks are narrow filters (predicate-pushdown friendly — at scan
  * time on parquet only the checked columns are read); the orphan
  * check is a broadcast left_anti join.
  */
object QualityChecks {

  /** Basic email-format regex (reference: silver_layer_data_quality_
    * checks.py:104 — same pattern). */
  val EmailRegex = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}$"

  private def anyOf(conds: Seq[Column]): Column =
    conds.reduceOption(_ || _).getOrElse(lit(false))

  /** Rows whose primary-key columns contain nulls. */
  def nullPks(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.filter(anyOf(pkCols.map(c => col(c).isNull)))

  /** Rows with leading/trailing whitespace in any listed string col. */
  def unwantedSpaces(df: DataFrame, stringCols: Seq[String]): DataFrame =
    df.filter(anyOf(stringCols.map(c => length(col(c)) =!= length(trim(col(c))))))

  /** Rows with null / out-of-range timestamps (reference bounds
    * 1900-01-01 .. 2100-01-01). */
  def invalidDates(df: DataFrame, dateCols: Seq[String],
                   minDate: String = "1900-01-01",
                   maxDate: String = "2100-01-01"): DataFrame =
    df.filter(anyOf(dateCols.map { c =>
      val ts = to_timestamp(col(c))
      ts.isNull || ts < to_timestamp(lit(minDate)) || ts > to_timestamp(lit(maxDate))
    }))

  /** Rows with non-positive values in the listed numeric columns. */
  def nonPositive(df: DataFrame, numCols: Seq[String]): DataFrame =
    df.filter(anyOf(numCols.map(c => col(c) <= 0)))

  /** Rows whose column fails a regex format (e.g. email). */
  def invalidFormat(df: DataFrame, column: String,
                    pattern: String = EmailRegex): DataFrame =
    df.filter(!col(column).rlike(pattern))

  /** Rows whose numeric column is not integer-valued
    * (reference: quantity % 1 != 0). */
  def nonIntegerValued(df: DataFrame, column: String): DataFrame =
    df.filter(col(column) % 1 =!= 0)

  /** Fact rows with no matching dimension row (referential
    * integrity; reference: gold_layer_data_quality_checks.py:95-105).
    * Broadcast anti-join: shuffle-free on the fact side. */
  def orphans(fact: DataFrame, dim: DataFrame,
              factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_anti")

  /** One-row-per-check violation-count summary — the aggregate the
    * reference prints/persists per entity. Each count is an
    * independent aggregation over a narrow filter; Spark computes
    * them in one pass when unioned. */
  case class CheckSpec(name: String, violations: DataFrame)

  def summary(checks: Seq[CheckSpec]): DataFrame = {
    checks.map { c =>
      c.violations.agg(count(lit(1)).cast("long").as("violation_count"))
        .select(lit(c.name).as("check_name"), col("violation_count"))
    }.reduce(_.unionAll(_))
  }
}
