package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numeric helpers.
  *
  * Engine-native `round()` differs between engines on half-way cases:
  * Spark rounds the shortest decimal string representation (HALF_UP
  * via BigDecimal), DuckDB rounds the binary double value — so e.g. a
  * stored 37704.575 (binary ≈ …574999…) rounds to .58 in Spark but
  * .57 in DuckDB. `roundTo` instead uses floor(x*10^s + 0.5)/10^s —
  * pure IEEE double ops that every engine evaluates identically.
  */
object Det {

  def roundTo(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + lit(0.5)) / f
  }

  /** SQL text of the same formula (for oracle queries). */
  def sqlRound(e: String, scale: Int): String = {
    val f = "1" + ("0" * scale)
    s"floor(($e)*$f + 0.5)/$f"
  }
}
