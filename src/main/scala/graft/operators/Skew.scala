package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the "hot shingle" / "hot customer" problem at 100 TB).
  *
  * AQE's skewedJoin handles sort-merge skew at runtime; salting is
  * the plan-level tool when one side is small enough to replicate:
  * every big-side row gets a deterministic salt in [0, n), the small
  * side is exploded n×, and the join key becomes (key, salt) — a hot
  * key's rows now spread over n reducers instead of one.
  *
  * Semantics are EXACTLY those of the unsalted inner/left join: each
  * big-side row still matches the same small-side rows (each small
  * row exists once per salt value, and a big row carries exactly one
  * salt).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Deterministic salt from the whole row of `uniqueCols` (use the
    * row's primary key): stable across retries — no rand(), which
    * breaks on task re-execution. */
  private def salt(n: Int, uniqueCols: Seq[String]): Column =
    pmod(xxhash64(uniqueCols.map(col): _*), lit(n)).cast("int")

  /** Inner/left join `big ⋈ small` on `keys`, salted `nSalts` ways.
    * `bigUniqueCols` seed the deterministic salt (the big side's PK).
    * `small` is replicated nSalts× (keep it broadcast-small or accept
    * the nSalts× shuffle volume on the small side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int, bigUniqueCols: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val b = big.withColumn(SaltCol, salt(nSalts, bigUniqueCols))
    val s = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    b.join(s, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
