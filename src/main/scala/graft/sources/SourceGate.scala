package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE action serving both merge/upsert source gates: emptiness and
  * the key-ambiguity check. Every merge paid two jobs here
  * (`src.isEmpty`, then a duplicate-key count) over the same cached
  * source; a single aggregate returns (total rows, max per-key
  * multiplicity) — and materializes the persist while at it. */
private[sources] object SourceGate {
  /** (total source rows, max rows per key) in one job. */
  def apply(src: DataFrame, keyCols: Seq[String]): (Long, Long) = {
    val r = src.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__gate_n"))
      .agg(coalesce(sum("__gate_n"), lit(0L)),
        coalesce(max("__gate_n"), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
