package graft.sources

import org.apache.spark.sql.Column

/** The generalized SQL MERGE clause shapes shared by the three
  * flavors' `mergeFlexible` implementations:
  *
  *  - `WHEN MATCHED [AND condition] THEN UPDATE SET a = expr, …` —
  *    partial-column assignments; unassigned columns keep the target
  *    value. `WHEN MATCHED [AND condition] THEN DELETE` sets `delete`.
  *  - `WHEN NOT MATCHED [AND condition] THEN INSERT *` — full-row
  *    insert from the source.
  *
  * Resolution contract: matched-clause expressions (condition and
  * assignment values) evaluate over the JOINED match frame, where
  * TARGET columns keep their plain names and SOURCE columns are
  * prefixed `__src_` ([[MergeSpec.SrcPrefix]]); the not-matched
  * insert condition evaluates over the SOURCE frame by plain names.
  * The SQL analyzer rule rewrites attribute references accordingly.
  *
  * Semantics (one committed version, standard SQL MERGE): matched
  * target rows whose condition holds update/delete; matched rows
  * whose condition does not hold SURVIVE UNCHANGED; source rows with
  * no target match insert when their condition holds. */
object MergeSpec {

  /** Prefix source columns carry inside the joined match frame. */
  val SrcPrefix = "__src_"

  final case class Matched(condition: Option[Column], delete: Boolean,
                           assignments: Seq[(String, Column)] = Seq.empty)

  final case class NotMatched(condition: Option[Column])

  /** `WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE / DELETE`
    * — applies to TARGET rows with no source match; expressions
    * reference target columns only (there is no source row), plain
    * names over the target frame. */
  final case class NotMatchedBySource(condition: Option[Column],
                                      delete: Boolean,
                                      assignments: Seq[(String, Column)] = Seq.empty)
}
