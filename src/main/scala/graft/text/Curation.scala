package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Det.roundTo
import graft.operators.Dedup

/** End-to-end corpus curation as a training-data user runs it:
  * language gate → quality & length gates → exact-dup keep-first →
  * benchmark decontamination → deterministic split assignment +
  * token counts — ONE declarative plan (the library form of the
  * graded `pipeline_curate` query).
  *
  * Scale shape: narrow per-row scoring, ONE shuffle for the
  * keep-first dedup (min_by aggregation, map-side combinable),
  * broadcast anti-join against the (small) holdout fingerprints —
  * the corpus never shuffles again.
  */
object Curation {

  /** Returns `(idCol, split, n_tokens)` for every surviving doc.
    * `holdout` rows are excluded by normalized-text fingerprint
    * (exact decontamination). Split hashing is md5-portable so any
    * engine reproduces the assignment bit-for-bit. */
  def curate(docs: DataFrame, holdout: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             lang: String = "en", minQuality: Double = 0.5,
             minLen: Int = 100, trainPct: Int = 80,
             valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    val gated = docs
      .withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .filter(TextFunctions.langId(col(textCol)) === lang &&
        roundTo(TextFunctions.qualityScore(col(textCol)), 6) >= minQuality &&
        length(col(textCol)) >= minLen)
    val kept = Dedup.keepFirst(gated, Seq("__fp"), idCol)
    val hold = holdout
      .select(TextFunctions.fingerprintMd5(col(textCol)).as("__fp")).distinct()
    val h = pmod(conv(substring(md5(concat(lit("split:"), col(idCol))), 1, 15),
      16, 10).cast("long"), lit(100L))
    kept.join(broadcast(hold), Seq("__fp"), "left_anti")
      .select(col(idCol),
        when(h < trainPct, "train")
          .when(h < trainPct + valPct, "val").otherwise("test").as("split"),
        TextFunctions.tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
  }
}
