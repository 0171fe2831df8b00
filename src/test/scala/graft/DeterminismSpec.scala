package graft

/** Two runs of the same query must produce IDENTICAL row order —
  * the driver hashes rendered rows, so an under-specified ORDER BY
  * (ties broken by partition timing) fails the gate
  * nondeterministically. This guard catches it locally. Covers a
  * representative sample across operator families (windows, LSH,
  * iterative CC, pivot, sampling). */
class DeterminismSpec extends SparkSpec {

  private val sample = Seq(
    "q1_pricing_summary", "q_sessionize", "q_top_orders_per_cust",
    "dedup_minhash", "dedup_simhash_pairs", "dedup_clusters",
    "ann_ivf", "q_split_assign", "q_pivot_revenue", "text_vocab",
    // round-3 families: two-pass rank selection (approxQuantile
    // boundary wobble must never reach the output), multi-probe LSH,
    // shard shuffle
    "q_acctbal_quartiles", "q_median_price", "dedup_embed_cosine_lsh",
    "q_shuffle_order",
    // round-6 families: in-array pair counting, plan-literal bloom
    // probe, two-leg rank fusion, centroid-literal argmax scoring
    "q_item_cooccurrence", "dedup_decontaminate_bloom",
    "text_hybrid_rrf", "q_classifier_eval",
    // round-7 families: level-synchronous BFS (frontier order must
    // not leak), block-ranked sorted-neighborhood pairs, truncated
    // item-kNN scoring, null-demoting field survivorship, closed-form
    // moment stats
    "q_reachability", "dedup_sorted_neighborhood", "q_item_recs",
    "dedup_golden_record", "q_value_spike_days",
    // round-8 families: rank-composed index eval (min-rank over a
    // left join), distinct-set semi-join coverage, sqrt-share mix,
    // fingerprint-window survivorship
    "ann_mrr_eval", "text_train_overlap", "corpus_mix_temperature",
    "corpus_dup_inflation",
    // PassJoin blocked lev-join; at-rank gap percentiles
    "dedup_fuzzy_names", "q_interevent_gaps")

  test("repeated runs return byte-identical ordered output") {
    sample.foreach { name =>
      def run(): Seq[String] = {
        val rows = SparkEntry.queries(name)(spark, sf).collect()
          .map(_.toString).toSeq
        spark.catalog.clearCache()
        rows
      }
      val (a, b) = (run(), run())
      assert(a == b, s"$name output differs across runs")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
