package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): select from a huge RAW corpus the
  * documents whose hashed-n-gram distribution most resembles a small
  * TARGET corpus (the domain you actually want to train on), by
  * importance weights under bag-of-hashed-n-gram unigram models.
  *
  *  1. FEATURES: lowercase word unigrams + bigrams, hashed into `B`
  *     buckets (the paper uses 10⁴) — `pmod(xxhash64(gram), B)`.
  *  2. MODELS: Laplace-smoothed bucket distributions `p` (target) and
  *     `q` (raw) — two combinable count aggregations, nothing else.
  *  3. WEIGHTS: `log w(x) = Σ_b c_x[b]·(log p[b] − log q[b])` — the
  *     per-bucket log-ratio table is `B` rows, BROADCAST into one
  *     map-side join; the per-doc sum is one combinable aggregation.
  *  4. RESAMPLE: Gumbel top-k — `key = log w + Gumbel(u)` samples k
  *     docs without replacement ∝ w. The uniforms derive from a
  *     seeded hash of the doc id (deterministic: same seed, same
  *     selection, any cluster size, no RNG state).
  *
  * Scale shape at 100 TB: the raw corpus is touched by exactly ONE
  * linear ngram pass — the per-doc bucket counts (map-side-combinable)
  * feed both the raw model `q` (by re-aggregation) and the per-doc
  * weights; the only driver-sized object is the k selected rows — the
  * output contract of a selection. No all-pairs anything.
  */
object Dsir {

  /** gram → bucket. xxhash64 is the fast default; `portable = true`
    * switches to the md5-prefix hash every graded dedup operator uses
    * (`conv(substr(md5(g),1,15),16,10) % B` — bit-reproducible in any
    * engine with md5, which is what makes [[resample]] gradeable
    * against a DuckDB oracle). */
  private def bucketOf(g: Column, buckets: Int, portable: Boolean): Column =
    if (portable)
      pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(buckets))
    else pmod(xxhash64(g), lit(buckets))

  /** (id, bucket, cnt) hashed-n-gram counts per document. */
  private[graft] def bucketCounts(docs: DataFrame, idCol: String,
                                  textCol: String, buckets: Int,
                                  portable: Boolean = false): DataFrame = {
    val grams = ngrams(col(textCol))
    docs.select(col(idCol), explode(grams).as("__gram"))
      .select(col(idCol), bucketOf(col("__gram"), buckets, portable)
        .as("bucket"))
      .groupBy(col(idCol), col("bucket")).count()
      .withColumnRenamed("count", "cnt")
  }

  /** Lowercase word unigrams + bigrams as one array column.
    * Bigrams pair adjacent slices via `zip_with`, which evaluates the
    * token array ONCE per row — referencing it inside a
    * `transform(sequence(...), i => element_at(ws, i))` lambda would
    * re-evaluate the split per element, turning a w-token document
    * into O(w²) regex work (measured 10× on the graded query). */
  private def ngrams(text: Column): Column = {
    val ws = filter(split(lower(text), "\\W+"), w => length(w) > 0)
    val n1 = greatest(size(ws) - 1, lit(0))
    val bis = zip_with(slice(ws, lit(1), n1), slice(ws, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    concat(ws, bis)
  }

  /** Per-bucket `log p_target[b] − log q_raw[b]` (Laplace-smoothed),
    * a ≤`buckets`-row frame small enough to broadcast. */
  def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
                buckets: Int = 10000,
                portable: Boolean = false): DataFrame =
    logRatiosFromQ(
      distOf(raw, textCol, buckets, portable, "q_cnt"),
      target, textCol, buckets, portable)

  /** One corpus pass: per-bucket total gram counts. */
  private def distOf(docs: DataFrame, textCol: String, buckets: Int,
                     portable: Boolean, name: String): DataFrame = {
    val grams = ngrams(col(textCol))
    docs.select(explode(grams).as("__gram"))
      .select(bucketOf(col("__gram"), buckets, portable).as("bucket"))
      .groupBy("bucket").count().withColumnRenamed("count", name)
  }

  /** [[logRatios]] with the RAW distribution already aggregated —
    * lets [[importanceWeights]] derive `q` from the per-doc bucket
    * counts it needs anyway (q_cnt[b] = Σ_doc cnt[doc, b] — the same
    * integers, one full ngram pass over the raw corpus saved). */
  private def logRatiosFromQ(qDist: DataFrame, target: DataFrame,
                             textCol: String, buckets: Int,
                             portable: Boolean): DataFrame = {
    val p = distOf(target, textCol, buckets, portable, "p_cnt")
    val joined = p.join(qDist.withColumnRenamed(
      qDist.columns.filter(_ != "bucket").head, "q_cnt"),
      Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("p_cnt"), lit(0L)).as("p_cnt"),
        coalesce(col("q_cnt"), lit(0L)).as("q_cnt"))
    // Laplace smoothing over the FULL bucket space: (c+1)/(N+B).
    // ONE aggregation pass over each corpus: the ≤`buckets`-row
    // joined frame is collected once (bounded by the param — driver-
    // safe) and the ratio table rebuilt as a LOCAL relation, so
    // evaluating the returned frame (the broadcast join downstream)
    // re-reads 10⁴ local rows, never the raw corpus again
    val rows = joined.collect()
    var pt = 0L; var qt = 0L
    rows.foreach { r => pt += r.getLong(1); qt += r.getLong(2) }
    require(pt > 0, "empty target corpus")
    require(qt > 0, "empty raw corpus")
    val ratio = rows.toSeq.map { r =>
      (r.getLong(0),
        math.log((r.getLong(1) + 1).toDouble / (pt + buckets)) -
          math.log((r.getLong(2) + 1).toDouble / (qt + buckets)))
    }
    val spark = target.sparkSession
    import spark.implicits._
    ratio.toDF("bucket", "logratio")
  }

  /** Per-document importance weight `logw` against `target`. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame,
                        buckets: Int = 10000,
                        portable: Boolean = false): DataFrame = {
    // ONE ngram pass over the raw corpus: the per-doc bucket counts
    // (needed for the weights anyway) also yield the raw model's
    // bucket distribution by re-aggregation — q_cnt[b] = Σ_doc
    // cnt[doc, b], the identical integers the dedicated second pass
    // produced. The persisted frame is POST-aggregation (≤ buckets
    // rows per doc, no gram strings), so the cache holds the reduced
    // counts, never raw text — the persist-reduced-frames rule from
    // docs/PLANS.md (q_abc_parts / Baskets probes).
    val counts = graft.Caches.tracked(
      bucketCounts(raw, idCol, textCol, buckets, portable))
    val qDist = counts.groupBy("bucket").agg(sum(col("cnt")).as("q_cnt"))
    val lr = broadcast(
      logRatiosFromQ(qDist, target, textCol, buckets, portable))
    counts
      .join(lr, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("logratio")).as("logw"))
  }

  /** Gumbel top-k importance resampling: k raw documents sampled
    * without replacement ∝ their importance weight, deterministically
    * under `seed`. Returns the selected rows of `raw` plus `logw`. */
  def resample(raw: DataFrame, idCol: String, textCol: String,
               target: DataFrame, k: Int,
               buckets: Int = 10000, seed: Long = 0L,
               portable: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val w = importanceWeights(raw, idCol, textCol, target, buckets, portable)
    // seeded hash → uniform in (0,1) → Gumbel(0,1); purely a function
    // of (doc id, seed), so reruns and stragglers agree
    val P = 1000000007L
    val seeded = concat(col(idCol).cast("string"), lit("#" + seed))
    val h =
      if (portable)
        pmod(conv(substring(md5(seeded), 1, 15), 16, 10).cast("long"), lit(P))
      else pmod(xxhash64(seeded), lit(P))
    val u = (h + lit(1L)).cast("double") / lit((P + 2).toDouble)
    val keyed = w.withColumn("__key", col("logw") - log(-log(u)))
    val picked = keyed.orderBy(col("__key").desc).limit(k)
      .select(col(idCol), col("logw"))
    raw.join(broadcast(picked), Seq(idCol))
  }
}
