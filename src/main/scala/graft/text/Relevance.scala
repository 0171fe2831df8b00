package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det.roundTo

/** Corpus-statistics relevance scoring: TF-IDF and BM25.
  *
  * Training-data curation pipelines use these to surface
  * characteristic terms per document (TF-IDF) and to retrieve
  * documents for a keyword probe (BM25) — e.g. targeted
  * decontamination sweeps or topical subcorpus extraction.
  *
  * Scale shape (both functions):
  *   - one map-side-combinable shuffle for per-doc term frequencies
  *     (`groupBy(doc, token)`),
  *   - one for document frequencies (`groupBy(token)`),
  *   - a shuffle join on `token` to attach df to tf (vocabulary can
  *     be arbitrarily large at corpus scale, so no broadcast hint —
  *     AQE will broadcast when the vocab side turns out small),
  *   - corpus scalars (N, avgdl) ride in via a 1-row broadcast cross
  *     join — never a driver collect.
  * No step is quadratic and nothing is partitioned by document count,
  * so the plan survives a 100x corpus.
  *
  * Determinism: scores are rounded (floor(x*1e6+0.5)/1e6) BEFORE
  * ranking and ties break on the token / doc id, so rank order is
  * reproducible bit-for-bit across engines; `ln` is IEEE-double libm
  * in both engines and the rounding absorbs any last-ulp skew.
  */
object Relevance {

  /** Per-(doc, token) term frequencies — distinct rows, so df is a
    * plain `count(*)` regroup, not a countDistinct. */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` TF-IDF terms per document.
    *
    * idf = ln((N+1)/(df+1)) + 1 (smoothed, always > 0); score =
    * tf * idf rounded to 6 decimals. Output: (id, rank, token,
    * tfidf), rank 1..k by (score desc, token asc).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        roundTo(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank").cast("bigint").as("rank"), col("token"), col("tfidf"))
  }

  /** BM25 retrieval for a fixed bag of query terms: top-`topK`
    * documents by summed per-term BM25 (k1, b are the classic Okapi
    * parameters).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term score =
    * idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). Only rows
    * whose token is in `queryTerms` survive the first filter, so the
    * join and window run on a tiny slice of the corpus.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double, b: Double, topK: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    // df over the FULL vocabulary slice for the query terms only
    val df = tf.where(col("token").isInCollection(queryTerms))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val lens = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val perTerm = tf.where(col("token").isInCollection(queryTerms))
      .join(broadcast(df), "token")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // sum per-term scores as a fixed-point decimal so the result is
    // independent of float addition order across partitions/engines
    val scored = perTerm.groupBy(col(idCol))
      .agg(roundTo(sum(roundTo(col("term_score"), 10).cast("decimal(28,10)"))
        .cast("double"), 6).as("bm25"))
    // global top-K via TakeOrderedAndProject — distributed partial
    // top-K per partition, NO single-partition window/exchange
    scored.orderBy(col("bm25").desc, col(idCol).asc).limit(topK)
      .select(col(idCol), col("bm25"))
  }

  /** Bigram collocations ranked by pointwise mutual information:
    * PMI(a,b) = ln( p(ab) / (p(a)p(b)) ) with corpus-level
    * probabilities, keeping pairs seen at least `minCount` times.
    *
    * Adjacent pairs come from zipping the token array with itself
    * shifted by one (`arrays_zip(slice(t,1,n-1), slice(t,2,n-1))`) —
    * slice/arrays_zip/explode are ordinary codegen'd expressions (NOT
    * interpreted lambda HOFs), and the pairing happens inside the
    * narrow scan, so no shuffle ever sees per-token rows in document
    * order. (A per-doc `lead` window computes the same pairs but
    * shuffles + sorts the entire exploded token table on
    * (doc, pos) first — measured 7.0 s vs 1.3 s at sf0.1.) Unigram
    * and bigram counts are map-side-combinable shuffles, and the
    * corpus totals are 1-row aggregates over the ALREADY-AGGREGATED
    * count frames (vocabulary-sized, with their shuffle exchanges
    * reused — the raw token explode is never rescanned for totals).
    * Top-K is TakeOrderedAndProject.
    */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long, topK: Int): DataFrame = {
    val t = TextFunctions.tokens(col(textCol))
    val tok = docs.select(explode(t).as("w"))
    // slice length must be >= 0: greatest(...) guards 0/1-token docs
    val len = greatest(size(t) - 1, lit(0))
    val pair = arrays_zip(slice(t, lit(1), len).as("w1"),
      slice(t, lit(2), len).as("w2"))
    val bg = docs.select(explode(pair).as("p")).select(col("p.w1"), col("p.w2"))
    val cab = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val cu = tok.groupBy("w").agg(count(lit(1)).as("n_w"))
    val totals = cu.agg(sum(col("n_w")).as("n_uni"))
      .crossJoin(cab.agg(sum(col("n_ab")).as("n_bg")))
    cab.where(col("n_ab") >= minCount)
      .join(cu.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(cu.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_ab"),
        roundTo(log(col("n_ab").cast("double") * col("n_uni") * col("n_uni") /
          (col("n_bg").cast("double") * col("n_a") * col("n_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }
}
