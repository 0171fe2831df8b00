package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All functions are compositions of built-in codegen'd Spark SQL
  * functions (no UDFs) — they stay inside whole-stage codegen and are
  * pure narrow transforms: zero shuffle, linear scan, embarrassingly
  * parallel at any scale.
  */
object TextFunctions {

  /** Whitespace tokenizer — `split(trim(s), "\\s+")`; empty string
    * yields zero tokens. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: words + punctuation runs counted
    * separately (a cheap, deterministic proxy for a BPE tokenizer's
    * piece count: every ~4 chars of a long word becomes a piece). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      transform(tokens(text), t => greatest(lit(1), ceil(length(t) / lit(4.0)).cast("long"))),
      lit(0L), (acc, x) => acc + x)

  /** Punctuation character count (fixed class, matches oracle). */
  val PunctClass = "[.,!?;:]"
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))

  /** Small fixed English stopword list (deterministic, oracle-matched). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords)))

  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text).cast("double") / n)
  }

  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      aggregate(transform(tokens(text), t => length(t).cast("long")), lit(0L), _ + _)
        .cast("double") / n)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with
    * low punctuation noise and a natural stopword rate. Deterministic
    * arithmetic only — reproducible in ANSI SQL. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val punctPen  = least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    graft.functions.Det.roundTo(
      lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctPen) * 0.2, 6)
  }

  /** Language-marker word lists for the n-gram/stopword-profile
    * language-ID heuristic. Deterministic priority on ties:
    * en > de > es > fr > unknown. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  def langMarkerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Heuristic language ID: argmax of marker counts, requiring at
    * least one hit; ties resolved by list order. */
  def langId(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, ms) => lang -> langMarkerCount(text, ms) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("unknown"): Column) { case ((lang, c), elseCol) =>
      when(best > 0 && c === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Weighted keyword lexicon for the lexicon-gate curation filter
    * (the shape of profanity / promotional / quality keyword lists).
    * Fixed deterministic weights, oracle-matched. */
  val Lexicon: Seq[(String, Int)] = Seq(
    "fast" -> 2, "small" -> 1, "slow" -> -2, "big" -> -1, "dup" -> -3)

  def lexiconHits(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Lexicon.map(_._1))))

  /** Σ weight(w)·count(w) over the lexicon, normalized by token
    * count — pure narrow array arithmetic, zero shuffle. */
  def lexiconScore(text: Column): Column = {
    val raw = Lexicon.map { case (w, wt) =>
      size(filter(tokens(text), t => t === w)) * lit(wt)
    }.reduce(_ + _)
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      graft.functions.Det.roundTo(raw.cast("double") / n, 6))
  }

  /** Content fingerprint: md5 of normalized text (lower, collapsed
    * whitespace). Stable across engines — the exact-dedup key. */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Full Unicode normalization (NFKC, accent fold, casefold,
    * whitespace collapse) — the dedup-key normalizer a multilingual
    * corpus needs; ASCII-only corpora can use the lighter
    * [[fingerprintMd5]] normalization. Custom codegen'd expression
    * ([[graft.functions.NormalizeTextExpr]]). */
  def normalizeText(text: Column): Column =
    graft.functions.NormalizeTextExpr.normalize(text)

  /** 60-bit numeric fingerprint derived from md5 — portable to any
    * engine with md5 + hex parsing; used as the hash base for MinHash
    * so oracle SQL can reproduce signatures bit-for-bit. */
  def fingerprint60(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles: array of space-joined n-grams (empty when
    * fewer than n tokens). Single-pass custom expression — the HOF
    * formulation (transform over sequence + slice + concat_ws) is
    * interpreted and re-evaluates the regex split per element, which
    * made shingling dominate the near-dup suite (~1.5 ms/doc vs ~µs). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShinglesExpr.shingles(text, n)

  /** Distinct shingles (first-occurrence order, matching
    * `array_distinct`), deduped inside the same single pass. */
  def shinglesDistinct(text: Column, n: Int): Column =
    graft.functions.ShinglesExpr.shingles(text, n, distinct = true)

  /** Character n-grams over the raw text (no trim, no separator) —
    * the char-level analog of [[shingles]]; same single-pass
    * expression. */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.ShinglesExpr.charNgrams(text, n)
}
