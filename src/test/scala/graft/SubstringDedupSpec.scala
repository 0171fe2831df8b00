package graft

import org.apache.spark.sql.functions._
import graft.dedup.SubstringDedup

/** Exact-substring (k-token window) dedup — planted-overlap
  * verification of stats, filtering, and span removal. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // a: 10 tokens t1..t10; b repeats a's tokens 4..8 (a 5-token span)
  // inside otherwise-unique text; c is too short for k; d is an
  // exact clone of a.
  private val docs = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
    (2L, "u1 u2 t4 t5 t6 t7 t8 u3 u4 u5"),
    (3L, "v1 v2 v3"),
    (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
  ).toDF("doc_id", "text")

  test("windowFingerprints: one row per window, short docs drop, k=5") {
    val w = SubstringDedup.windowFingerprints(docs, "doc_id", "text", 5)
    val byDoc = w.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // 10 tokens, k=5 -> 6 windows; doc 3 (3 tokens) absent
    assert(byDoc === Map(1L -> 6L, 2L -> 6L, 4L -> 6L))
    // fingerprints are deterministic: clone docs share all six
    val shared = w.where($"doc_id".isin(1L, 4L))
      .groupBy("pos", "fp").count().where($"count" === 2).count()
    assert(shared === 6L)
  }

  test("windowDupStats counts corpus-duplicated windows per doc") {
    val st = SubstringDedup.windowDupStats(docs, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // docs 1 and 4 are clones: every window duplicated. Doc 2 shares
    // exactly ONE k=5 window with them ("t4 t5 t6 t7 t8", at pos 2).
    assert(st === Array((1L, 6L, 6L), (2L, 6L, 1L), (4L, 6L, 6L)))
  }

  test("same-doc internal repeats count as duplicated") {
    val rep = Seq((9L, "a b c d e x y a b c d e")).toDF("doc_id", "text")
    val st = SubstringDedup.windowDupStats(rep, "doc_id", "text", 5)
      .as[(Long, Long, Long)].head()
    // 12 tokens -> 8 windows; "a b c d e" occurs at pos 0 and 7
    assert(st === ((9L, 8L, 2L)))
  }

  test("filterByDupMass keeps docs at or under the dup share") {
    val kept = SubstringDedup.filterByDupMass(docs, "doc_id", "text", 5, 20)
      .select("doc_id").as[Long].collect().toSet
    // doc 2: 1/6 dup = 16.7% <= 20% survives; clones 1 and 4 (100%) drop
    assert(kept === Set(2L))
    val keepAll = SubstringDedup.filterByDupMass(docs, "doc_id", "text", 5, 100)
      .select("doc_id").as[Long].collect().toSet
    assert(keepAll === Set(1L, 2L, 4L))
  }

  test("removeDuplicatedSpans cuts covered tokens, keeps the rest in order") {
    val out = SubstringDedup.removeDuplicatedSpans(docs, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    // clones: every token covered -> empty
    assert(out(1L) === "")
    assert(out(4L) === "")
    // doc 2: covered tokens are positions 2..6 (t4..t8); unique rim kept
    assert(out(2L) === "u1 u2 u3 u4 u5")
    // short doc has no windows at all -> untouched full text
    assert(out(3L) === "v1 v2 v3")
  }
}
