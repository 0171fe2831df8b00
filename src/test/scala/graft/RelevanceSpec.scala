package graft

import org.apache.spark.sql.functions._
import graft.text.Relevance
import graft.sources.Tables

/** Relevance scoring (TF-IDF / BM25) invariants — cross-engine value
  * equality is covered by the DuckDB oracle gate; these specs pin the
  * semantic contract and the scale-shape of the plans. */
class RelevanceSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("tfidf yields ranks 1..k per doc, descending scores, idf>0") {
    val out = Relevance.tfidfTopTerms(docs, "doc_id", "text", 3).cache()
    try {
      val perDoc = out.groupBy("doc_id")
        .agg(collect_list(struct(col("rank"), col("tfidf"))).as("rs"))
        .collect()
      assert(perDoc.nonEmpty)
      perDoc.foreach { r =>
        val rs = r.getSeq[org.apache.spark.sql.Row](1).sortBy(_.getLong(0))
        assert(rs.map(_.getLong(0)) == (1L to rs.length))
        val scores = rs.map(_.getDouble(1))
        assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
          s"scores not descending for doc ${r.get(0)}: $scores")
        assert(scores.forall(_ > 0.0), "smoothed idf must keep scores positive")
      }
    } finally out.unpersist()
  }

  test("tfidf ranks the doc's most frequent rare term first") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple apple apple banana"),
      (2L, "banana banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val top = Relevance.tfidfTopTerms(tiny, "doc_id", "text", 1)
      .where(col("doc_id") === 1L).select("token").as[String].head()
    assert(top == "apple") // tf=3 and df=1: dominates both axes
  }

  test("bm25 returns at most topK rows, descending, and hits planted docs") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "spark join fast vector spark join"), // all terms, tf-heavy
      (2L, "spark alone here with much longer text padding padding padding"),
      (3L, "nothing relevant at all"),
      (4L, "fast vector")).toDF("doc_id", "text")
    val out = Relevance.bm25(tiny, "doc_id", "text",
      Seq("spark", "join", "fast", "vector"), 1.2, 0.75, 10)
      .orderBy(col("bm25").desc).collect()
    assert(out.length == 3) // doc 3 matches no term
    assert(!out.map(_.getLong(0)).contains(3L))
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 1 matches every term with high tf in a short doc: must lead
    assert(out.head.getLong(0) == 1L)
  }

  test("bm25 plan: corpus stats broadcast, top-K is TakeOrdered (no global window)") {
    val plan = Relevance.bm25(docs, "doc_id", "text",
      Seq("spark", "join"), 1.2, 0.75, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected distributed top-K:\n$plan")
    assert(!plan.contains("Window"), s"global window would single-thread at scale:\n$plan")
  }
}
