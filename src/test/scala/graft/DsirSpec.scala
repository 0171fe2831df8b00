package graft

import graft.text.Dsir

/** DSIR importance resampling (Xie et al. 2023): documents that look
  * like the target domain must out-weigh and out-select documents
  * that don't, deterministically. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val cooking = Seq(
    "simmer the onion garlic butter broth then season the stew",
    "whisk the eggs with garlic butter then bake in the oven",
    "roast the chicken with garlic butter onion in the oven",
    "bake the bread with butter then season with garlic onion")
  private val code = Seq(
    "def compile module import package return class void static final",
    "while loop index array pointer malloc free segfault stack heap",
    "commit branch merge rebase diff patch repository remote push pull",
    "select join where group order limit index table schema query")

  private def corpus(texts: Seq[String], from: Long) =
    texts.zipWithIndex.map { case (t, i) => (from + i, t) }
      .toDF("doc_id", "text")

  test("cooking docs out-weigh code docs against a cooking target; selection is deterministic") {
    val target = corpus(cooking.take(2), 1000L)
    // raw = the OTHER cooking docs + all code docs (no overlap with
    // target, so shared vocabulary — not identity — drives weights)
    val raw = corpus(cooking.drop(2) ++ code, 0L)

    val w = Dsir.importanceWeights(raw, "doc_id", "text", target,
      buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cookingIds = Seq(0L, 1L) // cooking.drop(2)
    val codeIds = (2L until 6L)
    val minCooking = cookingIds.map(w).min
    val maxCode = codeIds.map(w).max
    assert(minCooking > maxCode,
      s"cooking docs must out-weigh code docs: $w")

    val sel1 = Dsir.resample(raw, "doc_id", "text", target, k = 2,
      buckets = 4096, seed = 7L).select("doc_id").as[Long].collect().sorted
    val sel2 = Dsir.resample(raw, "doc_id", "text", target, k = 2,
      buckets = 4096, seed = 7L).select("doc_id").as[Long].collect().sorted
    assert(sel1.toSeq === sel2.toSeq, "same seed must select the same docs")
    assert(sel1.toSet.subsetOf(Set(0L, 1L)),
      s"top-2 against a cooking target must be the cooking docs: ${sel1.toSeq}")
  }

  test("resample returns k full rows and runs on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(200)
    val target = docs.limit(20)
    val out = Dsir.resample(docs, "doc_id", "text", target, k = 10,
      buckets = 2048, seed = 1L)
    assert(out.count() === 10L)
    assert(out.columns.toSet === Set("doc_id", "text", "logw"))
  }
}
