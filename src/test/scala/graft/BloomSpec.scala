package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe: no false negatives, fpp-bounded false positives") {
    val members = (1L to 1000L).map(i => s"member-$i").toDF("v")
    val bloom = BloomExpressions.buildBloom(members, col("v"), 1000L, 0.01)
    // every member must hit
    val hits = members.filter(BloomExpressions.mightContain(bloom, col("v"))).count()
    assert(hits == 1000L)
    // non-members: false-positive rate stays near the configured 1%
    val others = (1L to 10000L).map(i => s"other-$i").toDF("v")
    val fp = others.filter(BloomExpressions.mightContain(bloom, col("v"))).count()
    assert(fp <= 300L, s"false-positive count $fp way above 1% of 10000")
  }

  test("bloom build is deterministic (same items, same binary)") {
    val items = (1L to 500L).map(i => s"x$i").toDF("v")
    val b1 = BloomExpressions.buildBloom(items, col("v"), 500L, 0.03)
    val b2 = BloomExpressions.buildBloom(items, col("v"), 500L, 0.03)
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("dedup_decontaminate_bloom equals the exact formulation") {
    val exact = SparkEntry.queries("dedup_decontaminate")(spark, sf)
      .as[Long].collect().toSeq
    val bloom = SparkEntry.queries("dedup_decontaminate_bloom")(spark, sf)
      .as[Long].collect().toSeq
    assert(bloom == exact)
  }

  test("the prefilter is a scan-stage literal probe, not a join") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val bloom = BloomExpressions.buildBloom(
      docs.limit(10), col("text"), 100L, 0.01)
    val plan = docs.filter(BloomExpressions.mightContain(bloom, col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
    assert(plan.contains("might_contain"), plan)
  }
}
