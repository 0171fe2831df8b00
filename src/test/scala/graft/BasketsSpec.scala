package graft

import org.apache.spark.sql.functions._

import graft.operators.Baskets

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("u1", 1L), ("u1", 2L), ("u1", 3L), ("u1", 2L), // dup (u1,2)
    ("u2", 2L), ("u2", 3L),
    ("u3", 3L), ("u3", 1L), ("u3", 2L),
    ("u4", 9L) // singleton user: no pairs, but counts as a user
  ).toDF("user_id", "item")
    .unionByName(Seq(("u5", Option.empty[java.lang.Long])) // null item drops
      .toDF("user_id", "item"))

  test("pairCounts equals the distinct self-join formulation") {
    val sets = Baskets.userItemSets(events, "user_id", "item")
    val viaArrays = Baskets.pairCounts(sets)
      .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq

    val ui = events.where(col("item").isNotNull).distinct()
    val viaJoin = ui.as("a")
      .join(ui.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).as("n_both"))
      .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq

    assert(viaArrays == viaJoin)
    assert(viaArrays == Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 3L)))
  }

  test("itemUserCounts and userCount match distinct semantics") {
    val sets = Baskets.userItemSets(events, "user_id", "item")
    val iu = Baskets.itemUserCounts(sets)
      .orderBy("item").as[(Long, Long)].collect().toSeq
    assert(iu == Seq((1L, 2L), (2L, 3L), (3L, 3L), (9L, 1L)))
    assert(Baskets.userCount(sets).as[Long].head() == 4L)
  }

  test("maxItems drops power users before the quadratic step") {
    val sets = Baskets.userItemSets(events, "user_id", "item", maxItems = Some(2))
    // u1 (3 items) and u3 (3 items) dropped; only u2's pair remains
    val pairs = Baskets.pairCounts(sets)
      .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((2L, 3L, 1L)))
  }

  test("property: pairCounts equals the self-join on random event multisets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val events = Gen.listOfN(60, for {
      // ~1/9 of events carry a NULL user: unattributed rows must be
      // dropped, never pooled into one phantom basket
      u <- Gen.choose(0, 8).map(n => if (n == 8) null else s"u$n")
      i <- Gen.choose(0L, 11L)
    } yield (u, i))
    val prop = Prop.forAll(events) { evs =>
      val df = evs.toDF("user_id", "item")
      val viaArrays = Baskets.pairCounts(
        Baskets.userItemSets(df, "user_id", "item"))
        .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq
      val ui = df.where(col("item").isNotNull).distinct()
      val viaJoin = ui.as("a")
        .join(ui.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).as("n_both"))
        .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq
      viaArrays == viaJoin
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("itemRecs broadcast gate: both arms fire under forced bounds, same rows") {
    val sets = Baskets.userItemSets(events, "user_id", "item")
    // forced-broadcast arm: the counted edge bound always passes
    val hinted = Baskets.itemRecs(sets, "user_id",
      broadcastEdgeLimit = Long.MaxValue)
    // forced-shuffle arm: the bound never passes, hint omitted
    val unhinted = Baskets.itemRecs(sets, "user_id", broadcastEdgeLimit = 0L)
    // the gate decides at the LOGICAL level (the hint is present or
    // absent) — physical join choice on toy data would broadcast both
    // ways from size stats, so assert on the analyzed plan
    assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!unhinted.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val a = hinted.orderBy("user_id", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    val b = unhinted.orderBy("user_id", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // sanity: u4 has only item 9 (no co-occurrence) -> no recs for u4
    assert(!a.exists(_._1 == "u4"))
    // itemRecs persists query-owned intermediates; drop them so the
    // shared session's cache manager can't substitute InMemoryScans
    // into later tests' plan-shape assertions
    graft.Caches.unpersistAll()
  }

  test("pair generation is narrow: one shuffle to sets, one to pairs") {
    val sets = Baskets.userItemSets(events, "user_id", "item")
    val plan = Baskets.pairCounts(sets).queryExecution.executedPlan.toString
    // exactly two exchanges: groupBy user, groupBy (i, j)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan)
  }
}
