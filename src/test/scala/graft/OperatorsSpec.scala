package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Flatten}
import graft.medallion.{Bronze, Gold, Silver}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Flatten expands nested structs with parent_child naming") {
    val df = Seq((1, ("alice", 10.0), "x")).toDF("id", "profile", "tag")
    val flat = Flatten(df)
    assert(flat.columns.toSet === Set("id", "tag", "profile__1", "profile__2"))
  }

  test("Flatten explodes arrays of structs recursively") {
    val df = spark.sql(
      """SELECT 1 AS id, array(named_struct('k', 'a', 'v', 1),
        |                      named_struct('k', 'b', 'v', 2)) AS items""".stripMargin)
    val flat = Flatten(df)
    assert(flat.columns.toSet === Set("id", "items_k", "items_v"))
    assert(flat.count() === 2)
    assert(flat.orderBy("items_k").select("items_v").as[Int].collect().toSeq === Seq(1, 2))
  }

  test("Flatten handles deep nesting (struct in struct)") {
    val df = spark.sql(
      "SELECT 1 AS id, named_struct('inner', named_struct('x', 42)) AS outer")
    val flat = Flatten(df)
    assert(flat.columns.toSet === Set("id", "outer_inner_x"))
    assert(flat.select("outer_inner_x").as[Int].head() === 42)
  }

  test("Dedup.keepFirst is deterministic by order column") {
    val df = Seq((1, 10, "b"), (1, 5, "a"), (2, 7, "c")).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), "ord").orderBy("k")
      .select("v").as[String].collect().toSeq
    assert(out === Seq("a", "c"))
  }

  test("Dedup.keepLatest keeps max order row") {
    val df = Seq((1, 10, "b"), (1, 5, "a")).toDF("k", "ord", "v")
    assert(Dedup.keepLatest(df, Seq("k"), "ord").select("v").as[String].head() === "b")
  }

  test("Bronze.wrap produces payload struct + lineage columns") {
    val df = Seq((1, "x")).toDF("id", "name")
    val b = Bronze.wrap(df)
    assert(b.columns.toSet === Set("payload", "ingest_file", "bronze_ingest_ts"))
    assert(b.select("payload.id").as[Int].head() === 1)
  }

  test("Silver.transform flattens payload and dedups by pk") {
    val df = Seq((1, "a"), (1, "a2"), (2, "b")).toDF("customer_id", "name")
    val silver = Silver.transform(Bronze.wrap(df), Seq("customer_id"))
    assert(silver.count() === 2)
    assert(silver.columns.contains("silver_ingest_ts"))
  }

  test("Gold.dimension filters null pks and normalizes") {
    val df = Seq((Some(1), "NEW YORK"), (None, "X"), (Some(2), "chicago"))
      .toDF("customer_id", "city")
    val dim = Gold.dimension(df, "customer_id",
      Seq("customer_id" -> "customer_id", "city" -> "city"),
      Map("city" -> initcap(col("city"))))
    assert(dim.count() === 2)
    assert(dim.orderBy("customer_id").select("city").as[String].collect().toSeq
      === Seq("New York", "Chicago"))
  }

  test("Gold.fact joins dims broadcast and applies filters") {
    val fact = Seq((1, 1, 2.0, 3.0), (2, 9, 2.0, 3.0), (3, 1, 0.0, 3.0))
      .toDF("order_id", "cust_id", "qty", "price")
    val dim = Seq((1, "alice")).toDF("customer_id", "name")
    val out = Gold.fact(fact, Seq((dim, col("cust_id") === col("customer_id"))),
      Seq(col("order_id"), col("name"), (col("qty") * col("price")).as("total")),
      Seq(col("total") > 0))
    assert(out.select("order_id").as[Int].collect().toSeq === Seq(1))
  }

  test("RangeJoin.pointInInterval == naive non-equi join, no nested loop") {
    import graft.operators.RangeJoin
    import graft.sources.Tables
    // realistic shape: events vs ±2min windows around error events
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_id"),
      unix_millis(col("ts")).as("ts_ms"))
    val inc = Tables.events(spark, sf).filter(col("event_type") === "error")
      .select(col("user_id").as("iu"),
        (unix_millis(col("ts")) - 120000L).as("lo_ms"),
        (unix_millis(col("ts")) + 120000L).as("hi_ms"))
    val got = RangeJoin.pointInInterval(ev,
      inc.withColumnRenamed("iu", "user_id"), Seq("user_id"),
      "ts_ms", "lo_ms", "hi_ms", bucketMs = 60000L)
      .groupBy("event_id").count()
    val want = ev.join(inc, col("user_id") === col("iu") &&
        col("ts_ms") >= col("lo_ms") && col("ts_ms") <= col("hi_ms"))
      .groupBy("event_id").count()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and with a bucket much narrower/wider than the interval, still exact
    for (b <- Seq(7000L, 999999L)) {
      val alt = RangeJoin.pointInInterval(ev,
        inc.withColumnRenamed("iu", "user_id"), Seq("user_id"),
        "ts_ms", "lo_ms", "hi_ms", bucketMs = b)
        .groupBy("event_id").count()
      assert(alt.exceptAll(want).isEmpty && want.exceptAll(alt).isEmpty,
        s"bucketMs=$b mismatch")
    }
    // the bucketed plan is an EQUI join — never a nested loop/cartesian
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join planned a nested loop:\n$plan")
  }

  test("Hierarchy.closure keeps path multiplicity and honors maxDepth") {
    import spark.implicits._
    // diamond DAG (child -> parent): A->B, A->C, B->D, C->D, D->E.
    // A reaches D through TWO paths -> (A, D, 2) must appear twice
    // (recursive-CTE UNION ALL semantics), and (A, E, 3) twice more.
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"))
      .toDF("child", "parent")
    val full = graft.operators.Hierarchy.closure(edges, maxDepth = 3)
      .as[(String, String, Int)].collect().toSeq
    val want = Seq(
      ("A", "B", 1), ("A", "C", 1), ("B", "D", 1), ("C", "D", 1), ("D", "E", 1),
      ("A", "D", 2), ("A", "D", 2), ("B", "E", 2), ("C", "E", 2),
      ("A", "E", 3), ("A", "E", 3))
    assert(full.sorted == want.sorted)
    // depth bound truncates, never probes: depth-4 paths don't exist here,
    // but maxDepth=1 must return exactly the edge list
    val d1 = graft.operators.Hierarchy.closure(edges, maxDepth = 1)
      .as[(String, String, Int)].collect().toSeq
    assert(d1.sorted == want.filter(_._3 == 1).sorted)
  }
}
