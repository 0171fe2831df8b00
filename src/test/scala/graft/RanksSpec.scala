package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks
import graft.sources.Tables

/** Ranks.withExactRank must reproduce the single-reducer window
  * formulations bit-for-bit while keeping every window in the plan
  * partitioned (no "move all data to one partition" plans). */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("exact global rank == row_number over global window") {
    val c = Tables.customer(spark, sf)
    val got = Ranks.withExactRank(c, Seq.empty,
      Seq(col("c_acctbal").asc, col("c_custkey").asc), "c_acctbal",
      "rank", "n", shift = 52)
      .select(col("c_custkey"), col("rank"), col("n"))
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val want = c.select(col("c_custkey"),
      row_number().over(w).cast("long").as("rank"),
      count(lit(1)).over(Window.partitionBy(lit(0))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("exact per-group rank == row_number over per-group window") {
    val l = Tables.lineitem(spark, sf)
    val order = Seq(col("l_extendedprice").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = Ranks.withExactRank(l, Seq("l_returnflag"), order,
      "l_extendedprice", "rank", "n", shift = 52)
      .select(col("l_orderkey"), col("l_linenumber"), col("rank"), col("n"))
    val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
    val want = l.select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(w).cast("long").as("rank"),
      count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("withExactRank keeps null-group rows (null-safe offsets join)") {
    val df = Seq((Option("a"), 1.0, 1L), (Option.empty[String], 2.0, 2L),
      (Option.empty[String], 1.0, 3L)).toDF("g", "v", "id")
    val got = Ranks.withExactRank(df, Seq("g"),
      Seq(col("v").asc, col("id").asc), "v", "rank", "n", shift = 56)
    assert(got.count() === 3)
    val nulls = got.filter(col("g").isNull)
      .select("id", "rank", "n").as[(Long, Long, Long)].collect().toSet
    assert(nulls === Set((3L, 1L, 2L), (2L, 2L, 2L)))
  }

  test("ntileFromRank == ntile over the same total order") {
    for (k <- Seq(3, 4, 7)) {
      val c = Tables.customer(spark, sf)
      val got = Ranks.withExactRank(c, Seq.empty,
        Seq(col("c_acctbal").asc, col("c_custkey").asc), "c_acctbal",
        "rank", "n", shift = 52)
        .select(col("c_custkey"),
          Ranks.ntileFromRank(col("rank"), col("n"), k).as("b"))
      val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val want = c.select(col("c_custkey"),
        ntile(k).over(w).cast("long").as("b"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile($k) mismatch")
    }
  }

  test("valuesAtRanks selects exact order statistics per group") {
    val l = Tables.lineitem(spark, sf)
    val order = Seq("l_extendedprice", "l_orderkey", "l_linenumber")
    val got = Ranks.valuesAtRanks(l, Seq("l_returnflag"), order,
      "l_extendedprice", n => Seq(1L, (n + 1) / 2, n), shift = 52)
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("l_returnflag")
      .orderBy(order.map(col(_).asc): _*)
    val want = l
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      .filter(col("rn") === 1 || col("rn") === expr("(n + 1) div 2") ||
        col("rn") === col("n"))
      .select(col("l_returnflag"), col("rn"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("ntileFromRank obeys NTILE size laws for many (n, k)") {
    // property sweep: for each k, evaluate the formula for every rank
    // of several population sizes in ONE job, then check the SQL
    // NTILE laws: first (n mod k) buckets hold ceil(n/k) rows, the
    // rest floor(n/k); bucket ids are non-decreasing in rank
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 97L, 100L, 101L)
    for (k <- Seq(1, 2, 3, 4, 7, 10)) {
      val rows = ns.flatMap(n => (1L to n).map(r => (n, r)))
      val got = rows.toDF("n", "rank")
        .select(col("n"), col("rank"),
          Ranks.ntileFromRank(col("rank"), col("n"), k).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      for (n <- ns) {
        val buckets = got.filter(_._1 == n).sortBy(_._2).map(_._3)
        assert(buckets.head === 1L)
        assert(buckets.zip(buckets.tail).forall { case (a, b) => a <= b },
          s"n=$n k=$k not monotone")
        val sizes = buckets.groupBy(identity).view.mapValues(_.length).toMap
        val (base, rem) = ((n / k), (n % k).toInt)
        sizes.foreach { case (b, sz) =>
          val want = if (b <= rem) base + 1 else base
          assert(sz === want, s"n=$n k=$k bucket $b size $sz != $want")
        }
      }
    }
  }

  test("sortable-bucket grid is order-preserving over the full double line") {
    import graft.functions.SortableBucketExpr.bucket
    val probes = Seq(Double.NegativeInfinity, -1.7e308, -105000.0, -999.99,
      -2.0, -1.0, -Double.MinPositiveValue, -0.0, 0.0,
      Double.MinPositiveValue, 0.015625, 0.5, 1.0, 1.5, 2.0, 900.0,
      904.25, 105000.0, 1.7e308, Double.PositiveInfinity)
    for (shift <- Seq(44, 48, 52)) {
      val ids = probes.map(bucket(_, shift))
      assert(ids.zip(ids.tail).forall { case (a, b) => a <= b },
        s"bucket ids not monotone at shift=$shift: $ids")
      // -0.0 and 0.0 are equal values — same bucket
      assert(bucket(-0.0, shift) === bucket(0.0, shift))
      // NaN sorts after +Infinity (Spark's NaN ordering)
      assert(bucket(Double.NaN, shift) >= bucket(Double.PositiveInfinity, shift))
    }
  }

  test("sortable-bucket monotonicity holds for random doubles (property sweep)") {
    import graft.functions.SortableBucketExpr.bucket
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // full-range doubles incl. subnormals, negatives, zeros and the
    // occasional special value
    val anyDouble = Gen.frequency(
      7 -> Gen.chooseNum(Double.MinValue, Double.MaxValue),
      2 -> Gen.chooseNum(-1e-300, 1e-300),
      1 -> Gen.oneOf(0.0, -0.0, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue))
    val prop = Prop.forAll(anyDouble, anyDouble, Gen.oneOf(40, 44, 48, 52)) {
      (a: Double, b: Double, shift: Int) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        bucket(lo, shift) <= bucket(hi, shift)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5000), prop)
    assert(res.passed, res.status.toString)
  }

  test("rewritten quartile/median plans never gather to one partition") {
    // a partition-less window (or any other all-to-one-task shape)
    // plans an `Exchange SinglePartition` — the exact thing the
    // rewrite removes. The final presentation orderBy is a RANGE
    // repartition, so a clean plan has no SinglePartition exchange.
    for (q <- Seq("q_acctbal_quartiles", "q_median_price")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$q plan gathers to a single partition:\n$plan")
    }
  }

  test("withRunningSum == driver-side decimal prefix sums, asc and desc, with ties") {
    // values engineered so several rows share a value (tie-break on id)
    // and several distinct values share a grid bucket at shift=60
    val rows = Seq.tabulate(97)(i =>
      (i.toLong, new java.math.BigDecimal(s"${(i * 37) % 11}.${(i * 7) % 100}")))
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(18,2)").as("v"))
    for (asc <- Seq(true, false)) {
      val ord = if (asc) Seq(col("v").asc, col("id").asc)
                else Seq(col("v").desc, col("id").asc)
      val got = Ranks.withRunningSum(df, "v", ord, "v", asc, "cum", "tot", shift = 60)
        .select(col("id"), col("cum").cast("string"), col("tot").cast("string"))
        .as[(Long, String, String)].collect()
        .map { case (id, c, t) => id -> ((BigDecimal(c), BigDecimal(t))) }.toMap
      val sorted = if (asc) rows.sortBy(r => (BigDecimal(r._2), r._1))
                   else rows.sortBy(r => (-BigDecimal(r._2), r._1))
      val tot = rows.map(r => BigDecimal(r._2)).sum
      var cum = BigDecimal(0)
      sorted.foreach { case (id, v) =>
        cum += BigDecimal(v)
        assert(got(id) == ((cum, tot)), s"asc=$asc id=$id: got ${got(id)} want ($cum, $tot)")
      }
    }
  }

  test("withRunningSum: null bucketOn sorts last under desc, first under asc; scale-4 stays exact") {
    // bucketOn (b) differs from valueCol (v): null-b rows land in the
    // Long.MinValue bucket but still carry non-null decimal values, so
    // a mis-sorted null bucket silently corrupts every offset. Also a
    // scale-4 valueCol — a hardcoded (38,2) offset cast would round it.
    val rows = Seq.tabulate(40) { i =>
      val b = if (i % 7 == 0) None else Some(((i * 13) % 9).toDouble)
      (i.toLong, b, s"${(i * 31) % 5}.${1000 + (i * 97) % 9000}")
    }
    val df = rows.toDF("id", "b", "v")
      .select(col("id"), col("b"), col("v").cast("decimal(18,4)").as("v"))
    for (asc <- Seq(true, false)) {
      val ord = if (asc) Seq(col("b").asc, col("id").asc)
                else Seq(col("b").desc, col("id").asc)
      val got = Ranks.withRunningSum(df, "v", ord, "b", asc, "cum", "tot")
        .select(col("id"), col("cum").cast("string"), col("tot").cast("string"))
        .as[(Long, String, String)].collect()
        .map { case (id, c, t) => id -> ((BigDecimal(c), BigDecimal(t))) }.toMap
      // Spark null ordering: asc = NULLS FIRST, desc = NULLS LAST
      val sorted =
        if (asc) rows.sortBy(r => (r._2.isDefined, r._2.getOrElse(0.0), r._1))
        else rows.sortBy(r => (r._2.isEmpty, -r._2.getOrElse(0.0), r._1))
      val tot = rows.map(r => BigDecimal(r._3)).sum
      var cum = BigDecimal(0)
      sorted.foreach { case (id, _, v) =>
        cum += BigDecimal(v)
        assert(got(id) == ((cum, tot)),
          s"asc=$asc id=$id: got ${got(id)} want ($cum, $tot)")
      }
    }
  }

  test("withRunningSum rejects non-decimal valueCol") {
    val df = Seq((1L, 1.5)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Ranks.withRunningSum(df, "v", Seq(col("v").asc), "v", ascending = true,
        "cum", "tot")
    }
  }

  test("weightedMedians == driver-side running-weight fold; zero weights never selected") {
    // synthetic: zero-weight rows may sit exactly at the crossing
    val tiny = Seq((1.0, 0L, 1L), (2.0, 3L, 2L), (3.0, 0L, 3L), (4.0, 3L, 4L))
      .toDF("v", "w", "id")
    val m = Ranks.weightedMedians(tiny, Seq.empty, Seq("v", "id"), "v", "w")
    assert(m.length == 1 && m(0).getDouble(0) == 2.0, m.mkString(","))
    // real data: quantity-cent-weighted price median per returnflag
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"),
      graft.functions.Det.roundTo(col("l_extendedprice"), 2).as("price"),
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity") * 100).cast("long").as("wc"))
    val got = Ranks.weightedMedians(li, Seq("l_returnflag"),
      Seq("price", "l_orderkey", "l_linenumber"), "price", "wc")
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = li.as[(String, Double, Long, Long, Long)].collect()
    val want = rows.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3, r._4))
      val total = sorted.map(_._5).sum
      var cum = 0L
      f -> sorted.find { r => cum += r._5; 2 * cum >= total }.get._2
    }
    assert(got == want, s"got $got want $want")
  }

  test("weightedQuantiles emits one row per (group, pct) even when one row covers all pcts") {
    // single-row group: the same row is the p25/p50/p75 crossing
    val tiny = Seq(("g1", 5.0, 2L, 1L), ("g2", 1.0, 1L, 2L), ("g2", 2.0, 1L, 3L),
      ("g2", 3.0, 1L, 4L), ("g2", 4.0, 1L, 5L))
      .toDF("g", "v", "w", "id")
    val qs = Ranks.weightedQuantiles(tiny, Seq("g"), Seq("v", "id"), "v", "w",
      Seq(25, 50, 75))
    val byKey = qs.map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(qs.length == 6, qs.mkString(","))
    assert(byKey(("g1", 25)) == 5.0 && byKey(("g1", 50)) == 5.0 &&
      byKey(("g1", 75)) == 5.0)
    // g2 weights are uniform: lower quartiles land on values 1, 2, 3
    assert(byKey(("g2", 25)) == 1.0 && byKey(("g2", 50)) == 2.0 &&
      byKey(("g2", 75)) == 3.0)
  }

  test("q_abc_parts plan has no single-reducer stage and classes are monotone") {
    val q = SparkEntry.queries("q_abc_parts")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"q_abc_parts plan gathers to a single partition:\n$plan")
    val rows = q.select("cum_share", "abc_class")
      .as[(Double, String)].collect()
    assert(rows.nonEmpty)
    // in output order (revenue desc) shares are non-decreasing and
    // classes only ever step A -> B -> C
    rows.sliding(2).foreach {
      case Array((s1, c1), (s2, c2)) =>
        assert(s1 <= s2 + 1e-9); assert(c1 <= c2)
      case _ =>
    }
    assert(math.abs(rows.last._1 - 1.0) < 1e-6, "last share must be 1.0")
  }
}
