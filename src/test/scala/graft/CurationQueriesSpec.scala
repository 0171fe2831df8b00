package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det.roundTo
import graft.sources.Tables

/** Invariants for the packing / mixing / sampling / co-occurrence
  * graded queries (value equality vs the oracle is the driver gate;
  * these assert the properties the SQL can't see). */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q_pack_sequences packs whole docs and only straddling docs overflow") {
    val rows = SparkEntry.queries("q_pack_sequences")(spark, sf)
      .select("shard", "pack_id", "n_tokens")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every (shard, pack) except possibly the straddler holds <= capacity:
    // a pack's token sum minus its LAST (straddling) doc must fit
    val capacity = 512L
    rows.groupBy(r => (r._1, r._2)).foreach { case ((shard, pack), docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      assert(total - maxDoc < capacity,
        s"pack ($shard,$pack) holds $total tokens beyond its straddler")
    }
    // pack ids are dense from 0 within each shard
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val ids = docs.map(_._2).distinct.sorted
      assert(ids.sameElements(0L until ids.length),
        s"shard $shard pack ids not dense: ${ids.take(5).mkString(",")}")
    }
  }

  test("q_domain_mix keeps every doc of an under-represented lang and downsamples the rest") {
    val before = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val after = SparkEntry.queries("q_domain_mix")(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = before.values.sum
    val share = Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
      "fr" -> 0.125, "zh" -> 0.125)
    before.foreach { case (lang, n) =>
      val target = share(lang) * total
      if (n <= target) // fraction capped at 1 — nothing dropped
        assert(after(lang) == n, s"$lang lost rows despite f=1")
      else // downsampled to ~target (hash sampling is binomial-tight)
        assert(after(lang) <= n && after(lang) > 0, s"$lang not downsampled")
    }
  }

  test("q_corr_price_qty matches a driver-side exact computation") {
    val got = SparkEntry.queries("q_corr_price_qty")(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        $"l_quantity".cast("double"), $"l_extendedprice".cast("double"))
      .as[(String, Double, Double)].collect()
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val n = rs.length.toDouble
      val xs = rs.map(r => BigDecimal(r2(r._2))); val ys = rs.map(r => BigDecimal(r2(r._3)))
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
      val sxx = xs.map(a => a * a).sum.toDouble; val syy = ys.map(a => a * a).sum.toDouble
      val cov = (n * sxy - sx * sy) / (n * n)
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gn, gcov, gcorr) = got(flag)
      assert(gn == rs.length)
      assert(math.abs(gcov - cov) < 1e-4, s"$flag covar: $gcov vs $cov")
      assert(math.abs(gcorr - corr) < 1e-6, s"$flag corr: $gcorr vs $corr")
    }
  }

  test("q_group_sample prefilter is exact: equals the full-window top-k per group") {
    val k = 25
    val got = SparkEntry.queries("q_group_sample")(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    // reference: rank the FULL group (no prefilter) — the graded
    // plan's 8x hash-threshold margin must never cut a winner
    val m = 1000000L
    val u = pmod(conv(substring(md5(concat(lit("gsample:"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long"), lit(m))
    val w = Window.partitionBy("lang").orderBy(u.asc, col("doc_id").asc)
    val full = Tables.documents(spark, sf)
      .withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= k)
      .select("doc_id", "lang", "sample_rank")
      .as[(Long, String, Long)].collect().toSet
    assert(got == full)
    // and every group yields exactly min(k, group size) rows
    val sizes = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.size == math.min(k.toLong, sizes(lang)), s"$lang sample size")
    }
  }

  test("q_scd2_pointintime resolves each probe to exactly one validity window") {
    val rows = SparkEntry.queries("q_scd2_pointintime")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val nOrders = Tables.orders(spark, sf).count()
    // exactly one dim version per probe — the range predicate must
    // never fan out (two windows) or drop (gap)
    assert(rows.length == nOrders)
    assert(rows.map(_._1).distinct.length == rows.length)
    // asof semantics: an updated key (orderkey%10==0) probed at v2
    // must read version 2; any key probed at v1 must read version 1
    rows.foreach { case (k, asof, ver, _) =>
      val expected = if (asof == 2 && k % 10 == 0) 2L else 1L
      assert(ver == expected, s"key $k asof $asof resolved version $ver")
    }
  }

  test("q_pagerank_items sums to ~1 and converges toward degree proportionality") {
    val pr = SparkEntry.queries("q_pagerank_items")(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(pr.nonEmpty)
    // total rank is conserved (damping redistributes, never leaks):
    // sum over nodes stays 1 within rounding slack
    val total = pr.values.sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank total $total")
    assert(pr.values.forall(v => v > 0 && v < 1))
  }

  test("q_mad_outliers flags exactly the rows a driver-side MAD computation flags") {
    val got = SparkEntry.queries("q_mad_outliers")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    val vals = Tables.events(spark, sf).where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
    def r(x: Double, s: Int) = { val f = math.pow(10, s); math.floor(x * f + 0.5) / f }
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else {
        val lo = s(n / 2 - 1); val hi = s(n / 2); lo + (hi - lo) * 0.5
      }
    }
    got.foreach { case (et, n, med, mad, nOut) =>
      val xs = vals.filter(_._1 == et).map(v => r(v._2, 2)).toSeq
      assert(n == xs.length)
      val m = r(medianOf(xs), 4)
      assert(math.abs(med - m) < 1e-9, s"$et median $med vs $m")
      val devs = xs.map(x => r(math.abs(x - m), 4))
      val md = r(medianOf(devs), 4)
      assert(math.abs(mad - md) < 1e-9, s"$et mad $mad vs $md")
      assert(nOut == devs.count(_ > 3.0 * 1.4826 * md), s"$et outlier count")
    }
  }

  test("q_ewma_value matches a driver-side fold over each user's event history") {
    val got = SparkEntry.queries("q_ewma_value")(spark, sf)
      .as[(Long, Double)].collect().toMap
    val events = Tables.events(spark, sf).where(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Long, Double)].collect()
    def r(x: Double, s: Int) = { val f = math.pow(10, s); math.floor(x * f + 0.5) / f }
    assert(got.size == events.length)
    events.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1)).map(e => (e._1, r(e._4, 2)))
      ordered.indices.foreach { i =>
        val window = ordered.slice(math.max(0, i - 7), i + 1)
        val expect = window.zipWithIndex.map { case ((_, v), j) =>
          BigDecimal(r(v * math.pow(2.0, -(window.length - 1 - j)), 8))
        }.sum.toDouble
        assert(math.abs(got(ordered(i)._1) - r(expect, 6)) < 1e-9,
          s"event ${ordered(i)._1}")
      }
    }
  }

  test("dedup_best_rep keeps the highest-quality member of every cluster") {
    val survivors = SparkEntry.queries("dedup_best_rep")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect() // (doc_id, cluster_rep)
    val quality = SparkEntry.queries("text_quality")(spark, sf)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val nDocs = Tables.documents(spark, sf).count()
    // every doc is accounted for exactly once across survivors' merges
    assert(survivors.map(_._2).sum == nDocs)
    // per cluster: the survivor is a member with the max quality
    clusters.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1).toSet
      val win = survivors.filter(s => ids.contains(s._1))
      assert(win.length == 1, s"cluster $ids kept ${win.length} survivors")
      assert(win.head._3 == ids.map(quality).max,
        s"survivor ${win.head._1} not max-quality in $ids")
      assert(win.head._2 == ids.size)
    }
  }

  test("q_item_cooccurrence lift is symmetric-complete and correctly normalized") {
    val df = SparkEntry.queries("q_item_cooccurrence")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(df.nonEmpty)
    // pairs are strictly ordered, no self-pairs, no duplicates
    assert(df.forall(r => r._1 < r._2))
    assert(df.map(r => (r._1, r._2)).distinct.length == df.length)
    // spot-check one pair's lift against a direct computation
    val ui = Tables.events(spark, sf)
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("bigint").as("item"))
      .where(col("item").isNotNull).distinct()
      .as[(Long, Long)].collect()
    val nUsers = ui.map(_._1).distinct.length.toDouble
    val byItem = ui.groupBy(_._2).map { case (i, rs) => i -> rs.length.toDouble }
    val (ia, ib, nBoth, lift) = df.head
    val both = ui.groupBy(_._1).count(rs =>
      rs._2.exists(_._2 == ia) && rs._2.exists(_._2 == ib))
    assert(both.toLong == nBoth)
    val expect = nBoth * nUsers / (byItem(ia) * byItem(ib))
    assert(math.abs(lift - expect) < 1e-6)
  }

  test("q_regression_price r2 equals q_corr_price_qty corr squared") {
    val r2 = SparkEntry.queries("q_regression_price")(spark, sf)
      .select("l_returnflag", "r2").as[(String, Double)].collect().toMap
    val corr = SparkEntry.queries("q_corr_price_qty")(spark, sf)
      .select("l_returnflag", "corr").as[(String, Double)].collect().toMap
    assert(r2.keySet == corr.keySet && r2.nonEmpty)
    r2.foreach { case (g, v) =>
      assert(math.abs(v - corr(g) * corr(g)) < 1e-5, s"group $g: r2=$v corr=${corr(g)}")
    }
  }

  test("text_entropy matches a driver-side fold and respects the ln(n) bound") {
    val got = SparkEntry.queries("text_entropy")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, n, h) =>
      val toks = texts(id).trim.split("\\s+").filter(_.nonEmpty)
      assert(toks.length.toLong == n)
      val ref = math.log(n.toDouble) - toks.groupBy(identity).values
        .map(g => g.length.toDouble * math.log(g.length.toDouble)).sum / n
      assert(math.abs(h - ref) < 1e-3, s"doc $id: got $h want $ref")
      // 5e-5 slack: the emitted value is rounded to 4 decimals
      assert(h >= -5e-5 && h <= math.log(n.toDouble) + 5e-5)
    }
  }

  test("text_unigram_logprob matches a driver-side add-one LM fold") {
    val got = SparkEntry.queries("text_unigram_logprob")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._3 < 0.0))
    val toksById = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty) }.toMap
    val corpus = toksById.values.flatten.groupBy(identity).map { case (w, g) => w -> g.size }
    val nTotal = corpus.values.map(_.toLong).sum
    val vocab = corpus.size
    got.foreach { case (id, n, lp) =>
      val toks = toksById(id)
      val ref = toks.map(w => math.log((corpus(w) + 1).toDouble / (nTotal + vocab).toDouble)).sum / n
      assert(math.abs(lp - ref) < 1e-3, s"doc $id: got $lp want $ref")
    }
  }

  test("q_backlog_daily sweep-line equals a driver-side fold and closes to zero") {
    val got = SparkEntry.queries("q_backlog_daily")(spark, sf)
      .as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 0L))
    assert(got.last._2 == 0L, "every opened interval must close")
    // reference: fold the raw intervals on the driver
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        floor(unix_millis(col("l_shipdate").cast("timestamp")) / 86400000L).as("sd"))
      .as[(Long, Long)].collect()
    val od = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        floor(unix_millis(col("o_orderdate").cast("timestamp")) / 86400000L).as("od"))
      .as[(Long, Long)].collect().toMap
    val deltas = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    li.foreach { case (ok, sd) =>
      deltas(od(ok)) += 1L; deltas(sd + 1) -= 1L
    }
    var run = 0L
    val ref = deltas.toSeq.sortBy(_._1).map { case (day, d) => run += d; (day, run) }
    assert(got.toSeq == ref, "bucketed carry-in cumulative != global fold")
  }

  test("q_yoy_growth conditional-agg plan scans orders exactly once") {
    val df = SparkEntry.queries("q_yoy_growth")(spark, sf)
    val nScans = "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(nScans == 1, s"expected a single orders scan, saw $nScans")
    val rows = df.as[(Long, Double, Option[Double], Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rev, prev, growth) =>
      assert(prev.isDefined == growth.isDefined)
      prev.foreach { p =>
        assert(math.abs(growth.get - (rev - p) / p) < 1e-5)
      }
    }
  }

  test("q_rolling_active_users equals a driver-side sliding-distinct fold") {
    val got = SparkEntry.queries("q_rolling_active_users")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    val du = Tables.events(spark, sf)
      .select(floor(unix_millis(col("ts")) / 86400000L).as("day"), col("user_id"))
      .distinct().as[(Long, Long)].collect()
    val ref = du.flatMap { case (day, u) => (day to day + 6).map(d => (d, u)) }
      .distinct.groupBy(_._1).map { case (d, us) => d -> us.length.toLong }
    assert(got == ref)
  }

  test("q_triangle_count corners sum to 3x the triangle total and match a driver fold") {
    val got = SparkEntry.queries("q_triangle_count")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    val ui = Tables.events(spark, sf)
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("bigint").as("item"))
      .where(col("item").isNotNull).distinct()
      .as[(Long, Long)].collect()
    val byItem = ui.groupBy(_._2).map { case (i, rs) => i -> rs.length.toLong }
    val nUsers = ui.map(_._1).distinct.length.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    ui.groupBy(_._1).values.foreach { rs =>
      val items: Seq[Long] = rs.map(_._2).distinct.sorted.toSeq
      for (a <- items; b <- items if a < b) pairCounts((a, b)) += 1L
    }
    // .iterator: collect on a Map of pairs would re-merge by key
    val edges: Set[(Long, Long)] = pairCounts.iterator.collect { case ((a, b), nb)
        if r6(nb.toDouble * nUsers / (byItem(a) * byItem(b)).toDouble) >= 1.05 =>
      (a, b)
    }.toSet
    val ref = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((i, j) <- edges; (j2, k) <- edges if j2 == j && edges((i, k))) {
      ref(i) += 1; ref(j) += 1; ref(k) += 1
    }
    assert(got == ref.toMap)
    assert(got.values.sum % 3 == 0)
  }

  test("q_revenue_share shares sum to one within each region") {
    val rows = SparkEntry.queries("q_revenue_share")(spark, sf)
      .as[(String, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    rows.groupBy(_._1).foreach { case (region, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"region $region shares")
    }
  }

  test("q_event_transitions counts match a driver-side sequence fold and rows normalize") {
    val got = SparkEntry.queries("q_event_transitions")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (from, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"from $from probs")
    }
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val ref = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rs =>
      val ordered = rs.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.sliding(2).foreach {
        case Array(a, b) => ref((a, b)) += 1L
        case _ =>
      }
    }
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == ref.toMap)
  }

  test("q_allocate_price preserves order totals exactly and stays within one cent of exact shares") {
    val got = SparkEntry.queries("q_allocate_price")(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(got.nonEmpty)
    val totals = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("ct"))
      .as[(Long, Long)].collect().toMap
    // lineitem carries duplicate (orderkey, linenumber) rows (dirty
    // bronze); allocations are a deterministic MULTISET per order —
    // compare against a full largest-remainder reference fold
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("e"))
      .as[(Long, Int, Long)].collect()
    val refByOrder = li.groupBy(_._1).map { case (ok, rows) =>
      val ct = totals(ok); val se = rows.map(_._3).sum
      val withBase = rows.map { case (_, ln, e) =>
        val p = ct * e; (ln, p % se, p / se)
      }
      val leftover = (ct - withBase.map(_._3).sum).toInt
      val ranked = withBase.sortBy { case (ln, rm, _) => (-rm, ln) }
      val cents = ranked.zipWithIndex.map { case ((_, _, base), i) =>
        base + (if (i < leftover) 1L else 0L)
      }
      // every allocation within 1 cent of its exact share
      ranked.zip(cents).foreach { case ((ln, rm, base), c) =>
        val e = rows.find(r => r._2 == ln && (ct * r._3) % se == rm).get._3
        val exact = ct.toDouble * e / se
        assert(math.abs(c - exact) < 1.0 + 1e-9, s"order $ok line $ln drift")
      }
      ok -> cents.sorted.toSeq
    }
    got.groupBy(_._1).foreach { case (ok, lines) =>
      val cents = lines.map(r => math.round(r._3 * 100))
      assert(cents.sum == totals(ok), s"order $ok total not preserved")
      assert(cents.sorted.toSeq == refByOrder(ok), s"order $ok multiset mismatch")
    }
  }

  test("q_locf_value matches a driver-side carry-forward fold") {
    val got = SparkEntry.queries("q_locf_value")(spark, sf)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.nonEmpty)
    assert(got.exists(_._4.isEmpty) || got.length < 7,
      "planted nulls before any observation should survive somewhere")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        graft.functions.Det.roundTo(col("value"), 2).as("v"))
      .as[(Long, Long, Long, Double)].collect()
    val ref = ev.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(r => (r._3, r._2)).iterator.map { case (u, id, _, v) =>
        if (id % 7 != 0) lastSeen = Some(v)
        (u, id) -> lastSeen
      }
    }.toMap
    got.foreach { case (u, id, _, filled) =>
      assert(filled == ref((u, id)), s"user $u event $id")
    }
  }

  test("q_order_lifecycle milestones are ordered and cover every order with lines") {
    val got = SparkEntry.queries("q_order_lifecycle")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (ok, _, nLines, first, lastD, dFirst, dComplete) =>
      assert(nLines >= 1)
      assert(first <= lastD, s"order $ok milestones out of order")
      assert(dFirst <= dComplete, s"order $ok durations inconsistent")
      assert(dComplete == lastD - (first - dFirst), s"order $ok arithmetic")
    }
    val nOrdersWithLines = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(got.length.toLong == nOrdersWithLines)
  }

  test("q_skyline_parts equals the brute-force dominance fold") {
    // the graded plan is the windowed two-pass formulation; this fold
    // is the O(n^2) textbook definition the oracle also uses
    val got = SparkEntry.queries("q_skyline_parts")(spark, sf)
      .select("p_partkey").as[Long].collect().toSet
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))
      .as[(Long, String, Double, Int)].collect()
    val want = parts.groupBy(_._2).values.flatMap { brand =>
      brand.filter { p =>
        !brand.exists(q => q._3 <= p._3 && q._4 >= p._4 &&
          (q._3 < p._3 || q._4 > p._4))
      }
    }.map(_._1).toSet
    assert(got == want,
      s"skyline mismatch: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("q_trade_volume pairs are asymmetric-complete and total the filtered revenue") {
    val got = SparkEntry.queries("q_trade_volume")(spark, sf)
      .as[(String, String, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (sn, cn, yr, vol) =>
      assert(sn != cn && (yr == 1995 || yr == 1996) && vol > 0) }
    // the pair cells partition the filtered cross-nation revenue
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(col("l_extendedprice"), col("l_discount"))
      .as[(Double, Double)].collect()
      .map(p => BigDecimal(r2(p._1 * (1 - p._2)))).sum
    assert((got.map(r => BigDecimal(r._4)).sum - want).abs < BigDecimal(0.01))
  }

  test("q_important_parts selects exactly the parts above the 1/2000 share gate") {
    val cents = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        floor(roundTo(col("l_extendedprice") * (lit(1) - col("l_discount")), 2) * 100
          + lit(0.5)).cast("long").as("c"))
      .as[(Long, Long)].collect()
    val perPart = cents.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = perPart.values.sum
    val want = perPart.filter { case (_, c) => c * 2000 > total }.keySet
    val got = SparkEntry.queries("q_important_parts")(spark, sf)
      .select("l_partkey").as[Long].collect().toSet
    assert(got.nonEmpty && got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("q_top_supplier keeps every supplier tied at the quarter max") {
    val cents = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .select(col("l_suppkey"),
        floor(roundTo(col("l_extendedprice") * (lit(1) - col("l_discount")), 2) * 100
          + lit(0.5)).cast("long").as("c"))
      .as[(Long, Long)].collect()
    val perSupp = cents.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mx = perSupp.values.max
    val want = perSupp.filter(_._2 == mx).keySet
    val got = SparkEntry.queries("q_top_supplier")(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(got.map(_._1).toSet == want)
    got.foreach { case (_, _, rev) =>
      assert(math.abs(rev - mx.toDouble / 100) < 1e-9) }
  }

  test("q_km_survival matches a driver KM replay and curves are monotone") {
    val got = SparkEntry.queries("q_km_survival")(spark, sf)
      .as[(String, Int, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_._2)
      // at-risk shrinks, log-survival falls, hazard in (0,1]
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 && a._6 >= b._6, s"$p day ${b._2}")
      case _ => () }
      sorted.foreach { r => assert(r._5 > 0 && r._5 <= 1.0) }
    }
    // driver replay
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val first = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship1"))
    val durs = Tables.orders(spark, sf)
      .join(first, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("ship1").cast("date"), col("o_orderdate").cast("date")))
      .as[(String, Int)].collect().filter(_._2 >= 0)
    val want = durs.groupBy(_._1).flatMap { case (p, rs) =>
      val obs = rs.map(r => (math.min(r._2, 60), r._2 <= 60))
      val byDay = obs.groupBy(_._1).view
        .mapValues(v => (v.count(_._2).toLong, v.count(!_._2).toLong)).toSeq
        .sortBy(_._1)
      var atRisk = obs.length.toLong
      var logS = BigDecimal(0)
      byDay.flatMap { case (day, (dd, cc)) =>
        val row = if (dd > 0) {
          logS += BigDecimal(r6(math.log(1.0 - dd.toDouble / atRisk)))
          Some((p, day) -> (dd, atRisk, r6(logS.toDouble)))
        } else None
        atRisk -= dd + cc
        row
      }
    }
    assert(got.length == want.size)
    got.foreach { case (p, day, dd, n, _, ls) =>
      val (wd, wn, wls) = want((p, day))
      assert(dd == wd && n == wn && ls == wls, s"$p day $day") }
  }

  test("q_small_qty_revenue matches the driver cross-multiply fold") {
    val Array(got) = SparkEntry.queries("q_small_qty_revenue")(spark, sf)
      .as[Double].collect()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long"),
        col("l_extendedprice"))
      .as[(Long, Long, Double)].collect()
    val stats = rows.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.length.toLong)).toMap
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val kept = rows.filter { case (pk, qc, _) =>
      val (s0, n) = stats(pk); qc * 5 * n < s0 }
    val want = r2(kept.map(r => BigDecimal(r2(r._3))).sum.toDouble / 7)
    assert(kept.nonEmpty && got == want)
  }

  test("q_big_orders keeps exactly the orders past the quantity threshold") {
    val got = SparkEntry.queries("q_big_orders")(spark, sf)
      .as[(Long, String, Long, java.sql.Date, Double, Double)].collect()
    assert(got.nonEmpty)
    val sums = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = sums.filter(_._2 > 20000).keySet
    assert(got.map(_._3).toSet == want)
    got.foreach { case (_, _, ok, _, _, qty) =>
      assert(qty == sums(ok).toDouble / 100, s"order $ok qty") }
  }

  test("q_idle_rich_customers selects above-average customers with no orders") {
    val got = SparkEntry.queries("q_idle_rich_customers")(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(got.nonEmpty)
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"))
      .as[(Long, Int, Long)].collect()
    val withOrders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < to_timestamp(lit("1994-01-01 00:00:00")))
      .select("o_custkey").as[Long].collect().toSet
    val pos = cust.filter(_._3 > 0)
    val (sc, np) = (pos.map(_._3).sum, pos.length.toLong)
    val sel = cust.filter(c => c._3 * np > sc && !withOrders(c._1))
    val want = sel.groupBy(_._2).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_._3).sum.toDouble / 100) }.toMap
    assert(got.length == want.size)
    got.foreach { case (nk, n, bal) =>
      val (wn, wb) = want(nk)
      assert(n == wn && math.abs(bal - wb) < 1e-6, s"nation $nk") }
  }

  test("q_ohlc_monthly bars are internally consistent and match a driver fold") {
    val got = SparkEntry.queries("q_ohlc_monthly")(spark, sf)
      .as[(Long, Double, Double, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (mm, o, h, l, c, n) =>
      assert(l <= o && o <= h && l <= c && c <= h && n >= 1, s"month $mm") }
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val rows = Tables.orders(spark, sf)
      .select(unix_millis(date_trunc("month", col("o_orderdate"))),
        col("o_totalprice"), unix_millis(col("o_orderdate").cast("timestamp")),
        col("o_orderkey"))
      .as[(Long, Double, Long, Long)].collect()
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      (r2(sorted.head._2), rs.map(r => r2(r._2)).max,
        rs.map(r => r2(r._2)).min, r2(sorted.last._2), rs.length.toLong)
    }.toMap
    got.foreach { case (mm, o, h, l, c, n) =>
      assert(want(mm) == ((o, h, l, c, n)), s"month $mm bar mismatch") }
  }

  test("q_max_drawdown is 0 for peak-ending series and within [0,1)") {
    val got = SparkEntry.queries("q_max_drawdown")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (b, n, dd) =>
      assert(n >= 1 && dd >= 0.0 && dd < 1.0, s"$b dd=$dd") }
    // driver replay on one brand: fold the monthly cents and track peak
    val cells = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf)
        .select(col("p_partkey"), lower(col("p_brand")).as("brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"),
        unix_millis(date_trunc("month", col("l_shipdate"))).as("mm"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
        + lit(0.5)).cast("long")).as("c"))
      .as[(String, Long, Long)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = cells.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.sortBy(_._2)
      var peak = Long.MinValue; var mx = 0.0
      sorted.foreach { r =>
        peak = math.max(peak, r._3)
        mx = math.max(mx, r6((peak - r._3).toDouble / peak)) }
      (rs.length.toLong, mx)
    }.toMap
    got.foreach { case (b, n, dd) => assert(want(b) == ((n, dd)), s"brand $b") }
  }

  test("q_systematic_sample strides the exact rank and covers ceil(n/20) rows") {
    val got = SparkEntry.queries("q_systematic_sample")(spark, sf)
      .as[(Long, Double, Long)].collect()
    val n = Tables.customer(spark, sf).count()
    assert(got.length == ((n + 19) / 20).toInt)
    assert(got.map(_._3).toSeq == got.indices.map(i => 20L * i + 1))
    // descending-balance order: sampled balances are non-increasing
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"ranks ${a._3},${b._3} out of order")
    case _ => () }
  }

  test("q_mutual_info statistics match the driver contingency fold") {
    val Array((n, mi, chi2, v)) = SparkEntry.queries("q_mutual_info")(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    def r(x: Double, s: Int) = { val f = math.pow(10, s); math.floor(x * f + 0.5) / f }
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .as[(String, String)].collect()
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nT = rows.length.toLong
    val rowT = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val miW = cells.map { case ((p, st), obs) =>
      BigDecimal(r(obs.toDouble / nT *
        math.log(obs.toDouble * nT / (rowT(p).toDouble * colT(st))), 6)) }.sum
    val chiW = cells.map { case ((p, st), obs) =>
      val e = rowT(p).toDouble * colT(st) / nT
      BigDecimal(r((obs - e) * (obs - e) / e, 6)) }.sum
    assert(n == nT && mi == r(miW.toDouble, 4) && chi2 == r(chiW.toDouble, 4))
    val vW = r(math.sqrt(chiW.toDouble / (nT *
      math.min(rowT.size - 1, colT.size - 1))), 6)
    assert(v == vW && v >= 0 && v <= 1 && mi >= -1e-4)
  }

  test("q_hhi_market HHI is bounded by the uniform floor and 1") {
    val got = SparkEntry.queries("q_hhi_market")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (cat, nB, hhi) =>
      assert(nB >= 1 && hhi > 0 && hhi <= 1.0 + 1e-6, s"$cat hhi=$hhi")
      // Σ share² is minimized at equal shares: hhi ≥ 1/n (up to rounding)
      assert(hhi >= 1.0 / nB - 1e-4, s"$cat hhi below uniform floor") }
  }

  test("q_trend_mk matches the driver pair fold and tau is bounded") {
    val Array((n, sStat, tau)) = SparkEntry.queries("q_trend_mk")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val months = Tables.orders(spark, sf)
      .select(unix_millis(date_trunc("month", col("o_orderdate"))).as("mm"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val sW = (for { i <- months.indices; j <- i + 1 until months.length }
      yield java.lang.Long.signum(months(j)._2 - months(i)._2).toLong).sum
    assert(n == months.length && sStat == sW)
    assert(math.abs(tau) <= 1.0 + 1e-9)
    val nPairs = n * (n - 1) / 2
    assert(math.abs(tau - sStat.toDouble / nPairs) < 1e-6)
  }

  test("q_cust_order_dist histogram covers every customer exactly once") {
    val got = SparkEntry.queries("q_cust_order_dist")(spark, sf)
      .as[(Long, Long)].collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(got.map(_._2).sum == nCust, "histogram must partition customers")
    // count buckets are distinct and non-negative (0 appears iff some
    // customer has no non-F order — data-dependent, so not asserted)
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall(_._1 >= 0L))
  }

  test("q_attribution matches a driver-side last-touch replay") {
    val got = SparkEntry.queries("q_attribution")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var lastTouch: String = null
      ordered.flatMap { e =>
        if (e._4 == "purchase") Some(Option(lastTouch).getOrElse("none"))
        else { lastTouch = e._4; None }
      }
    }.groupBy(identity).map { case (ch, xs) => ch -> xs.length.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("q_active_streaks matches a driver-side islands fold") {
    val got = SparkEntry.queries("q_active_streaks")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val days = Tables.events(spark, sf)
      .select(col("user_id"), floor(unix_millis(col("ts")) / 86400000L)
        .cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
    val want = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sorted
      val runs = scala.collection.mutable.ListBuffer.empty[Long]
      var cur = 0L
      var prev = Long.MinValue
      for (day <- sorted) {
        if (day == prev + 1) cur += 1
        else { if (cur > 0) runs += cur; cur = 1 }
        prev = day
      }
      runs += cur
      u -> ((runs.max, runs.length.toLong))
    }
    assert(got == want)
  }

  test("q_top_growth_parts executes on the top-k operator with exactly 3 per brand") {
    val q = SparkEntry.queries("q_top_growth_parts")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
    val rows = q.select("p_brand", "rn").as[(String, Long)].collect()
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val rns = rs.map(_._2).sorted
      assert(rns.sameElements(1L to rns.length) && rns.length <= 3,
        s"brand $b ranks ${rns.mkString(",")}")
    }
  }

  test("q_boolean_search is a narrow scan: its only exchange is the output sort") {
    val q = SparkEntry.queries("q_boolean_search")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"boolean search should not shuffle data:\n$plan")
    // every hit really contains all three terms
    val hits = q.select("doc_id").as[Long].collect().toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = docs.filter { case (_, t) =>
      val ws = t.trim.split("\\s+").toSet
      Seq("window", "hash", "stream").forall(ws.contains)
    }.map(_._1).toSet
    assert(hits == want)
  }

  test("q_decile_lift deciles partition the scored customers and capture reaches 1") {
    val rows = SparkEntry.queries("q_decile_lift")(spark, sf)
      .select("decile", "n_cust", "n_resp", "cum_capture")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).sameElements(1L to rows.length))
    // NTILE law: sizes differ by at most one and are non-increasing
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sameElements(sizes.sortBy(-_)))
    // capture is monotone and ends at 1.0 (some responders exist)
    val caps = rows.map(_._4)
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-6)
  }

  test("q_revenue_bridge classes partition active customers and deltas reconcile") {
    val rows = SparkEntry.queries("q_revenue_bridge")(spark, sf)
      .as[(String, Long, Double)].collect()
    val dec = "decimal(18,2)"
    val byCust = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate").cast("date")).as("yr"),
        graft.functions.Det.roundTo(col("o_totalprice"), 2).cast(dec).as("p"))
      .groupBy("o_custkey")
      .agg((coalesce(sum(when(col("yr") === 1995, col("p"))), lit(0).cast(dec)) * 100)
          .cast("long").as("pc"),
        (coalesce(sum(when(col("yr") === 1996, col("p"))), lit(0).cast(dec)) * 100)
          .cast("long").as("cc"))
      .filter(col("pc") > 0 || col("cc") > 0)
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == byCust.length.toLong)
    val totalDeltaCents = byCust.map(c => c._3 - c._2).sum
    val gotDelta = rows.map(_._3).sum
    assert(math.abs(gotDelta - totalDeltaCents / 100.0) < 1e-4,
      s"net deltas $gotDelta vs ${totalDeltaCents / 100.0}")
  }

  test("q_gini_acctbal matches the exact rank-weighted fold per nation") {
    val got = SparkEntry.queries("q_gini_acctbal")(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(got.nonEmpty)
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"),
        graft.functions.Det.roundTo(col("c_acctbal"), 2).as("bal"))
      .as[(Int, Long, Double)].collect()
    val byNation = cust.groupBy(_._1)
    got.foreach { case (nk, n, gini) =>
      val xs = byNation(nk).sortBy(c => (c._3, c._2)).map(_._3)
      assert(xs.length.toLong == n)
      val sx = xs.sum
      val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val ref = (2.0 * srx - (n + 1) * sx) / (n * sx)
      assert(math.abs(gini - ref) < 1e-4, s"nation $nk: got $gini want $ref")
    }
  }

  test("q_auc_mw equals brute-force tie-aware pair counting per nation") {
    val got = SparkEntry.queries("q_auc_mw")(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val cust = Tables.customer(spark, sf).select(col("c_nationkey"),
        graft.functions.Det.roundTo(col("c_acctbal"), 2), col("c_mktsegment"))
      .as[(Int, Double, String)].collect()
    val byNation = cust.groupBy(_._1)
    got.foreach { case (nk, np, nn, auc) =>
      val pos = byNation(nk).filter(_._3 == "BUILDING").map(_._2)
      val neg = byNation(nk).filter(_._3 != "BUILDING").map(_._2)
      assert(pos.length.toLong == np && neg.length.toLong == nn)
      val wins = (for (p <- pos; q <- neg)
        yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      val ref = wins / (np * nn)
      assert(math.abs(auc - ref) < 1e-5, s"nation $nk: got $auc want $ref")
    }
    // every nation holding both classes is present in the output
    val covered = byNation.filter { case (_, rs) =>
      rs.exists(_._3 == "BUILDING") && rs.exists(_._3 != "BUILDING") }.keySet
    assert(got.map(_._1).toSet == covered)
  }

  test("q_ks_test equals the driver ECDF sup fold and lies in [0,1]") {
    val got = SparkEntry.queries("q_ks_test")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderpriority"),
        graft.functions.Det.roundTo(col("o_totalprice"), 2), col("o_orderstatus"))
      .as[(String, Double, String)].collect()
    val byPrio = o.groupBy(_._1)
    got.foreach { case (prio, nf, no, ks) =>
      val fs = byPrio(prio).filter(_._3 == "F").map(_._2)
      val os = byPrio(prio).filter(_._3 == "O").map(_._2)
      assert(fs.length.toLong == nf && os.length.toLong == no)
      val ref = (fs ++ os).distinct.map { v =>
        math.abs(fs.count(_ <= v).toDouble / nf - os.count(_ <= v).toDouble / no)
      }.max
      assert(ks >= 0.0 && ks <= 1.0 && math.abs(ks - ref) < 1e-5,
        s"$prio: got $ks want $ref")
    }
  }

  test("q_psi_drift shares sum to ~1 per year and PSI equals the term fold") {
    val got = SparkEntry.queries("q_psi_drift")(spark, sf)
      .select("n_a", "n_b", "share_a", "share_b", "term", "psi")
      .as[(Long, Long, Double, Double, Option[Double], Double)].collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
    // one-year-only buckets carry no term; PSI is the sum of the rest
    got.foreach { case (na, nb, _, _, term, _) =>
      assert(term.isDefined == (na > 0 && nb > 0)) }
    val ref = got.flatMap(_._5).sum
    assert(math.abs(got.head._6 - ref) < 1e-3, s"psi ${got.head._6} want $ref")
  }

  test("text_zipf_fit slope is negative and matches the driver OLS fold") {
    val got = SparkEntry.queries("text_zipf_fit")(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (n, slope, intercept, r2) = got.head
    assert(n > 2 && slope < 0.0 && r2 >= 0.0 && r2 <= 1.0)
    val freqs = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
      .sortBy { case (t, f) => (-f, t) }.take(200)
    assert(freqs.length.toLong == n)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log10(i + 1.0), math.log10(f.toDouble)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val refSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - refSlope) < 1e-3, s"slope $slope want $refSlope")
    assert(math.abs(intercept - (sy - refSlope * sx) / n) < 1e-2)
  }

  test("q_mean_kpis satisfies the AM >= GM >= HM inequality and the fold") {
    val got = SparkEntry.queries("q_mean_kpis")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val prices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        graft.functions.Det.roundTo(col("l_extendedprice"), 2))
      .as[(String, Double)].collect().groupBy(_._1)
    got.foreach { case (flag, n, am, gm, hm) =>
      assert(am >= gm && gm >= hm, s"$flag: $am >= $gm >= $hm violated")
      val xs = prices(flag).map(_._2)
      assert(xs.length.toLong == n)
      assert(math.abs(am - xs.sum / n) < 1e-2)
      assert(math.abs(gm - math.exp(xs.map(math.log).sum / n)) < 1e-2)
      assert(math.abs(hm - n / xs.map(1.0 / _).sum) < 1e-2)
    }
  }

  test("q_weighted_quartiles matches the driver running-weight fold and is monotone") {
    val got = SparkEntry.queries("q_weighted_quartiles")(spark, sf)
      .as[(String, Int, Double)].collect()
    assert(got.nonEmpty)
    val rows = Tables.lineitem(spark, sf).select(col("l_returnflag"),
        graft.functions.Det.roundTo(col("l_extendedprice"), 2),
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 100).cast("long"))
      .as[(String, Double, Long, Long, Long)].collect()
    val want = rows.groupBy(_._1).flatMap { case (f, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3, r._4))
      val total = sorted.map(_._5).sum
      Seq(25, 50, 75).map { p =>
        var cum = 0L
        (f, p) -> sorted.find { r => cum += r._5; 100 * cum >= p * total }.get._2
      }
    }
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    got.groupBy(_._1).foreach { case (f, qs) =>
      val m = qs.map(r => r._2 -> r._3).toMap
      assert(m(25) <= m(50) && m(50) <= m(75), s"$f quartiles not monotone")
    }
  }

  test("q_percent_rank endpoints and step sizes follow the closed forms") {
    val got = SparkEntry.queries("q_percent_rank")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (nk, rs) =>
      val n = rs.length
      val pr = rs.map(_._4).sorted
      val cd = rs.map(_._5).sorted
      assert(math.abs(pr.head) < 1e-9 && math.abs(cd.last - 1.0) < 1e-9)
      if (n > 1) {
        assert(math.abs(pr.last - 1.0) < 1e-9, s"nation $nk max pct_rank")
        // unique total order => evenly spaced grids
        pr.zipWithIndex.foreach { case (v, i) =>
          assert(math.abs(v - i.toDouble / (n - 1)) < 1e-5) }
        cd.zipWithIndex.foreach { case (v, i) =>
          assert(math.abs(v - (i + 1).toDouble / n) < 1e-5) }
      }
    }
  }

  test("q_assoc_rules confidence and lift are consistent and symmetric in lift") {
    val got = SparkEntry.queries("q_assoc_rules")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, n, conf, lift) =>
      assert(n >= 3 && conf >= 0.2 && conf <= 1.0 && lift > 0.0) }
    // lift is direction-independent: wherever both directions survive
    // the confidence gate they must carry the same lift
    val byPair = got.groupBy(r => (math.min(r._1, r._2), math.max(r._1, r._2)))
    assert(byPair.exists(_._2.length == 2))
    byPair.values.filter(_.length == 2).foreach { rs =>
      assert(math.abs(rs(0)._5 - rs(1)._5) < 1e-9)
      assert(rs(0)._3 == rs(1)._3)
    }
  }

  test("dq_benford digits cover 1-9, counts partition orders, fold matches") {
    val got = SparkEntry.queries("dq_benford")(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty && got.map(_._1).toSet.subsetOf((1 to 9).toSet))
    val cents = Tables.orders(spark, sf)
      .select(graft.functions.Det.roundTo(col("o_totalprice") * 100, 0)
        .cast("long"))
      .as[Long].collect()
    assert(got.map(_._2).sum == cents.length.toLong)
    val wantCounts = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (dd, xs) => dd -> xs.length.toLong }
    assert(got.map(r => r._1 -> r._2).toMap == wantCounts)
    got.foreach { case (dd, _, obs, exp, dev) =>
      assert(math.abs(exp - math.log10(1.0 + 1.0 / dd)) < 1e-5)
      assert(math.abs(dev - math.abs(obs - exp)) < 1e-5)
    }
  }

  test("q_ship_priority is the true revenue top-10 under the driver fold") {
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val cut = "1996-06-15 00:00:00"
    val lines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") > to_timestamp(lit(cut)))
      .join(Tables.orders(spark, sf).filter(col("o_orderdate") < to_timestamp(lit(cut))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)].collect()
    val perOrder = lines.groupBy(_._1).view
      .mapValues(_.map(p => BigDecimal(r2(p._2 * (1 - p._3)))).sum).toMap
    val want = perOrder.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val got = SparkEntry.queries("q_ship_priority")(spark, sf)
      .select("l_orderkey", "revenue").as[(Long, Double)].collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gk, gv), (wk, wv)) =>
      assert(gk == wk && (BigDecimal(gv) - wv).abs < BigDecimal("0.01")) }
  }

  test("q_market_share bounds hold and the market totals match the fold") {
    val got = SparkEntry.queries("q_market_share")(spark, sf)
      .as[(Int, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nat, tot, share) =>
      assert(nat >= 0 && nat <= tot && share >= 0 && share <= 1) }
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val want = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_regionkey") === 1)
      .select(col("l_extendedprice"), col("l_discount"))
      .as[(Double, Double)].collect()
      .map(p => BigDecimal(r2(p._1 * (1 - p._2)))).sum
    assert((got.map(r => BigDecimal(r._3)).sum - want).abs < BigDecimal("0.01"))
  }

  test("q_returned_items is the global lost-revenue top-20") {
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val lines = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)].collect()
    val perCust = lines.groupBy(_._1).view
      .mapValues(_.map(p => BigDecimal(r2(p._2 * (1 - p._3)))).sum).toMap
    val want = perCust.toSeq.sortBy { case (k, v) => (-v, k) }.take(20)
    val got = SparkEntry.queries("q_returned_items")(spark, sf)
      .select("c_custkey", "lost_revenue").as[(Long, Double)].collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gk, gv), (wk, wv)) =>
      assert(gk == wk && (BigDecimal(gv) - wv).abs < BigDecimal("0.01")) }
  }

  test("q_promo_share months partition the joined revenue and pct is exact") {
    val got = SparkEntry.queries("q_promo_share")(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, promo, tot, pct) =>
      assert(promo >= 0 && promo <= tot)
      assert(math.abs(pct - math.floor(100.0 * (promo / tot) * 1e6 + 0.5) / 1e6) < 1e-4)
    }
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val want = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_extendedprice"), col("l_discount"))
      .as[(Double, Double)].collect()
      .map(p => BigDecimal(r2(p._1 * (1 - p._2)))).sum
    assert((got.map(r => BigDecimal(r._3)).sum - want).abs < BigDecimal("0.01"))
  }

  test("q_forecast_revenue pushes all three predicates into the parquet scan") {
    val df = SparkEntry.queries("q_forecast_revenue")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the scan node must carry pushed filters on every predicate column
    val scanLine = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scanLine.contains(c), s"$c not pushed to scan:\n$scanLine")
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .as[(String, Double, Double, Double)].collect()
      .filter(r => r._1 >= "1996-01-01" && r._1 < "1997-01-01" &&
        r._2 >= 0.05 && r._2 <= 0.07 && r._3 < 24.0)
    val want = lines.map(r => BigDecimal(r2(r._4 * r._2))).sum
    val Array((rev, n)) = df.as[(Double, Long)].collect()
    assert(n == lines.length && (BigDecimal(rev) - want).abs < BigDecimal("0.01"))
  }

  test("q_brand_promo_revenue matches the three-clause driver fold") {
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_size"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .as[(String, Int, Double, Double, Double)].collect()
      .filter { case (b, sz, q, _, _) =>
        (b == "Brand#4" && sz >= 1 && sz <= 15 && q >= 1 && q <= 20) ||
        (b == "Brand#19" && sz >= 10 && sz <= 30 && q >= 10 && q <= 30) ||
        (b == "Brand#8" && sz >= 20 && sz <= 50 && q >= 20 && q <= 40)
      }
    val want = rows.map(r => BigDecimal(r2(r._4 * (1 - r._5)))).sum
    val Array((rev, n)) =
      SparkEntry.queries("q_brand_promo_revenue")(spark, sf)
        .as[(Double, Long)].collect()
    assert(n == rows.length && (BigDecimal(rev) - want).abs < BigDecimal("0.01"))
  }

  test("q_nation_profit totals the per-line rev-minus-cost cents") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").like("%gear%")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_extendedprice"), col("l_discount"),
        col("p_retailprice"), col("l_quantity"))
      .as[(Double, Double, Double, Double)].collect()
    val wantCents = rows.map { case (ep, disc, rp, q) =>
      (math.floor(ep * (1 - disc) * 100 + 0.5) -
        math.floor(0.6 * rp * q * 100 + 0.5)).toLong
    }.sum
    val got = SparkEntry.queries("q_nation_profit")(spark, sf)
      .select("profit").as[Double].collect()
    assert(got.nonEmpty)
    val gotCents = got.map(p => math.round(p * 100)).sum
    assert(gotCents == wantCents, s"$gotCents != $wantCents")
  }

  test("q_dominant_suppliers is exactly the >20% cross-multiply set") {
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long"))
      .as[(Long, Long, Long)].collect()
    val ps = qty.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val totals = qty.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = ps.iterator.collect {
      case ((p, su), q) if q * 5 > totals(p) => su -> p
    }.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_dominant_suppliers")(spark, sf)
      .select("s_suppkey", "n_parts_dominated").as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got == want,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
  }

  test("q_sole_late_shipper credits the unique max shipper on multi-supplier orders") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_millis(col("l_shipdate").cast("timestamp")))
      .as[(Long, Long, Long)].collect()
    val want = rows.groupBy(_._1).iterator.flatMap { case (_, ls) =>
      val perSupp = ls.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
      val om = perSupp.values.max
      val atMax = perSupp.filter(_._2 == om).keys
      if (perSupp.size >= 2 && atMax.size == 1) Some(atMax.head) else None
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_sole_late_shipper")(spark, sf)
      .select("s_suppkey", "waiting_orders").as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got == want)
  }
}
