package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}
import graft.operators.Skew
import graft.similarity.Similarity

class LayoutAndSkewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned write prunes partitions on read") {
    val dir = tmp("graft-part")
    Layout.writePartitioned(
      Tables.orders(spark, sf).withColumn("status", col("o_orderstatus")),
      dir, Seq("status"))
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    // physical plan must carry the partition filter (pruned listing)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("status"))
    val full = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() === full)
  }

  test("q_bucketed_join reads bucketed scans and never hash-shuffles the join") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    df.count() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"join inputs not bucketed:\n$plan")
    // the only exchange allowed is the output ORDER BY's range
    // partitioning — the join itself must read co-located buckets
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still hash-shuffles:\n$plan")
  }

  test("q_pruned_read scans exactly one partition (graded pruning)") {
    val df = SparkEntry.queries("q_pruned_read")(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("PartitionFilters"))
    assert(scan.isDefined, "no scan with PartitionFilters in q_pruned_read plan")
    assert(scan.get.contains("event_type"),
      s"partition filter does not mention event_type:\n${scan.get}")
    // only the 'click' directory is listed: every surviving row is
    // that partition's, and the file-index selection is 1 of 5
    val types = df.select(col("event_type")).distinct().collect().map(_.getString(0))
    assert(types.toSeq === Seq("click"))
  }

  test("dedup_pipeline reuses ONE materialized pair graph across stages") {
    val df = SparkEntry.queries("dedup_pipeline")(spark, sf)
    // the pair pipeline (shingle -> simhash -> banded join) is
    // consumed exactly once, at connectedComponents build time; the
    // graded plan must NOT contain the simhash expression — both the
    // drop-list and size-map branches read the materialized CC result
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_simhash"),
      s"dedup_pipeline plan recomputes the pair graph:\n$plan")
    // cross-check against the three independently graded stages
    val docs = Tables.documents(spark, sf)
    val edges = graft.dedup.NearDup.simHashPairs(docs, "doc_id", "text", maxDist = 6)
      .select("id_a", "id_b")
    val members = graft.dedup.Clusters.connectedComponents(edges)
    val survivors = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val drops = members.filter(col("id") =!= col("cluster_rep"))
      .collect().map(_.getLong(0)).toSet
    val reps = members.groupBy("cluster_rep").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(drops.forall(d => !survivors.contains(d)), "a dropped doc survived")
    reps.foreach { case (rep, size) =>
      assert(survivors.get(rep).contains(size), s"rep $rep size mismatch")
    }
    val nDocs = docs.count()
    assert(survivors.size.toLong === nDocs - drops.size)
    assert(survivors.values.sum === nDocs, "merge accounting must cover every doc")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_custkey", 4,
        sortCols = Seq("o_custkey"))
      Layout.writeBucketed(Tables.customer(spark, sf), "b_customer", "c_custkey", 4,
        sortCols = Seq("c_custkey"))
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      j.count() // materialize (finalizes the AQE plan)
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("Bucketed: true"), s"not a bucketed scan:\n$planStr")
      assert(!planStr.contains("ShuffleExchange"),
        s"expected no shuffle exchange in bucketed join:\n$planStr")
      val expected = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
      assert(j.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("clusterBy produces non-overlapping per-file ranges (data skipping)") {
    val dir = tmp("graft-cluster")
    Layout.clusterBy(Tables.lineitem(spark, sf), nFiles = 4, "l_orderkey")
      .write.mode("overwrite").parquet(dir)
    // per output file, [min, max] of the cluster key must not overlap
    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f").agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo").collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"file ranges overlap: $a vs $b")
    }
  }

  test("zorderBy gives file-level locality on BOTH cluster columns") {
    val dir = tmp("graft-zorder")
    val li = Tables.lineitem(spark, sf)
    Layout.zorderBy(li, nFiles = 8, Seq("l_orderkey", "l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
    val nFiles = out.select(input_file_name()).distinct().count()
    assert(nFiles >= 4, s"expected several files, got $nFiles")
    // a narrow band on EITHER column should touch a minority of files
    def filesTouched(c: String, lo: Long, hi: Long): Long =
      out.filter(col(c).between(lo, hi))
        .select(input_file_name()).distinct().count()
    val Array(okLo, okHi) = li.stat.approxQuantile("l_orderkey", Array(0.0, 0.1), 0.0)
    val Array(pkLo, pkHi) = li.stat.approxQuantile("l_partkey", Array(0.0, 0.1), 0.0)
    val fo = filesTouched("l_orderkey", okLo.toLong, okHi.toLong)
    val fp = filesTouched("l_partkey", pkLo.toLong, pkHi.toLong)
    assert(fo < nFiles, s"orderkey band touched all $nFiles files")
    assert(fp < nFiles, s"partkey band touched all $nFiles files")
  }

  test("compact merges small files without changing data") {
    val dir = tmp("graft-small")
    val out = tmp("graft-compacted")
    Tables.nation(spark, sf).repartition(8).write.mode("overwrite").parquet(dir)
    Layout.compact(spark, dir, out, nFiles = 1)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 1)
    assert(spark.read.parquet(out).count() === Tables.nation(spark, sf).count())
  }

  test("mergeSchema read unifies files written with evolving schemas") {
    val dir = tmp("graft-evolve")
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", 3.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = Layout.readMergedSchema(spark, dir)
    assert(merged.columns.toSet === Set("id", "name", "score"))
    val rows = merged.orderBy("id")
      .select("id", "score").collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) === 3.5)
  }

  test("orc/csv/json round-trips preserve row counts") {
    for (fmt <- Seq("orc", "json", "csv")) {
      val dir = tmp(s"graft-$fmt")
      Layout.writeAs(Tables.region(spark, sf), fmt, dir)
      assert(Layout.readAs(spark, fmt, dir).count() ===
        Tables.region(spark, sf).count(), s"format $fmt")
    }
  }

  test("runtime bloom filter prunes a shuffled fact join on a selective dim") {
    // Spark 4's InjectRuntimeFilter: when a shuffle join's build side
    // carries a selective filter, a bloom filter of its join keys is
    // pushed into the probe-side scan — at 100 TB this is what keeps
    // a fact-dim join from shuffling fact rows that can never match.
    // Thresholds are production defaults (10MB creation side / 10GB
    // probe side); only the probe-side size gate is lowered to make
    // the toy-scale fact eligible.
    val c = spark.conf
    val savedBroadcast = c.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val savedScan = c.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val dim = Tables.part(spark, sf).where(col("p_size") === 1)
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter on the fact side:\n${plan.take(2000)}")
      // the filter is a pure optimization — row count must equal the
      // unfiltered broadcast-join result
      val n = joined.count()
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        savedScan)
      assert(fact.join(dim, col("l_partkey") === col("p_partkey")).count() === n)
    } finally {
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        savedScan)
    }
  }

  test("salted join equals the plain join") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders,
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        keys = Seq("o_custkey"), nSalts = 8,
        bigUniqueCols = Seq("o_orderkey"))
      .select("o_orderkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join beats unsalted wall-time on a 50%-hot key (exact)") {
    // deliberate heavy tail at sf0.1: half of lineitem lands on one
    // key; the other half spreads over 1000 keys. AQE + broadcast are
    // disabled so both plans are shuffled joins — the scenario
    // salting exists for (small side too big to broadcast, engine
    // without runtime skew splitting).
    val sf01 = "/root/testdata/sf0.1"
    val li = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        when(col("l_orderkey") % 2 === 0, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(1000L))).as("k"))
    // 16 small rows per key: the hot key's single unsalted reducer
    // must produce 16 × |hot rows| join outputs — the skew cost that
    // dominates at scale, amplified enough to measure at sf0.1
    val small = spark.range(0, 1000)
      .select(col("id").as("k"),
        explode(sequence(lit(0L), lit(15L))).as("j"))
      .select(col("k"), (col("k") * 16 + col("j")).as("w"))
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = li.join(small, Seq("k"))
      val salted = Skew.saltedJoin(li, small, Seq("k"), nSalts = 16,
        bigUniqueCols = Seq("l_orderkey", "l_linenumber"))
      def fingerprint(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)), sum(col("w")),
          sum(col("l_extendedprice").cast("decimal(18,2)"))).collect()(0)
      def timeMs(df: org.apache.spark.sql.DataFrame): Long = {
        val t0 = System.nanoTime(); fingerprint(df); (System.nanoTime() - t0) / 1000000
      }
      assert(fingerprint(plain) === fingerprint(salted)) // exact (also warmup)
      // min of two timed runs per variant: resilient to background
      // load spikes on a shared box (the signal is the plan, not the
      // scheduler's mood)
      val tPlain = math.min(timeMs(plain), timeMs(plain))
      val tSalted = math.min(timeMs(salted), timeMs(salted))
      info(f"hot-key join: unsalted ${tPlain}ms, salted(16) ${tSalted}ms, " +
        f"ratio ${tSalted.toDouble / tPlain}%.2f")
      assert(tSalted < tPlain,
        s"salting should beat the single-reducer hot key ($tSalted vs $tPlain ms)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("salted LEFT join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, 10), (2L, 10), (3L, 99)).toDF("pk", "k") // k=99 unmatched
    val small = Seq((10, "dim10")).toDF("k", "name")
    val got = Skew.saltedJoin(big, small, Seq("k"), nSalts = 4,
        bigUniqueCols = Seq("pk"), joinType = "left")
      .select("pk", "name").as[(Long, Option[String])].collect().toSet
    assert(got === Set((1L, Some("dim10")), (2L, Some("dim10")), (3L, None)))
  }

  test("IVF ANN recall vs brute force is high and plumbing is exact") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, k = 5, nCells = 8, nProbe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // k-means-trained centroids plug into the identical plumbing;
    // balanced cells should not hurt recall materially
    val trained = Similarity.kmeansCentroids(e, k = 8, iters = 3)
    val ivfT = Similarity.ivfTopK(e, q, k = 5, nCells = 8, nProbe = 3,
      trainedCentroids = Some(trained))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallT = (bf intersect ivfT).size.toDouble / bf.size
    assert(recallT >= 0.5, s"trained-IVF recall too low: $recallT (default $recall)")
    info(f"IVF recall: lowest-id cells $recall%.2f, k-means cells $recallT%.2f")
  }
}
