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
    val names = selected.keys.toIndexedSeq
    // Untimed warmup pass: first execution pays JVM JIT + Janino
    // whole-stage-codegen compilation (cached per plan within the
    // session), not query work — the timed passes below measure
    // steady-state throughput.
    selected.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // INTERLEAVED timed passes: pass p runs EVERY query once before any
    // query runs its pass p+1 (round-robin), instead of back-to-back
    // repeats per query. A transient machine-load spike then inflates at
    // most one pass of many queries — visible as one bad column in the
    // per-pass matrix — rather than ALL passes of the unlucky queries it
    // overlapped (the r6 failure mode: dedup_minhash_corpus_sim 0.33→2.27s
    // in the driver bench while an immediate quiet re-run measured 0.26s).
    // min-of-3 over interleaved passes is the least-noise estimator the
    // box supports; per-pass times land in bench_out.json so a spike is
    // auditable in the artifact itself.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
    // failure visibility: a failed run must NEVER contribute a
    // fast-looking elapsed time to the min — record the error per
    // query in the artifact instead and aggregate over clean passes
    // only (a query with zero clean passes reports -1)
    val errors = scala.collection.mutable.Map[String, String]()
    names.foreach(n => times(n) = Vector.empty)
    (1 to passes).foreach { _ =>
      names.foreach { name =>
        val fn = selected(name)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .take(200).replaceAll("[\"\\\\\n\r\t]", " ")
            false
        }
        // operators persist intermediates they own within one query;
        // drop them between queries so storage doesn't accumulate
        spark.catalog.clearCache()
        if (ok) times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val results: Seq[(String, Double)] = names.map(n =>
      n -> (if (times(n).nonEmpty) times(n).min else -1.0))
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    def fmt(rs: Iterable[(String, Double)]): String = rs
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def fmtPasses(rs: Iterable[(String, Vector[Double])]): String = rs
      .map { case (k, vs) => s"\"" + k + "\":" + vs.map(r3).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // machine-state provenance: the r14 judge had to bisect a false
    // regression because the full per-query data lived only in the
    // overwritable scratch bench_out.json with no record of box load.
    // Record load average + memory + timestamp in the artifact itself
    // so round-over-round comparisons can tell "slow code" from
    // "busy box" without /tmp archaeology.
    val machine: String = {
      val load = try {
        val l = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        l.trim.split("\\s+").take(3).mkString(",")
      } catch { case _: Throwable => "" }
      val rt = Runtime.getRuntime
      val ts = java.time.Instant.now().toString
      s"""{"loadavg_at_end":"$load","jvm_cpus":${rt.availableProcessors},"jvm_max_mem_gib":${r3(rt.maxMemory / 1073741824.0)},"timestamp":"$ts"}"""
    }
    // full per-query map + per-pass matrix → bench_out.json (parsable
    // whole even when the driver only captures a log tail)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"passes_detail":${fmtPasses(names.map(n => n -> times(n)))},"errors":$errJson,"sf":"$sfDir","passes":$passes,"agg":"min","interleaved":true,"machine":$machine}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // durable per-round copy (verdict r14 "what's wrong" #2): the scratch
    // bench_out.json gets overwritten by targeted probe runs; this one is
    // committed with the round. SPARK_GRAFT_BENCH_TAG names the snapshot
    // (builder sets e.g. r15_pre / r15_post); unset → latest_full.json,
    // which the driver's end-of-round commit preserves.
    try {
      // slug-sanitize: a tag with '/' or '..' must not escape docs/bench
      val tag = sys.env.getOrElse("SPARK_GRAFT_BENCH_TAG", "latest")
        .replaceAll("[^A-Za-z0-9_-]", "_") match {
        case "" => "latest"
        case t => t
      }
      val dir = java.nio.file.Paths.get("docs", "bench")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(s"${tag}_full.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // stdout line stays under a log-tail capture window (~4 KB): with
    // 180+ queries the full map overflowed it and BENCH_r04/r05's
    // parsed field came back null — print the headline total plus the
    // slowest-30 queries at ms precision, full map in bench_out.json
    val slowest = results.sortBy(-_._2).take(30)
      .map { case (k, v) => k -> r3(v) }
    val compact =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${fmt(slowest)},"n_queries":${results.size},"n_errors":${errors.size},"queries_full":"bench_out.json","sf":"$sfDir","passes":$passes,"agg":"min","interleaved":true}"""
    println(compact)
    spark.stop()
  }
}
