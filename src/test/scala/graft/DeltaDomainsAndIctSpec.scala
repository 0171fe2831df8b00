package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Domain metadata actions (PROTOCOL.md §Domain Metadata) and
  * in-commit timestamps (§In-Commit Timestamps) on real Delta logs.
  * In package graft.sources to drive [[DeltaLog.commitCas]] with
  * deterministically stale versions for the conflict legs. */
class DeltaDomainsAndIctSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dmict").toString

  private def headLine(t: String, v: Long): String = {
    val p = java.nio.file.Paths.get(t, "_delta_log", f"$v%020d" + ".json")
    val src = scala.io.Source.fromFile(p.toFile, "UTF-8")
    try src.getLines().next() finally src.close()
  }

  private def ictOf(t: String, v: Long): Option[Long] = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    Option(M.readTree(headLine(t, v)).get("commitInfo"))
      .flatMap(ci => Option(ci.get("inCommitTimestamp")).map(_.asLong()))
  }

  // ---------------- domain metadata ----------------

  test("setDomainMetadata: replay serves latest per domain; remove tombstones it") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setDomainMetadata(spark, t, "app.pipeline", """{"run":1}""")
    DeltaLog.setDomainMetadata(spark, t, "app.other", """{"x":true}""")
    DeltaLog.setDomainMetadata(spark, t, "app.pipeline", """{"run":2}""")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.domains === Map(
      "app.pipeline" -> """{"run":2}""", "app.other" -> """{"x":true}"""))
    // writer feature upgrade landed exactly once
    val (_, mwv, _, wf) = snap.protocol
    assert(mwv === 7 && wf.contains("domainMetadata"))
    DeltaLog.removeDomainMetadata(spark, t, "app.other")
    assert(DeltaLog.snapshot(spark, t).domains.keySet === Set("app.pipeline"))
    // time travel sees the pre-removal domain state
    assert(DeltaLog.snapshot(spark, t, versionAsOf = Some(2L)).domains
      === Map("app.pipeline" -> """{"run":1}""", "app.other" -> """{"x":true}"""))
    // delta.* user domains refuse toward owning DDL
    intercept[IllegalArgumentException] {
      DeltaLog.setDomainMetadata(spark, t, "delta.clustering", "{}")
    }
  }

  test("domain metadata survives checkpoint consolidation; tombstones drop") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setDomainMetadata(spark, t, "app.live", """{"keep":1}""") // v1
    DeltaLog.setDomainMetadata(spark, t, "app.dead", """{"gone":1}""") // v2
    DeltaLog.removeDomainMetadata(spark, t, "app.dead") // v3
    DeltaLog.checkpoint(spark, t, 3L)
    // drop the raw JSON commits the checkpoint covers — replay must
    // come from the consolidated parquet alone
    (0L to 3L).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(t, "_delta_log", f"$v%020d" + ".json"))
    }
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.domains === Map("app.live" -> """{"keep":1}"""))
    assert(snap.files.nonEmpty)
  }

  test("concurrent same-domain writers conflict; disjoint domains rebase") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    // v1 carries the protocol upgrade; the races below happen on an
    // already-featured table so the DOMAIN classification is what fires
    DeltaLog.setDomainMetadata(spark, t, "app.c", """{"v":0}""") // v1
    DeltaLog.setDomainMetadata(spark, t, "app.a", """{"v":1}""") // v2 winner
    // a racing writer staged a commit for v2 touching the SAME domain
    val clash = intercept[DeltaLog.CommitConflictException] {
      DeltaLog.commitCas(spark, t, 2L,
        Seq(DeltaLog.domainMetadataLine("app.a", """{"v":9}""", removed = false)),
        DeltaLog.BlindAppend)
    }
    assert(clash.kind === "ConcurrentDomainMetadata")
    // a DIFFERENT domain is logically disjoint — rebases and lands
    val v = DeltaLog.commitCas(spark, t, 2L,
      Seq(DeltaLog.domainMetadataLine("app.b", """{"v":1}""", removed = false)),
      DeltaLog.BlindAppend)
    assert(v === 3L)
    assert(DeltaLog.snapshot(spark, t).domains.keySet ===
      Set("app.a", "app.b", "app.c"))
  }

  test("legacy checkpoints (no domainMetadata column, narrow add struct) replay") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v1
    DeltaLog.checkpoint(spark, t, 1L)
    val cp = java.nio.file.Paths.get(t, "_delta_log",
      f"${1L}%020d" + ".checkpoint.parquet")
    // rewrite the checkpoint to the shape an OLDER writer produces:
    // no domainMetadata column, add struct without the row-tracking
    // or deletion-vector fields
    val legacy = spark.read.parquet(cp.toString).select(
      col("protocol"), col("metaData"),
      when(col("add").isNotNull, struct(
        col("add.path").as("path"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modificationTime"),
        col("add.dataChange").as("dataChange"),
        col("add.stats").as("stats"))).as("add"),
      col("remove"), col("txn"))
    val stage = Files.createTempDirectory("graft-legacy-cp").toString
    legacy.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.delete(cp)
    java.nio.file.Files.copy(part.toPath, cp)
    // the byte-level swap invalidates LocalFileSystem's sidecar crc
    java.nio.file.Files.deleteIfExists(
      cp.resolveSibling("." + cp.getFileName.toString + ".crc"))
    // drop the covered JSONs — replay must come from the legacy
    // checkpoint alone, through the schema-aligning reader
    (0L to 1L).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(t, "_delta_log", f"$v%020d" + ".json"))
    }
    val got = DeltaLog.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "b")))
    assert(DeltaLog.snapshot(spark, t).domains.isEmpty)
  }

  // ---------------- clustered tables (CLUSTER BY) ----------------

  test("CLUSTER BY declares columns; bare OPTIMIZE applies them; NONE clears") {
    val t = tmp()
    DeltaLog.write(spark,
      (1 to 100).map(i => (i, i % 7, s"s$i")).toDF("id", "k", "s")
        .coalesce(1), t) // v0: ONE file
    val v1 = DeltaLog.setClusterBy(spark, t, Seq("id", "k"))
    assert(v1 === 1L)
    val snap = DeltaLog.snapshot(spark, t)
    assert(DeltaLog.clusteringColumns(snap) === Seq("id", "k"))
    val (_, mwv, _, wf) = snap.protocol
    assert(mwv === 7 && wf.contains("clustering") && wf.contains("domainMetadata"))
    // a bare OPTIMIZE on a clustered table rewrites even the single
    // file (layout maintenance), with rows intact
    val v2 = DeltaLog.optimize(spark, t)
    assert(v2 === 2L)
    assert(DeltaLog.read(spark, t).count() === 100L)
    // CLUSTER BY NONE retires the domain; bare OPTIMIZE is a no-op again
    DeltaLog.setClusterBy(spark, t, Nil)
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, t)).isEmpty)
    val vSame = DeltaLog.optimize(spark, t)
    assert(vSame === DeltaLog.listVersions(spark, t).last)
    // validation: unknown and >4 column lists refuse
    intercept[IllegalArgumentException] {
      DeltaLog.setClusterBy(spark, t, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      DeltaLog.setClusterBy(spark, t, Seq("id", "k", "s", "id", "k"))
    }
  }

  test("CREATE TABLE ... CLUSTER BY + SHOW CREATE round-trip + ALTER CLUSTER BY") {
    val t = Files.createTempDirectory("graft-cluster").toString + "/t"
    spark.sql(s"""CREATE TABLE '$t' (
      |  id BIGINT NOT NULL, k BIGINT, s STRING
      |) USING delta CLUSTER BY (id, k)
      |TBLPROPERTIES ('owner' = 'graft')""".stripMargin).collect()
    val snap = DeltaLog.snapshot(spark, t)
    assert(DeltaLog.clusteringColumns(snap) === Seq("id", "k"))
    val stmt = spark.sql(s"SHOW CREATE TABLE '$t'").head.getString(0)
    assert(stmt.contains("CLUSTER BY (`id`, `k`)"), stmt)
    // the reverse DDL re-parses and recreates an equivalent table
    val t2 = Files.createTempDirectory("graft-cluster").toString + "/t2"
    spark.sql(stmt.replace(s"'$t'", s"'$t2'")).collect()
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, t2))
      === Seq("id", "k"))
    // ALTER re-clusters; Iceberg flavor refuses
    spark.sql(s"ALTER TABLE '$t' CLUSTER BY (k)").collect()
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, t))
      === Seq("k"))
    spark.sql(s"ALTER TABLE '$t' CLUSTER BY NONE").collect()
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, t)).isEmpty)
  }

  // ---------------- in-commit timestamps ----------------

  test("enabling ICT stamps commitInfo.inCommitTimestamp and enablement props") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0 (no ICT)
    assert(ictOf(t, 0L).isEmpty)
    val v = DeltaLog.setTableProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true")) // v1 enablement
    assert(v === 1L)
    assert(ictOf(t, 1L).nonEmpty)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.configuration("delta.inCommitTimestampEnablementVersion") === "1")
    assert(snap.configuration.contains("delta.inCommitTimestampEnablementTimestamp"))
    val (_, mwv, _, wf) = snap.protocol
    assert(mwv === 7 && wf.contains("inCommitTimestamp"))
    // every subsequent commit carries a STRICTLY increasing ICT
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v2
    DeltaLog.write(spark, Seq((3, "c")).toDF("id", "s"), t) // v3
    val icts = Seq(1L, 2L, 3L).map(v => ictOf(t, v).get)
    assert(icts === icts.sorted && icts.distinct === icts,
      s"ICTs not strictly monotonic: $icts")
  }

  test("timestampAsOf resolves by ICT, immune to commit-file mtimes") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true")) // v1
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v2
    DeltaLog.write(spark, Seq((3, "c")).toDF("id", "s"), t) // v3
    val ict2 = ictOf(t, 2L).get
    // scramble every commit file's mtime — a copied/restored log; an
    // mtime-based resolver would now pick garbage
    val logDir = java.nio.file.Paths.get(t, "_delta_log")
    java.nio.file.Files.list(logDir).forEach { p =>
      if (p.toString.endsWith(".json"))
        p.toFile.setLastModified(1000L)
    }
    val snap = DeltaLog.snapshot(spark, t, timestampAsOf = Some(ict2))
    assert(snap.version === 2L)
    val rows = DeltaLog.read(spark, t, timestampAsOf = Some(ict2))
      .as[(Int, String)].collect().toSet
    assert(rows === Set((1, "a"), (2, "b")))
    // history surfaces the recorded ICT, not the scrambled mtime
    val h = DeltaLog.history(spark, t)
      .where(col("version") === 2L).select("timestamp_ms")
      .as[Long].head()
    assert(h === ict2)
  }

  test("ICT chain continues across a rebase-retry commit") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true")) // v1
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v2 winner
    // stale blind append computed v2 before the winner landed; its
    // rebase at v3 must carry an ICT above the winner's
    val stage = Files.createTempDirectory("graft-ict-part").toString
    Seq((9, "z")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = java.nio.file.Paths.get(t, "late.parquet")
    java.nio.file.Files.copy(part.toPath, dst)
    val v = DeltaLog.commitCas(spark, t, 2L,
      Seq(s"""{"add":{"path":"late.parquet","partitionValues":{},"size":${dst.toFile.length()},"modificationTime":1,"dataChange":true}}"""),
      DeltaLog.BlindAppend)
    assert(v === 3L)
    assert(ictOf(t, 3L).get > ictOf(t, 2L).get)
  }
}
