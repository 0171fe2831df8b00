package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.IcebergTable

/** DSv2 streaming + batch surface over REAL Iceberg tables
  * (`GraftIcebergTable` / format "graft-iceberg") — the streaming
  * twin of GraftDeltaStreamSpec: replica convergence over the CDC
  * stream across snapshots including an overwrite, checkpoint-restart
  * resumption, append-mode semantics with loud overwrite handling,
  * and `replace` (manifest-compaction) snapshots invisible to the
  * stream. */
class GraftIcebergStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CDC readStream converges a replica across three snapshots incl. an overwrite, and survives a checkpoint restart") {
    val dir = tmp("gi-stream")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((9L, "z")).toDF("k", "v"), t,
      overwrite = true)

    val replica = scala.collection.mutable.Map[(Long, String), Int]()
      .withDefaultValue(0)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("readChangeFeed", "true")
        .load(t)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k", "v", "_change_type", "_commit_snapshot_id")
            .as[(Long, String, String, Long)].collect().sortBy(_._4)
            .foreach {
              case (k, v, "insert", _) => replica((k, v)) += 1
              case (k, v, "delete", _) => replica((k, v)) -= 1
              case other => fail(s"unexpected change row $other")
            }
          ()
        }.start()
      q.awaitTermination(120000)
    }
    runOnce()
    def live = replica.filter(_._2 > 0).keySet
    assert(live === Set((9L, "z")))
    assert(live === IcebergTable.read(spark, t).as[(Long, String)]
      .collect().toSet)

    // restart with the SAME checkpoint after two more snapshots: only
    // the new ids replay (a re-applied insert would leave (9, z) at 2)
    IcebergTable.write(spark, Seq((10L, "y")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((11L, "x")).toDF("k", "v"), t)
    runOnce()
    assert(live === Set((9L, "z"), (10L, "y"), (11L, "x")))
    assert(replica((9L, "z")) === 1, "checkpoint restart re-applied old snapshots")
    assert(live === IcebergTable.read(spark, t).as[(Long, String)]
      .collect().toSet)
  }

  test("append-mode readStream.table streams appended snapshots; overwrites are loud unless skipChangeCommits; replace snapshots invisible") {
    val root = tmp("gi-cat")
    spark.conf.set("spark.sql.catalog.graft_i", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_i.root", root)
    val t = s"$root/silver/ev"
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v"), t)

    val seen = scala.collection.mutable.Set[(Long, String)]()
    def run(ckpt: String, skipChangeCommits: Boolean = false): Unit = {
      val reader = spark.readStream
      if (skipChangeCommits) reader.option("skipChangeCommits", "true")
      val q = reader.table("graft_i.silver.ev")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= batch.as[(Long, String)].collect(); ()
        }.start()
      q.awaitTermination(120000)
    }
    val ckpt = tmp("gi-cat-ck")
    run(ckpt)
    assert(seen.toSet === Set((1L, "a"), (2L, "b")))
    // an appended snapshot streams in on the next run
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    run(ckpt)
    assert(seen.toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // a manifest-compaction (replace) snapshot changes no membership
    // and streams NOTHING
    IcebergTable.rewriteManifests(spark, t)
    seen.clear()
    run(ckpt)
    assert(seen.isEmpty, s"replace snapshot leaked rows: $seen")
    // an overwrite is loud in append mode...
    IcebergTable.write(spark, Seq((9L, "z")).toDF("k", "v"), t,
      overwrite = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(ckpt)
    }
    assert(e.getCause.getMessage.contains("skipChangeCommits"),
      e.getCause.getMessage)
    // ...and skipChangeCommits drops the whole overwrite snapshot —
    // its own adds included — but later appends stream (fresh
    // checkpoint: full replay from creation, minus the dropped s5)
    IcebergTable.write(spark, Seq((10L, "y")).toDF("k", "v"), t)
    seen.clear()
    run(tmp("gi-cat-ck2"), skipChangeCommits = true)
    assert(seen.toSet === Set((1L, "a"), (2L, "b"), (3L, "c"), (10L, "y")))
  }

  test("partitioned Iceberg writes: identity spec in metadata, tuples in manifests, columns stay in data files") {
    val dir = tmp("gi-part")
    val t = s"$dir/t"
    val df = Seq((1L, "x", 10), (2L, "x", 20), (3L, "y", 30), (4L, "z", 40))
      .toDF("id", "p", "n")
    IcebergTable.write(spark, df, t, partitionBy = Seq("p"))
    // round trip: partition columns are REAL columns in the files
    assert(IcebergTable.read(spark, t).as[(Long, String, Int)].collect().toSet
      === df.as[(Long, String, Int)].collect().toSet)
    // manifests carry the typed identity tuple per file
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.files.nonEmpty)
    assert(snap.files.forall(_.partitionTuple.keySet === Set("p")))
    assert(snap.files.map(_.partitionTuple("p")).toSet === Set("x", "y", "z"))
    // files land in partition directories
    assert(snap.files.forall(f => f.path.contains("/p=")))
    // the table metadata declares the identity spec
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", "v1.metadata.json")), "UTF-8")
      .replaceAll("\\s", "")
    assert(meta.contains("\"transform\":\"identity\"") &&
      meta.contains("\"name\":\"p\""), meta)
    // append keeps the spec (and ADDS tuples for its own files)
    IcebergTable.write(spark, Seq((5L, "y", 50)).toDF("id", "p", "n"), t,
      partitionBy = Seq("p"))
    assert(IcebergTable.read(spark, t).count() === 5L)
    // append with a different spec refuses loudly
    intercept[IllegalArgumentException] {
      IcebergTable.write(spark, Seq((6L, "q", 60)).toDF("id", "p", "n"), t)
    }
    // manifest-side pruning: exact, metadata-only
    val snap2 = IcebergTable.snapshot(spark, t)
    val pruned = IcebergTable.prunedFiles(spark, snap2, col("p") === "y")
    assert(pruned.nonEmpty && pruned.size < snap2.files.size)
    assert(pruned.forall(_.partitionTuple("p") == "y"))
    // overwrite may redefine the spec under a fresh spec-id
    IcebergTable.write(spark, Seq((7L, "w", 70L)).toDF("id", "p", "m"), t,
      overwrite = true, partitionBy = Seq("m"))
    val snap3 = IcebergTable.snapshot(spark, t)
    assert(snap3.files.forall(_.partitionTuple.keySet === Set("m")))
    assert(snap3.files.head.partitionTuple("m") === 70L)
  }

  test("partition-filtered catalog reads plan strictly fewer files") {
    val root = tmp("gi-prune")
    spark.conf.set("spark.sql.catalog.graft_ip", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ip.root", root)
    val t = s"$root/ns/t"
    IcebergTable.write(spark,
      Seq((1L, "x", 10), (2L, "x", 20), (3L, "y", 30), (4L, "z", 40))
        .toDF("id", "p", "n").repartition(4, col("p")), t,
      partitionBy = Seq("p"))
    assert(IcebergTable.snapshot(spark, t).files.size >= 3)
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // force AQE to settle the final plan
      def files(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          files(a.executedPlan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.length
          }.sum
        case other => other.children.map(files).sum
      }
      files(df.queryExecution.executedPlan)
    }
    val all = plannedFiles(spark.sql("SELECT id FROM graft_ip.ns.t"))
    val one = plannedFiles(
      spark.sql("SELECT id FROM graft_ip.ns.t WHERE p = 'y'"))
    assert(all >= 3, s"expected >=3 files planned unfiltered, got $all")
    assert(one < all && one >= 1,
      s"partition filter did not prune: $one of $all files planned")
    // correct rows through the pruned scan, incl. a data-col conjunct
    assert(spark.sql(
      "SELECT id FROM graft_ip.ns.t WHERE p = 'x' AND n >= 20 ORDER BY id")
      .as[Long].collect().toSeq === Seq(2L))
    // INSERT INTO threads the table's OWN partition spec: the append
    // succeeds and the new file carries its identity tuple
    spark.sql("INSERT INTO graft_ip.ns.t VALUES (5, 'y', 50)")
    assert(spark.sql("SELECT count(*) FROM graft_ip.ns.t WHERE p = 'y'")
      .as[Long].head() === 2L)
    val snapIns = IcebergTable.snapshot(spark, s"$root/ns/t")
    assert(snapIns.files.forall(_.partitionTuple.keySet === Set("p")))
  }

  test("hidden partitioning: day(ts)+bucket writes round-trip, time-range reads prune, foreign transforms read unpruned") {
    import graft.functions.IcebergTransforms
    import scala.collection.JavaConverters._
    // the spec's published hash vectors (Iceberg spec Appendix B)
    assert(IcebergTransforms.hashLong(34L) === 2017239379)
    assert(IcebergTransforms.hashBytes("iceberg".getBytes("UTF-8"))
      === 1210000089)
    assert(IcebergTransforms.hashLong(17486L) === -653330422) // date 2017-11-16
    assert(IcebergTransforms.hashLong(1510871468000000L) === -2047944441)

    val root = tmp("gi-hidden")
    spark.conf.set("spark.sql.catalog.graft_ih", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ih.root", root)
    val t = s"$root/ns/t"
    val day0 = java.time.LocalDate.of(2024, 1, 10).toEpochDay.toInt
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond((day0.toLong + day) * 86400L + h * 3600L))
    val rows = (0 until 40).map(i => (i.toLong, ts(i % 4, i % 12), s"u$i"))
    IcebergTable.write(spark, rows.toDF("id", "ts", "v").coalesce(1), t,
      partitionBy = Seq("days(ts)", "bucket(4, id)"))

    // the spec + manifests carry TRANSFORMED tuples
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.specFields.map(_.canonical)
      === Seq("day(ts)", "bucket(4, id)"))
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.partitionTuple.keySet === Set("ts_day", "id_bucket")))
    val days = snap.files.map(_.partitionTuple("ts_day")).collect {
      case i: Int => i
      case i: Integer => i.intValue()
    }.toSet
    assert(days === (day0 until day0 + 4).toSet)
    // every file's rows hash into its recorded bucket
    assert(snap.files.size > 4) // day × bucket split happened

    // full round trip via the catalog
    assert(spark.sql("SELECT id, ts, v FROM graft_ih.ns.t")
      .as[(Long, java.sql.Timestamp, String)].collect().toSet === rows.toSet)

    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def files(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          files(a.executedPlan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.length
          }.sum
        case other => other.children.map(files).sum
      }
      files(df.queryExecution.executedPlan)
    }
    val all = plannedFiles(spark.sql("SELECT id FROM graft_ih.ns.t"))
    // time-range predicate on the SOURCE column prunes via day(ts)
    val lastTwo = plannedFiles(spark.sql(
      s"SELECT id FROM graft_ih.ns.t WHERE ts >= '${ts(2, 0)}'"))
    assert(lastTwo < all && lastTwo >= 1,
      s"day-transform pruning failed: $lastTwo of $all")
    assert(spark.sql(s"SELECT id FROM graft_ih.ns.t WHERE ts >= '${ts(2, 0)}'")
      .as[Long].collect().toSet === rows.collect {
        case (id, tv, _) if !tv.before(ts(2, 0)) => id }.toSet)
    // bucket equality prunes to the key's bucket
    val oneBucket = plannedFiles(
      spark.sql("SELECT v FROM graft_ih.ns.t WHERE id = 7"))
    assert(oneBucket < all && oneBucket >= 1,
      s"bucket pruning failed: $oneBucket of $all")
    assert(spark.sql("SELECT v FROM graft_ih.ns.t WHERE id = 7")
      .as[String].collect().toSeq === Seq("u7"))

    // INSERT INTO re-derives the hidden spec for the append
    spark.sql(s"INSERT INTO graft_ih.ns.t VALUES (100, TIMESTAMP '${ts(1, 3)}', 'new')")
    val snap2 = IcebergTable.snapshot(spark, t)
    assert(snap2.files.forall(_.partitionTuple.keySet
      === Set("ts_day", "id_bucket")))
    assert(spark.sql("SELECT count(*) FROM graft_ih.ns.t").as[Long].head() === 41L)
    // appends must keep the spec: a different partitionBy refuses
    intercept[IllegalArgumentException] {
      IcebergTable.write(spark, rows.take(1).toDF("id", "ts", "v"), t,
        partitionBy = Seq("days(ts)"))
    }

    // FOREIGN transform: rewrite the metadata's transform name — the
    // reader keeps serving correct rows, just unpruned
    val mdir = java.nio.file.Paths.get(t, "metadata")
    val latest = java.nio.file.Files.list(mdir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val mp = mdir.resolve(latest)
    java.nio.file.Files.writeString(mp,
      java.nio.file.Files.readString(mp)
        .replace("\"transform\" : \"day\"", "\"transform\" : \"zday\"")
        .replace("\"transform\":\"day\"", "\"transform\":\"zday\""))
    // the in-place edit invalidates Hadoop's local checksum sidecar
    java.nio.file.Files.deleteIfExists(mdir.resolve("." + latest + ".crc"))
    val foreignRows = spark.read.format("graft-iceberg").load(t)
      .where(col("ts") >= lit(ts(2, 0))).select("id")
      .as[Long].collect().toSet
    assert(foreignRows === (rows.collect {
      case (id, tv, _) if !tv.before(ts(2, 0)) => id }.toSet))
  }

  test("manifest column bounds: numeric-filtered reads skip files without opening them; compaction keeps the bounds") {
    val dir = tmp("gi-bounds")
    val t = s"$dir/t"
    // three snapshots with disjoint k ranges -> three files whose
    // manifests carry disjoint lower/upper bounds
    def leg(a: Long, b: Long) = spark.range(a, b)
      .select(col("id").as("k"), (col("id") * 2).cast("double").as("x"),
        concat(lit("s"), col("id")).as("s"))
      .coalesce(1)
    IcebergTable.write(spark, leg(0, 100), t)
    IcebergTable.write(spark, leg(100, 200), t)
    IcebergTable.write(spark, leg(200, 300), t)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.files.size === 3)
    // real footer min/max in the manifests, typed
    assert(snap.files.forall(f => f.bounds.contains("k") && f.bounds.contains("x")))
    assert(snap.files.map(_.bounds("k")._1).min === BigDecimal(0))
    assert(snap.files.map(_.bounds("k")._2).max === BigDecimal(299))
    // strings deliberately un-statted (lexicographic bounds are the
    // wrong-skip trap) — never consulted, never skip
    assert(snap.files.forall(f => !f.bounds.contains("s")))
    // pruning: range, equality, double column
    assert(IcebergTable.prunedFiles(spark, snap, col("k") >= 250L).size === 1)
    assert(IcebergTable.prunedFiles(spark, snap, col("k") === 150L).size === 1)
    assert(IcebergTable.prunedFiles(spark, snap, col("x") < 100.0).size === 1)
    // a string predicate keeps everything (no bounds -> no skip)
    assert(IcebergTable.prunedFiles(spark, snap, col("s") === "s5").size === 3)
    // catalog scan plans only the surviving file under a numeric filter
    val root = tmp("gi-bounds-cat")
    spark.conf.set("spark.sql.catalog.graft_ibd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ibd.root", root)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/ns"))
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$root/ns/t"), java.nio.file.Paths.get(t))
    assert(spark.sql("SELECT count(*) FROM graft_ibd.ns.t WHERE k >= 250")
      .as[Long].head() === 50L)
    // compaction (rewriteManifests) carries the bounds forward
    IcebergTable.rewriteManifests(spark, t)
    val snap2 = IcebergTable.snapshot(spark, t)
    assert(snap2.files.forall(_.bounds.contains("k")))
    assert(IcebergTable.prunedFiles(spark, snap2, col("k") >= 250L).size === 1)

    // an all-null column satisfies NO comparison; a valued one keeps
    val t2 = s"$dir/t2"
    IcebergTable.write(spark, spark.range(0, 10)
      .select(col("id").as("k"), lit(null).cast("double").as("x"))
      .coalesce(1), t2)
    IcebergTable.write(spark, spark.range(10, 20)
      .select(col("id").as("k"), (col("id") + 0.5).as("x"))
      .coalesce(1), t2)
    val snapN = IcebergTable.snapshot(spark, t2)
    val kept = IcebergTable.prunedFiles(spark, snapN, col("x") > 0.0)
    assert(kept.size === 1 && kept.head.bounds.contains("x"))
    assert(IcebergTable.read(spark, t2).where(col("x") > 0.0).count() === 10L)
  }

  test("merge-on-read DELETE: position-delete commit, no rewrite; catalog scan applies it; gates hold") {
    val dir = tmp("gi-del")
    val t = s"$dir/t"
    IcebergTable.write(spark, spark.range(0, 50)
      .select(col("id").as("k"), (col("id") % 5).as("g")).coalesce(1), t)
    IcebergTable.write(spark, spark.range(50, 100)
      .select(col("id").as("k"), (col("id") % 5).as("g")).coalesce(1), t)
    val before = IcebergTable.snapshot(spark, t)
    val sid = IcebergTable.delete(spark, t, col("k") === 7L || col("k") === 60L)
    val after = IcebergTable.snapshot(spark, t)
    // same data files, a position-delete file appears
    assert(after.files.map(_.path).toSet === before.files.map(_.path).toSet)
    assert(after.deletes.size === 1 && after.deletes.head.content === 1)
    assert(after.snapshotId === sid)
    // rows gone through the reader; the old snapshot still has them
    assert(IcebergTable.read(spark, t).select("k").as[Long].collect().toSet
      === (0L until 100L).toSet -- Set(7L, 60L))
    assert(IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(before.snapshotId)).count() === 100L)
    // a second delete composes (already-deleted rows never re-match)
    IcebergTable.delete(spark, t, col("k") < 10L)
    assert(IcebergTable.read(spark, t).select("k").as[Long].collect().toSet
      === (10L until 100L).toSet - 60L)
    // no-match delete commits nothing
    val cur = IcebergTable.snapshot(spark, t).snapshotId
    assert(IcebergTable.delete(spark, t, col("k") === 7L) === cur)

    // the DSv2 catalog scan applies position deletes (merge-on-read
    // serving), matching IcebergTable.read — incl. a residual filter
    val root = tmp("gi-del-cat")
    spark.conf.set("spark.sql.catalog.graft_id", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_id.root", root)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/ns"))
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$root/ns/t"), java.nio.file.Paths.get(t))
    assert(spark.sql("SELECT k FROM graft_id.ns.t").as[Long].collect().toSet
      === (10L until 100L).toSet - 60L)
    assert(spark.sql("SELECT count(*) FROM graft_id.ns.t WHERE g = 0")
      .as[Long].head()
      === IcebergTable.read(spark, t).where(col("g") === 0).count())
    // over the cardinality gate: automatic COPY-ON-WRITE fallback —
    // the affected files rewrite in ONE snapshot, no position collect
    spark.conf.set("spark.graft.mor.maxDeleteRows", "3")
    try {
      val before = IcebergTable.snapshot(spark, t)
      val nDeletesBefore = before.deletes.size
      val v = IcebergTable.delete(spark, t, col("k") >= 50L)
      val after = IcebergTable.snapshot(spark, t)
      assert(after.snapshotId === v)
      assert(IcebergTable.read(spark, t).select("k").as[Long].collect().toSet
        === (10L until 50L).toSet)
      // COW, not MOR: no NEW delete file committed (prior ones carry)
      assert(after.deletes.size === nDeletesBefore)
      // rewritten state also serves through the DSv2 catalog scan
      assert(spark.sql("SELECT k FROM graft_id.ns.t").as[Long]
        .collect().toSet === (10L until 50L).toSet)
      // an over-gate UPDATE falls back the same way
      IcebergTable.update(spark, t, col("k") < 20L,
        Map("g" -> org.apache.spark.sql.functions.lit(77L)))
      assert(IcebergTable.read(spark, t).where(col("g") === 77L).count()
        === 10L)
      assert(IcebergTable.read(spark, t).count() === 40L)
    } finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
  }

  test("equality-delete UPSERT: one snapshot, no target scan, strictly-newer scoping; repeated upserts converge") {
    val dir = tmp("gi-ups")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n"), t)
    val s0 = IcebergTable.snapshot(spark, t)
    // upsert: replace k=2, insert k=9 — ONE snapshot
    IcebergTable.upsertEquality(spark, t,
      Seq((2L, "B", 200), (9L, "z", 90)).toDF("k", "v", "n"), Seq("k"))
    val s1 = IcebergTable.snapshot(spark, t)
    assert(IcebergTable.snapshotIds(spark, t).size === 2)
    // an equality delete (content=2) on the key field id + fresh data
    assert(s1.deletes.exists(_.content == 2))
    assert(s1.deletes.filter(_.content == 2)
      .forall(_.equalityIds.map(s1.fieldNames) == Seq("k")))
    assert(IcebergTable.read(spark, t).as[(Long, String, Int)].collect().toSet
      === Set((1L, "a", 10), (2L, "B", 200), (3L, "c", 30), (9L, "z", 90)))
    // STRICTLY-newer scoping: the upsert's own rows survive its delete
    // (asserted by k=2/k=9 being present above); the old snapshot
    // still reads the original rows
    assert(IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(s0.snapshotId)).count() === 3L)
    // a second upsert on the same key converges (last writer wins)
    IcebergTable.upsertEquality(spark, t,
      Seq((2L, "B2", 2000)).toDF("k", "v", "n"), Seq("k"))
    assert(IcebergTable.read(spark, t).where(col("k") === 2L)
      .as[(Long, String, Int)].collect().toSeq === Seq((2L, "B2", 2000)))
    assert(IcebergTable.read(spark, t).count() === 4L)
    // duplicate source keys refuse loudly
    intercept[IllegalArgumentException] {
      IcebergTable.upsertEquality(spark, t,
        Seq((5L, "x", 1), (5L, "y", 2)).toDF("k", "v", "n"), Seq("k"))
    }
    // the catalog scan serves the equality deletes MERGE-ON-READ and
    // matches the library reader byte-for-byte
    val root = tmp("gi-ups-cat")
    spark.conf.set("spark.sql.catalog.graft_iu", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_iu.root", root)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/ns"))
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$root/ns/t"), java.nio.file.Paths.get(t))
    assert(spark.sql("SELECT * FROM graft_iu.ns.t")
      .as[(Long, String, Int)].collect().sorted ===
      IcebergTable.read(spark, t).as[(Long, String, Int)].collect().sorted)
    // column pruning past the equality columns still matches (the
    // scan reads `k` for matching and projects it away)
    assert(spark.sql("SELECT n FROM graft_iu.ns.t").as[Int].collect().sorted
      === IcebergTable.read(spark, t).select("n").as[Int].collect().sorted)
  }

  test("catalog batch scan: rows, VERSION AS OF, statistics, and the delete-file gate") {
    val root = tmp("gi-batch")
    spark.conf.set("spark.sql.catalog.graft_ib", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ib.root", root)
    val t = s"$root/ns/t"
    val s1 = IcebergTable.write(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    assert(spark.sql("SELECT k, v FROM graft_ib.ns.t").as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // VERSION AS OF carries the snapshot id
    assert(spark.sql(s"SELECT k FROM graft_ib.ns.t VERSION AS OF $s1")
      .as[Long].collect().toSet === Set(1L, 2L))
    // real manifest statistics serve the scan (broadcastable dims)
    val stats = spark.table("graft_ib.ns.t").queryExecution.optimizedPlan
      .stats
    assert(stats.sizeInBytes > 0 && stats.rowCount.forall(_ == 3))
    // filter pushdown reaches the scan description
    val planStr = spark.sql("SELECT k FROM graft_ib.ns.t WHERE k > 1")
      .queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") && planStr.contains("k"), planStr)
  }

  test("pruning never drops files carried from a NON-default partition spec; bucket codegen is valid Java") {
    import graft.functions.{IcebergBucket, IcebergTransforms}
    import graft.sources.IcebergPartitioning
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // synthetic snapshot: file A written under the DEFAULT bucket[16]
    // spec, file B carried from an older bucket[8] spec that shares
    // the FIELD NAME — its tuple value means something else entirely
    val schema = StructType(Seq(StructField("id", LongType)))
    val b16 = IcebergTransforms.bucketLong(7L, 16)
    val wrong16 = (b16 + 1) % 16 // a bucket A's file does NOT hold
    val snap = IcebergTable.Snapshot("/synthetic", 1L, 0L, schema,
      files = Seq(
        IcebergTable.DataFile("a.parquet", "parquet", 10L, 100L,
          partitionTuple = Map("id_bucket" -> Int.box(wrong16)), specId = 1),
        IcebergTable.DataFile("b.parquet", "parquet", 10L, 100L,
          partitionTuple = Map("id_bucket" ->
            Int.box(IcebergTransforms.bucketLong(7L, 8))), specId = 0)),
      fieldNames = Map(1 -> "id"),
      specFields = Seq(IcebergPartitioning.PartField(
        "id_bucket", "bucket[16]", "id", 16)),
      defaultSpecId = 1)
    val pruned = IcebergTable.prunedFiles(spark, snap, col("id") === 7L)
    // A prunes (its bucket16 tuple mismatches); B MUST keep — its
    // old-spec tuple would wrong-prune if read as bucket16
    assert(pruned.map(_.path) === Seq("b.parquet"), pruned.map(_.path))

    // the bucket expression generates VALID Java (codegen fallback
    // off: a Janino failure would error instead of silently dropping
    // the stage to interpreted execution)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val b = spark.range(0, 1000).select(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(IcebergBucket(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("id")),
          16)).as("b"))
      assert(b.distinct().count() === 16L)
      assert(b.where(col("b") === IcebergTransforms.bucketLong(7L, 16))
        .count() >= 1L)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("partitioned MOR DML: DELETE/UPDATE/upsert on hidden-partitioned tables — global delete manifests, partition-staged appends") {
    import scala.collection.JavaConverters._
    val root = tmp("gi-pmor")
    spark.conf.set("spark.sql.catalog.graft_pm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pm.root", root)
    val t = s"$root/ns/t"
    val day0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay.toInt
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond((day0.toLong + day) * 86400L + 7200L))
    val rows = (0L until 20L).map(i => (i, ts((i % 4).toInt), s"v$i"))
    IcebergTable.write(spark, rows.toDF("id", "ts", "v").coalesce(1), t,
      partitionBy = Seq("days(ts)"))

    // merge-on-read DELETE: no rewrite, a GLOBAL (unpartitioned-spec)
    // delete manifest appears and an unpartitioned spec registers
    IcebergTable.delete(spark, t, col("id") < 5L)
    val s1 = IcebergTable.snapshot(spark, t)
    assert(s1.deletes.nonEmpty)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Files.list(java.nio.file.Paths.get(t, "metadata"))
        .iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
        .maxBy(_.getFileName.toString.stripPrefix("v")
          .stripSuffix(".metadata.json").toInt)), "UTF-8")
      .replaceAll("\\s", "")
    assert(meta.contains("\"fields\":[]"), "no unpartitioned spec registered")
    assert(IcebergTable.read(spark, t).count() === 15L)

    // UPDATE: the post-image stages under the partition layout and
    // its manifest carries the transformed tuple
    IcebergTable.update(spark, t, col("id") === 7L,
      Map("v" -> org.apache.spark.sql.functions.lit("UPD")))
    val s2 = IcebergTable.snapshot(spark, t)
    val updFiles = s2.files.filter(_.path.contains("-upd-"))
    assert(updFiles.nonEmpty &&
      updFiles.forall(_.partitionTuple.keySet === Set("ts_day")))
    assert(IcebergTable.read(spark, t).where(col("id") === 7L)
      .select("v").as[String].head() === "UPD")

    // equality upsert on the partitioned table
    IcebergTable.upsertEquality(spark, t,
      Seq((10L, ts(1), "TEN"), (100L, ts(2), "NEW"))
        .toDF("id", "ts", "v"), Seq("id"))
    val expected = rows.collect {
      case (i, tv, v) if i >= 5 =>
        (i, tv, if (i == 7) "UPD" else v)
    }.filterNot(_._1 == 10L) ++ Seq((10L, ts(1), "TEN"), (100L, ts(2), "NEW"))
    assert(IcebergTable.read(spark, t)
      .as[(Long, java.sql.Timestamp, String)].collect().toSet
      === expected.toSet)
    // the DSv2 catalog scan serves the same state (MOR partitions
    // compose with the hidden-partitioned files)
    assert(spark.sql("SELECT id, v FROM graft_pm.ns.t")
      .as[(Long, String)].collect().toSet
      === expected.map(e => (e._1, e._3)).toSet)
    // transform pruning still composes after DML: a day-range read
    // over the catalog stays correct
    assert(spark.sql(
      s"SELECT count(*) FROM graft_pm.ns.t WHERE ts >= '${ts(2)}'")
      .as[Long].head()
      === expected.count(e => !e._2.before(ts(2))))
  }

  test("Iceberg metadata tables: .files / .snapshots / .history serve from manifests, never a data scan") {
    val root = tmp("gi-meta")
    spark.conf.set("spark.sql.catalog.graft_im", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_im.root", root)
    val t = s"$root/ns/t"
    val s1 = IcebergTable.write(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    IcebergTable.delete(spark, t, col("k") === 1L)
    val snap = IcebergTable.snapshot(spark, t)

    // .files: one row per live DATA file, manifest-recorded facts
    val files = spark.sql("SELECT * FROM graft_im.ns.t.files")
    assert(files.columns.toSeq === Seq("file_path", "record_count",
      "file_size_in_bytes", "sequence_number", "partition"))
    assert(files.count() === snap.files.size.toLong)
    assert(files.select("file_path").as[String].collect().toSet
      === snap.files.map(_.path).toSet)
    assert(files.select("record_count").as[Long].collect().sum === 3L)

    // .snapshots: the snapshots list with operations
    val snaps = spark.sql(
      "SELECT snapshot_id, operation FROM graft_im.ns.t.snapshots ORDER BY snapshot_id")
      .as[(Long, String)].collect()
    assert(snaps.map(_._1).toSeq === IcebergTable.snapshotIds(spark, t))
    assert(snaps.map(_._2).toSeq === Seq("append", "append", "delete"))

    // .history: made-current log — a ROLLBACK adds a history row
    // without adding a snapshot
    val h0 = spark.sql("SELECT count(*) FROM graft_im.ns.t.history")
      .as[Long].head()
    IcebergTable.rollbackTo(spark, t, s1)
    assert(spark.sql("SELECT count(*) FROM graft_im.ns.t.history")
      .as[Long].head() === h0 + 1)
    assert(spark.sql("SELECT count(*) FROM graft_im.ns.t.snapshots")
      .as[Long].head() === snaps.length.toLong)
    // the rollback target was made current TWICE (initially + now)
    assert(spark.sql("SELECT snapshot_id FROM graft_im.ns.t.history")
      .as[Long].collect().count(_ == s1) === 2)

    // .partitions: per-partition rollup (skew/small-file diagnosis) —
    // record/file counts and bytes from the manifests alone
    val parts = spark.sql(
      "SELECT partition, record_count, file_count FROM graft_im.ns.t.partitions")
      .as[(String, Long, Long)].collect()
    assert(parts.map(_._2).sum ===
      spark.sql("SELECT sum(record_count) FROM graft_im.ns.t.files")
        .as[Long].head())
    assert(parts.map(_._3).sum ===
      spark.sql("SELECT count(*) FROM graft_im.ns.t.files").as[Long].head())

    // metadata rows only — the plan is the local metadata relation,
    // no parquet scan
    val plan = spark.sql("SELECT * FROM graft_im.ns.t.files")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-metadata") || !plan.contains("Parquet"), plan)
    // a non-iceberg base or unknown suffix still resolves nothing
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_im.ns.t.nope").collect()
    }
  }

  test("MOR partitions carry delete-FILE refs, not positions; executors decode") {
    val dir = tmp("gi-morplan")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(2), t)
    IcebergTable.delete(spark, t, col("k") < 10L)
    IcebergTable.upsertEquality(spark, t,
      Seq((50L, "FIFTY"), (200L, "NEW")).toDF("k", "v"), Seq("k"))
    def parts() = new graft.sources.GraftIcebergTable(spark, t)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    val mor = parts().collect { case p: graft.sources.IcebergMorPartition => p }
    assert(mor.nonEmpty)
    // original data files: BOTH a position-delete and the (strictly
    // newer) equality-delete file apply; upsert's own files: only no
    // deletes or none (its equality delete is not strictly newer)
    assert(mor.forall(p => p.posDeletes.nonEmpty || p.eqDeletes.nonEmpty))
    assert(mor.exists(p => p.posDeletes.nonEmpty && p.eqDeletes.nonEmpty))
    assert(mor.forall(p => p.eqDeletes.forall(_.cols == Seq("k"))))
    // the partitions reference delete FILES (path + size), and the
    // served rows match the library reader byte-for-byte
    assert(mor.forall(_.posDeletes.forall(_.sizeBytes > 0L)))
    val viaScan = spark.read.format("graft-iceberg").load(t)
      .as[(Long, String)].collect().sorted
    assert(viaScan === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().sorted)
    assert(viaScan.length === 91) // 100 - 10 pos-deleted - k=50 replaced + 2 upserted
  }

  test("graft-iceberg streaming sink: one snapshot per micro-batch, exactly-once across checkpoint loss") {
    val dir = tmp("gi-sink")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/b1.json"),
      """[{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/b2.json"),
      """[{"k": 3, "v": "c"}]""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val t = s"$dir/ice"
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("multiLine", "true")
        .json(s"$dir/in")
        .writeStream.format("graft-iceberg")
        .option("checkpointLocation", ckpt)
        .option("txnAppId", "spec-ice-sink") // stable across ckpt loss
        .trigger(Trigger.AvailableNow())
        .start(t)
      q.awaitTermination(120000)
    }
    run(s"$dir/ckpt")
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    val snaps = IcebergTable.snapshotIds(spark, t)
    assert(snaps.size === 2, "one snapshot per micro-batch")
    assert(IcebergTable.lastCommittedBatch(spark, t, "spec-ice-sink") === 1L)
    // checkpoint LOSS: a fresh checkpoint replays batches 0..1 from
    // scratch — the summary-property watermark makes both no-ops
    run(s"$dir/ckpt2")
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(IcebergTable.snapshotIds(spark, t) === snaps,
      "replayed micro-batches must not commit duplicate snapshots")
    // a genuinely new batch still commits
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/b3.json"),
      """[{"k": 4, "v": "d"}]""")
    run(s"$dir/ckpt2")
    assert(IcebergTable.read(spark, t).count() === 4L)
    assert(IcebergTable.snapshotIds(spark, t).size === 3)
  }

  test("one delete file spanning N data files is READ ONCE per executor (DeleteLoader cache)") {
    val dir = tmp("gi-delcache")
    val t = s"$dir/t"
    // 8 data files; ONE global position-delete file naming all of them
    IcebergTable.write(spark,
      spark.sparkContext.parallelize(
        (0L until 800L).map(k => (k, s"v$k")), 8).toDF("k", "v"), t)
    IcebergTable.delete(spark, t, col("k") % 100L === 0L)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.files.size === 8)
    assert(snap.deletes.size === 1)
    // the manifest records the delete file's file_path bounds
    assert(snap.deletes.head.pathBounds.isDefined)
    // every data file is a MOR partition carrying the SAME delete file
    val parts = new graft.sources.GraftIcebergTable(spark, t)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    val mor = parts.collect { case p: graft.sources.IcebergMorPartition => p }
    assert(mor.length === 8)
    graft.sources.DeleteFileCache.clear()
    graft.sources.DeleteFileCache.fileScans.set(0L)
    val got = spark.read.format("graft-iceberg").load(t)
      .as[(Long, String)].collect().sorted
    assert(got.length === 792)
    assert(got.map(_._1).forall(_ % 100L != 0L))
    // local[*] = one JVM = one "executor": the delete parquet was
    // physically scanned exactly once, not once per data-file partition
    assert(graft.sources.DeleteFileCache.fileScans.get() === 1L,
      s"expected 1 physical delete-file scan, got " +
        s"${graft.sources.DeleteFileCache.fileScans.get()}")
    // a second read over the warm cache scans nothing
    spark.read.format("graft-iceberg").load(t).count()
    assert(graft.sources.DeleteFileCache.fileScans.get() === 1L)
  }

  test("position deletes attach only to data files inside their file_path bounds") {
    val dir = tmp("gi-delscope")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      (0L until 50L).map(k => (k, "a")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark,
      (50L until 100L).map(k => (k, "b")).toDF("k", "v").coalesce(1), t)
    // touches ONLY the first file's rows → its delete file's bounds
    // name only that data file
    IcebergTable.delete(spark, t, col("k") < 10L)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.files.size === 2)
    val touched = snap.files.filter(f => snap.deletes.head.mayReference(f.path))
    assert(touched.size === 1)
    val parts = new graft.sources.GraftIcebergTable(spark, t)
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    val mor = parts.collect { case p: graft.sources.IcebergMorPartition => p }
    // the untouched file plans PLAIN — no delete refs ride along
    assert(mor.length === 1)
    assert(mor.head.dataPath === touched.head.path)
    assert(spark.read.format("graft-iceberg").load(t).count() === 90L)
    assert(IcebergTable.read(spark, t).count() === 90L)
  }

  test("batch readChangeFeed takes TIME bounds: start-timestamp inclusive, end-timestamp inclusive") {
    val dir = tmp("gi-cdfts")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    Thread.sleep(60)
    val ts = System.currentTimeMillis()
    Thread.sleep(60)
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    Thread.sleep(60)
    val tEnd = System.currentTimeMillis()
    Thread.sleep(60)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    def cdf(opts: Map[String, String]): Set[(Long, String)] = {
      var r = spark.read.format("graft-iceberg")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(t).select("k", "v").as[(Long, String)].collect().toSet
    }
    assert(cdf(Map("start-timestamp" -> ts.toString))
      === Set((2L, "b"), (3L, "c")))
    assert(cdf(Map("start-timestamp" -> ts.toString,
      "end-timestamp" -> tEnd.toString)) === Set((2L, "b")))
    intercept[Exception] {
      cdf(Map("start-timestamp" -> ts.toString,
        "startingSnapshotId" -> "1"))
    }
  }

  test("stream-from-timestamp streams only snapshots at or after it; a future timestamp starts from now") {
    val dir = tmp("gi-startts")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    Thread.sleep(60)
    val ts = System.currentTimeMillis()
    Thread.sleep(60)
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    def drain(opts: Map[String, String], ck: String): Set[(Long, String)] = {
      val rows = scala.collection.mutable.Set[(Long, String)]()
      var r = spark.readStream.format("graft-iceberg")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(t).writeStream
        .option("checkpointLocation", s"$dir/$ck")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          rows ++= b.select("k", "v").as[(Long, String)].collect()
          ()
        }.start()
      q.awaitTermination(120000)
      rows.toSet
    }
    assert(drain(Map("stream-from-timestamp" -> ts.toString), "ck1")
      === Set((2L, "b"), (3L, "c")))
    assert(drain(Map("stream-from-timestamp" ->
      (System.currentTimeMillis() + 3600000L).toString), "ck2") === Set.empty)
    intercept[Exception] {
      drain(Map("stream-from-timestamp" -> ts.toString,
        "startingSnapshotId" -> "1"), "ck3")
    }
  }

  test("maxFilesPerTrigger paces catch-up: whole snapshots admitted, at least one per batch") {
    val dir = tmp("gi-admit")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    val rows = scala.collection.mutable.Set[(Long, String)]()
    val batchRows = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "1")
      .load(t)
      .writeStream
      .option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = b.select("k", "v").as[(Long, String)].collect()
        if (c.nonEmpty) { batchRows += c.length; rows ++= c }
        ()
      }.start()
    q.awaitTermination(120000)
    assert(rows === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(batchRows.toSeq === Seq(1, 1, 1),
      s"expected per-snapshot pacing, got $batchRows")
  }

  test("CDC readStream serves ROW-LEVEL legs: v3 DV DELETE and MOR UPDATE stream exactly-once row changes") {
    val dir = tmp("gi-rowcdc")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3) // deletes become DVs

    val replica = scala.collection.mutable.Map[(Long, String), Int]()
      .withDefaultValue(0)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("readChangeFeed", "true")
        .load(t)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k", "v", "_change_type", "_commit_snapshot_id")
            .as[(Long, String, String, Long)].collect().sortBy(_._4)
            .foreach {
              case (k, v, "insert", _) => replica((k, v)) += 1
              case (k, v, "delete", _) => replica((k, v)) -= 1
              case other => fail(s"unexpected change row $other")
            }
          ()
        }.start()
      q.awaitTermination(120000)
    }
    def live = replica.filter(_._2 > 0).keySet
    def assertExactlyOnce(): Unit = replica.foreach { case (kv, n) =>
      assert(n == 0 || n == 1, s"row $kv seen net $n times — not exactly-once")
    }
    runOnce()
    assert(live === (1L to 10L).map(i => (i, s"v$i")).toSet)

    // MOR DELETE (v3 deletion vector) between micro-batches: the
    // stream must surface exactly the two newly-dead rows
    IcebergTable.delete(spark, t, col("k") === 3L || col("k") === 7L)
    assert(IcebergTable.snapshot(spark, t).deletes.exists(_.isDv))
    runOnce()
    assertExactlyOnce()
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)
    assert(!live.exists(_._1 == 3L) && !live.exists(_._1 == 7L))

    // MOR UPDATE composes delete (DV on the old file) + insert (the
    // post-image data file)
    IcebergTable.update(spark, t, col("k") === 5L, Map("v" -> lit("UPD")))
    runOnce()
    assertExactlyOnce()
    assert(live.contains((5L, "UPD")) && !live.contains((5L, "v5")))
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)

    // a SECOND DV delete folds into a total vector — only the newly
    // dead row streams (the fold's carried positions must not replay)
    IcebergTable.delete(spark, t, col("k") === 1L)
    runOnce()
    assertExactlyOnce()
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)
  }

  test("CDC readStream: equality-delete upserts stream exactly-once row changes across checkpointed polls") {
    val dir = tmp("gi-eqcdc")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2), t)
    val replica = scala.collection.mutable.Map[(Long, String), Int]()
      .withDefaultValue(0)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("readChangeFeed", "true")
        .load(t)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k", "v", "_change_type", "_commit_snapshot_id")
            .as[(Long, String, String, Long)].collect().sortBy(_._4)
            .foreach {
              case (k, v, "insert", _) => replica((k, v)) += 1
              case (k, v, "delete", _) => replica((k, v)) -= 1
              case other => fail(s"unexpected change row $other")
            }
          ()
        }.start()
      q.awaitTermination(120000)
    }
    def live = replica.filter(_._2 > 0).keySet
    def assertExactlyOnce(): Unit = replica.foreach { case (kv, n) =>
      assert(n == 0 || n == 1, s"row $kv seen net $n times — not exactly-once")
    }
    runOnce()
    assert(live === (1L to 6L).map(i => (i, s"v$i")).toSet)

    // equality upsert between polls: old image deletes, new inserts
    IcebergTable.upsertEquality(spark, t,
      Seq((2L, "UP"), (9L, "NEW")).toDF("k", "v"), Seq("k"))
    runOnce()
    assertExactlyOnce()
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)
    assert(live.contains((2L, "UP")) && !live.contains((2L, "v2")))

    // stacked upsert on the same key: only the CURRENT image deletes
    IcebergTable.upsertEquality(spark, t,
      Seq((2L, "UP2")).toDF("k", "v"), Seq("k"))
    runOnce()
    assertExactlyOnce()
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)

    // a MOR position delete AFTER equality history composes (the
    // pos-diff leg must not replay equality-dead rows)
    IcebergTable.delete(spark, t, col("k") === 4L)
    runOnce()
    assertExactlyOnce()
    assert(live === IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet)
  }

  test("CDC row-level legs on v2 position-delete parquet; batch CDC range reads them; equality-delete upserts serve row-level") {
    val dir = tmp("gi-rowcdc2")
    val t = s"$dir/t"
    IcebergTable.write(spark,
      (1L to 8L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    val s0 = IcebergTable.snapshot(spark, t).snapshotId
    // v2 table: MOR DELETE writes a position-delete parquet file
    IcebergTable.delete(spark, t, col("k") === 2L)
    val snap1 = IcebergTable.snapshot(spark, t)
    assert(snap1.deletes.nonEmpty && snap1.deletes.forall(!_.isDv))

    // batch CDC over the range serves the row-level delete leg
    val changes = spark.read.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("startingSnapshotId", s0.toString)
      .load(t)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(changes === Set((2L, "v2", "delete")))

    // library parity: the composed changes() frame agrees
    val lib = IcebergTable.changes(spark, t, s0, snap1.snapshotId)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(lib === changes)

    // EQUALITY-delete commits (the Flink-CDC upsert shape) serve
    // row-level through the DSv2 CDC scan too: the matched pre-image
    // row deletes, the upsert's own file inserts whole (its equality
    // delete is NOT strictly newer than its data)
    IcebergTable.upsertEquality(spark, t,
      Seq((4L, "UP")).toDF("k", "v"), Seq("k"))
    val chEq = spark.read.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("startingSnapshotId", snap1.snapshotId.toString)
      .load(t)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(chEq === Set((4L, "v4", "delete"), (4L, "UP", "insert")))
    // library parity again
    val libEq = IcebergTable.changes(spark, t, snap1.snapshotId,
      IcebergTable.snapshot(spark, t).snapshotId)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(libEq === chEq)
    // a SECOND upsert on the same key through the STREAM: only the
    // current image deletes (seq scoping); exactly-once per poll
    val sEq1 = IcebergTable.snapshot(spark, t).snapshotId
    IcebergTable.upsertEquality(spark, t,
      Seq((4L, "UP2"), (2L, "BACK")).toDF("k", "v"), Seq("k"))
    val chEq2 = spark.read.format("graft-iceberg")
      .option("readChangeFeed", "true")
      .option("startingSnapshotId", sEq1.toString)
      .load(t)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    // k=2's pre-image (2,v2) is long position-dead — only live rows
    // match; k=4's CURRENT image (UP) deletes, not v4
    assert(chEq2 === Set((4L, "UP", "delete"),
      (4L, "UP2", "insert"), (2L, "BACK", "insert")))
  }

  test("append-only stream: a row-level DML commit is loud, skipChangeCommits drops it, later pure appends still stream") {
    val dir = tmp("gi-rowcdc3")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    IcebergTable.delete(spark, t, col("k") === 1L) // row-level commit
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1), t)

    // loud without the option
    val ex = intercept[Exception] {
      val q = spark.readStream.format("graft-iceberg").load(t)
        .writeStream.option("checkpointLocation", s"$dir/ck1")
        .trigger(Trigger.AvailableNow())
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    assert(ex.toString.contains("removes rows") ||
      Option(ex.getCause).exists(_.toString.contains("removes rows")),
      s"expected a loud row-level refusal, got $ex")

    // skipChangeCommits drops the DML commit; appends still stream —
    // including the append AFTER the delete (the old pile cannot
    // touch newer files, so it must not gate pure appends)
    val rows = scala.collection.mutable.Set[(Long, String)]()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("skipChangeCommits", "true")
      .load(t)
      .writeStream.option("checkpointLocation", s"$dir/ck2")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows ++= b.select("k", "v").as[(Long, String)].collect(); ()
      }.start()
    q2.awaitTermination(120000)
    assert(rows === Set((1L, "a"), (2L, "b")))
  }

  test("data-file compaction (replace snapshot) inside the polled range emits nothing — batch changes(), CDC stream, and append stream alike") {
    val dir = tmp("gi-rdf")
    val t = s"$dir/t"
    IcebergTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    IcebergTable.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    val s0 = IcebergTable.snapshot(spark, t).snapshotId
    // compaction: file membership changes completely, row content
    // doesn't — Iceberg's changelog scan excludes replace snapshots
    IcebergTable.rewriteDataFiles(spark, t, targetFileBytes = 1L << 30)
    IcebergTable.write(spark, Seq((4L, "d")).toDF("k", "v"), t)
    val sEnd = IcebergTable.snapshot(spark, t).snapshotId
    // batch: only the post-compaction append emits — no delete+insert
    // replay of every compacted-but-unchanged row
    val ch = IcebergTable.changes(spark, t, s0, sEnd)
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(ch === Set((4L, "d", "insert")))
    // CDC stream from creation: each row exactly ONE insert event
    val events = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeFeed", "true").load(t)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        events ++= batch.select("k", "v", "_change_type")
          .as[(Long, String, String)].collect()
        ()
      }.start()
    q.awaitTermination(120000)
    assert(events.sorted === Seq((1L, "a", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert"), (4L, "d", "insert")))
    // append-only stream: the replace snapshot neither errors (it
    // drops files, which a naive overwrite check would reject) nor
    // leaks the compacted file's rows a second time
    val seen = scala.collection.mutable.Set[(Long, String)]()
    val q2 = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.option("checkpointLocation", s"$dir/ckpt2")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.select("k", "v").as[(Long, String)].collect(); ()
      }.start()
    q2.awaitTermination(120000)
    assert(seen === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }
}
