package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Versioned-table layer: commit protocol, time travel, MERGE,
  * OPTIMIZE, VACUUM — the reference's Delta surface re-expressed
  * over plain parquet. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft-vt").toString + "/t"

  test("write/read round trip, append semantics, version counter") {
    val t = tbl()
    assert(VersionedTable.currentVersion(spark, t) === 0)
    val v1 = VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    assert(v1 === 1)
    val v2 = VersionedTable.write(Seq((3L, "c")).toDF("id", "s"), t) // append
    assert(v2 === 2)
    assert(VersionedTable.read(spark, t).count() === 3)
    val v3 = VersionedTable.write(Seq((9L, "z")).toDF("id", "s"), t,
      overwrite = true)
    assert(v3 === 3)
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect().toSet
      === Set((9L, "z")))
  }

  test("time travel reads any committed version; history lists them") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), t)
    assert(VersionedTable.readVersion(spark, t, 1).count() === 1)
    assert(VersionedTable.readVersion(spark, t, 2).count() === 2)
    val hist = VersionedTable.history(spark, t).orderBy("version").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(hist.forall(_.getLong(2) > 0))
  }

  test("shallow clone copies zero data and evolves independently") {
    val src = tbl(); val dst = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), src)
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), src)
    val v = VersionedTable.cloneShallow(spark, src, dst)
    assert(v === 1)
    // content equality at clone time
    assert(VersionedTable.read(spark, dst).as[(Long, String)].collect().toSet
      === VersionedTable.read(spark, src).as[(Long, String)].collect().toSet)
    // metadata only: no parquet landed under dst (just the commit file
    // and pointer cache)
    val dstFiles = new java.io.File(dst).listFiles().map(_.getName).toSet
    assert(!dstFiles.exists(_.startsWith("_v")), s"clone materialized: $dstFiles")
    // the clone pinned ONE source version: later writes to src are
    // invisible to dst...
    VersionedTable.write(Seq((3L, "c")).toDF("id", "s"), src)
    assert(VersionedTable.read(spark, dst).count() === 2)
    // ...and dst's own append materializes a snapshot without
    // touching src
    VersionedTable.write(Seq((9L, "z")).toDF("id", "s"), dst)
    assert(VersionedTable.read(spark, dst).count() === 3)
    assert(VersionedTable.read(spark, src).count() === 3)
    assert(VersionedTable.currentVersion(spark, src) === 3)
    // history resolves the un-materialized clone version through the
    // external reference
    assert(VersionedTable.history(spark, dst).count() === 2)
  }

  test("timestamp time travel resolves the last commit at or before the timestamp") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), t)
    assert(VersionedTable.readAsOfTimestamp(spark, t, between).count() === 1)
    assert(VersionedTable
      .readAsOfTimestamp(spark, t, System.currentTimeMillis()).count() === 2)
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOfTimestamp(spark, t, between - 60000)
    }
  }

  test("merge upserts by key with last-writer-wins, old version intact") {
    val t = tbl()
    VersionedTable.write(
      Seq((1L, "old", 1L), (2L, "keep", 1L)).toDF("id", "s", "ver"), t)
    VersionedTable.merge(
      Seq((1L, "new", 2L), (3L, "ins", 2L)).toDF("id", "s", "ver"),
      t, keys = Seq("id"), versionCol = "ver")
    val now = VersionedTable.read(spark, t)
      .select("id", "s").as[(Long, String)].collect().toSet
    assert(now === Set((1L, "new"), (2L, "keep"), (3L, "ins")))
    // snapshot isolation: version 1 still shows the pre-merge rows
    val before = VersionedTable.readVersion(spark, t, 1)
      .select("id", "s").as[(Long, String)].collect().toSet
    assert(before === Set((1L, "old"), (2L, "keep")))
  }

  test("optimize compacts files as a new version without changing data") {
    val t = tbl()
    VersionedTable.write(
      spark.range(0, 1000).select(col("id"), (col("id") % 7).as("g"))
        .repartition(8), t)
    val filesBefore = VersionedTable.history(spark, t)
      .orderBy(col("version").desc).head().getLong(1)
    assert(filesBefore > 1)
    VersionedTable.optimize(spark, t, nFiles = 1, clusterCols = Seq("id"))
    val latest = VersionedTable.history(spark, t)
      .orderBy(col("version").desc).head()
    assert(latest.getLong(1) === 1) // one file now
    assert(VersionedTable.read(spark, t).count() === 1000)
    assert(VersionedTable.read(spark, t).agg(sum("id")).head().getLong(0)
      === (0L until 1000L).sum)
  }

  test("vacuum drops old snapshots but keeps the retained window") {
    val t = tbl()
    (1 to 4).foreach(i => VersionedTable.write(Seq((i.toLong, "x")).toDF("id", "s"), t))
    VersionedTable.vacuum(spark, t, keepVersions = 2)
    // versions 3 and 4 remain readable; 1 and 2 are gone
    assert(VersionedTable.readVersion(spark, t, 4).count() === 4)
    assert(VersionedTable.readVersion(spark, t, 3).count() === 3)
    assert(VersionedTable.history(spark, t).select("version")
      .as[Long].collect().toSet === Set(3L, 4L))
  }

  test("streaming merge commits versions through the pointer protocol") {
    val t = tbl()
    val src = Files.createTempDirectory("graft-vt-src").toString
    val ckpt = Files.createTempDirectory("graft-vt-ckpt").toString
    VersionedTable.write(
      Seq((1L, "old", 1L), (2L, "keep", 1L)).toDF("id", "s", "ver"), t)
    val updates = Seq((1L, "new", 2L), (3L, "ins", 2L)).toDF("id", "s", "ver")
    updates.write.mode("overwrite").parquet(src)
    graft.streaming.Streams.runVersionedMergeOnce(
      spark.readStream.schema(updates.schema).parquet(src),
      keys = Seq("id"), versionCol = "ver", table = t, checkpoint = ckpt)
    assert(VersionedTable.read(spark, t)
      .select("id", "s").as[(Long, String)].collect().toSet
      === Set((1L, "new"), (2L, "keep"), (3L, "ins")))
    // pre-merge snapshot still readable (snapshot isolation)
    assert(VersionedTable.readVersion(spark, t, 1).count() === 2)
  }

  test("streaming incremental aggregation accumulates across micro-batches") {
    val t = tbl()
    val src = Files.createTempDirectory("graft-vt-agg").toString
    val ckpt = Files.createTempDirectory("graft-vt-aggck").toString
    // two source files + maxFilesPerTrigger=1 => two micro-batches
    Seq((1L, 2L), (2L, 5L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq((1L, 3L), (3L, 7L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/f2")
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    graft.streaming.Streams.runIncrementalAggOnce(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*"),
      keys = Seq("k"), sumCols = Seq("v"), table = t, checkpoint = ckpt)
    val got = VersionedTable.read(spark, t)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 5L), (2L, 5L), (3L, 7L)))
    assert(VersionedTable.currentVersion(spark, t) === 2) // one commit per batch
  }

  test("tagged additive merge is a no-op when the batch was already applied") {
    val t = tbl()
    val b0 = Seq((1L, 2L), (2L, 5L)).toDF("k", "v")
    VersionedTable.mergeAggregate(b0, t, Seq("k"), Seq("v"),
      commitTag = Some("batch-0"))
    // replay of batch-0 (foreachBatch at-least-once): totals unchanged
    val vAfterReplay = VersionedTable.mergeAggregate(b0, t, Seq("k"), Seq("v"),
      commitTag = Some("batch-0"))
    assert(vAfterReplay === 1)
    assert(VersionedTable.read(spark, t).as[(Long, Long)].collect().toSet
      === Set((1L, 2L), (2L, 5L)))
    // the NEXT batch applies normally
    VersionedTable.mergeAggregate(Seq((1L, 3L)).toDF("k", "v"), t,
      Seq("k"), Seq("v"), commitTag = Some("batch-1"))
    assert(VersionedTable.read(spark, t).as[(Long, Long)].collect().toSet
      === Set((1L, 5L), (2L, 5L)))
  }

  test("replay guard survives an interleaved untagged commit") {
    val t = tbl()
    VersionedTable.mergeAggregate(Seq((1L, 2L)).toDF("k", "v"), t,
      Seq("k"), Seq("v"), commitTag = Some("batch-0"))
    // an operator runs optimize between the crash and the replay:
    // the tag must still be found in the retained history
    VersionedTable.optimize(spark, t, nFiles = 1)
    VersionedTable.mergeAggregate(Seq((1L, 2L)).toDF("k", "v"), t,
      Seq("k"), Seq("v"), commitTag = Some("batch-0")) // replay: no-op
    assert(VersionedTable.read(spark, t).as[(Long, Long)].collect().toSet
      === Set((1L, 2L)))
  }

  test("CAS: exactly one of two claims on the same version wins") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$t/_stage_A")
    Seq((1L, "a"), (3L, "c")).toDF("id", "s").write.parquet(s"$t/_stage_B")
    val winA = VersionedTable.tryCommit(spark, t, 2L, "_stage_A", None)
    val winB = VersionedTable.tryCommit(spark, t, 2L, "_stage_B", None)
    assert(winA && !winB, "create-exclusive must admit exactly one claim")
    assert(VersionedTable.currentVersion(spark, t) === 2)
    assert(VersionedTable.read(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 2L))
  }

  test("two concurrent committers: no lost update, linear history") {
    val t = tbl()
    VersionedTable.write(Seq((0L, "base")).toDF("id", "s"), t)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val futures = (1 to 2).map { w =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          latch.await()
          (0 until 3).map { i =>
            VersionedTable.write(Seq((w * 100L + i, s"w$w-$i")).toDF("id", "s"), t)
          }.max
        }
      })
    }
    latch.countDown()
    val maxV = futures.map(_.get()).max
    pool.shutdown()
    // 1 base + 6 appends = 7 linear versions, every append retained
    assert(maxV === 7)
    assert(VersionedTable.currentVersion(spark, t) === 7)
    assert(VersionedTable.read(spark, t).select("id").as[Long].collect().toSet
      === Set(0L, 100L, 101L, 102L, 200L, 201L, 202L))
    // linearity: version v is exactly v appends deep
    (1L to 7L).foreach(v =>
      assert(VersionedTable.readVersion(spark, t, v).count() === v))
  }

  test("a claimed-but-unfinished commit is completed by the next reader") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    // simulate a winner that crashed right after the CAS: stage and
    // commit file exist, rename/pointer never happened
    VersionedTable.read(spark, t).unionByName(Seq((2L, "b")).toDF("id", "s"))
      .write.parquet(s"$t/_stage_crashsim")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$t/_c00000002"),
      "_stage_crashsim\n".getBytes("UTF-8"))
    // any reader finishes the job and sees the committed rows
    assert(VersionedTable.currentVersion(spark, t) === 2)
    assert(VersionedTable.read(spark, t).count() === 2)
    // and the next writer builds on top of it — the crashed writer's
    // rows are not lost under the newcomer's append
    VersionedTable.write(Seq((3L, "c")).toDF("id", "s"), t)
    assert(VersionedTable.read(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }

  test("a lost pointer falls back to the highest COMMITTED snapshot") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), t)
    // crashed writer orphan: version dir WITHOUT a commit marker
    val orphan = new java.io.File(t, "_v00000003")
    orphan.mkdirs()
    new java.io.File(orphan, "part-garbage.parquet").createNewFile()
    // simulate a committer mid-swap on a strict-rename store (pointer
    // transiently absent): readers must resolve the marked version 2,
    // never the unmarked orphan 3
    new java.io.File(t, "_LATEST").delete()
    assert(VersionedTable.currentVersion(spark, t) === 2)
    assert(VersionedTable.read(spark, t).count() === 2)
  }

  test("a torn pointer swap never exposes a partial version") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    // simulate a crashed writer: a half-written _vN dir with NO
    // pointer update — readers must keep resolving version 1
    val orphan = new java.io.File(t, "_v00000002")
    orphan.mkdirs()
    new java.io.File(orphan, "part-garbage.parquet").createNewFile()
    assert(VersionedTable.currentVersion(spark, t) === 1)
    assert(VersionedTable.read(spark, t).count() === 1)
    // the next commit claims version 2 and overwrites the orphan
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), t)
    assert(VersionedTable.read(spark, t).count() === 2)
  }

  test("data skipping: pruned read opens only files whose range matches") {
    val t = tbl()
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).as("k"))
    VersionedTable.write(df, t)
    // cluster by id into 8 files → disjoint min/max ranges, then stats
    val v = VersionedTable.optimize(spark, t, 8, Seq("id"))
    VersionedTable.collectStats(spark, t, v, Seq("id"))
    val pruned = VersionedTable.prunedRead(spark, t, "id", 100, 140)
    val full = VersionedTable.read(spark, t)
      .where(col("id").between(100, 140))
    // correctness: identical result to the unpruned scan+filter
    assert(pruned.select("id").as[Long].collect().sorted.toSeq
      === full.select("id").as[Long].collect().sorted.toSeq)
    // skipping: strictly fewer files opened than the snapshot holds
    val opened = pruned.inputFiles.length
    val total = VersionedTable.read(spark, t).inputFiles.length
    assert(total === 8)
    assert(opened < total, s"expected pruning, opened $opened of $total")
    assert(opened >= 1)
  }

  test("data skipping degrades safely without stats and on string ranges") {
    val t = tbl()
    VersionedTable.write(
      Seq((1L, "apple"), (2L, "mango"), (3L, "zebra")).toDF("id", "s"), t)
    // no collectStats call: every file must be kept, result still right
    val noStats = VersionedTable.prunedRead(spark, t, "id", 2, 3)
    assert(noStats.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    // string-range prune after stats (lexicographic bounds)
    VersionedTable.collectStats(spark, t, 1, Seq("s"))
    val strs = VersionedTable.prunedRead(spark, t, "s", "a", "n")
    assert(strs.select("s").as[String].collect().sorted.toSeq
      === Seq("apple", "mango"))
  }

  test("CDC: changes between versions tags inserts and deletes") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    VersionedTable.merge(Seq((2L, "b2"), (3L, "c")).toDF("id", "s"), t,
      Seq("id"), "s")
    val ch = VersionedTable.changes(spark, t, 1, 2)
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set(
      (2L, "b2", "insert"), (3L, "c", "insert"), (2L, "b", "delete")))
    // from the empty table: everything in v1 is an insert
    val fromEmpty = VersionedTable.changes(spark, t, 0, 1)
      .as[(Long, String, String)].collect().toSet
    assert(fromEmpty === Set((1L, "a", "insert"), (2L, "b", "insert")))
    // identical versions: empty diff
    assert(VersionedTable.changes(spark, t, 2, 2).count() === 0)
  }

  test("syncChanges replicates a table exactly through incremental CDC polls") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "s", "ver"), t)
    VersionedTable.write(Seq((3L, "c", 1L)).toDF("id", "s", "ver"), t)
    // poll 1 from offset 0: carried to v2 with the full content as inserts
    val (v1, d1) = VersionedTable.syncChanges(spark, t, 0L)
    assert(v1 === 2)
    var replica = Set.empty[(Long, String, Long)]
    def applyDelta(df: org.apache.spark.sql.DataFrame): Unit =
      df.as[(Long, String, Long, String)].collect().foreach {
        case (id, s, ver, "insert") => replica += ((id, s, ver))
        case (id, s, ver, "delete") => replica -= ((id, s, ver))
        case other => fail(s"unexpected change row $other")
      }
    applyDelta(d1.get.select(col("id"), col("s"), col("ver"), col("_change_type")))
    assert(replica === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    // no new commits: poll is a cheap no-op at the same offset
    val (v2, d2) = VersionedTable.syncChanges(spark, t, v1)
    assert(v2 === 2 && d2.isEmpty)
    // an upsert produces delete+insert; applying the delta converges
    // the replica to the new snapshot
    VersionedTable.merge(Seq((2L, "B2", 2L)).toDF("id", "s", "ver"), t,
      Seq("id"), "ver")
    val (v3, d3) = VersionedTable.syncChanges(spark, t, v1)
    assert(v3 === 3 && d3.isDefined)
    applyDelta(d3.get.select(col("id"), col("s"), col("ver"), col("_change_type")))
    val want = VersionedTable.read(spark, t).select("id", "s", "ver")
      .as[(Long, String, Long)].collect().toSet
    assert(replica === want)
  }

  test("partition evolution: each version owns its layout, reads stay transparent") {
    val t = tbl()
    val rows = Seq((1L, "en", "s1"), (2L, "de", "s1"), (3L, "en", "s2"))
    VersionedTable.write(rows.toDF("id", "lang", "src"), t) // v1 unpartitioned
    VersionedTable.writeLayout(
      Seq((4L, "fr", "s2")).toDF("id", "lang", "src"), t, Seq("lang")) // v2 by lang
    VersionedTable.writeLayout(
      Seq((5L, "en", "s3")).toDF("id", "lang", "src"), t, Seq("src")) // v3 by src
    def content(v: Long) = VersionedTable.readVersion(spark, t, v)
      .select("id", "lang", "src").as[(Long, String, String)].collect().toSet
    assert(content(1) === rows.toSet)
    assert(content(2) === rows.toSet + ((4L, "fr", "s2")))
    assert(content(3) === rows.toSet + ((4L, "fr", "s2")) + ((5L, "en", "s3")))
    // the physical layouts really differ per version
    def subdirs(v: Long) = new java.io.File(f"$t/_v$v%08d")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs(2).forall(_.startsWith("lang=")) && subdirs(2).nonEmpty)
    assert(subdirs(3).forall(_.startsWith("src=")) && subdirs(3).nonEmpty)
    // and a partition-pruned read on the current layout lists one dir
    val pruned = VersionedTable.readVersion(spark, t, 3)
      .filter(col("src") === "s3")
    assert(pruned.count() === 1)
  }

  test("deleteWhere and updateWhere commit new versions with DML semantics") {
    val t = tbl()
    VersionedTable.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", -5.0)).toDF("id", "s", "x"), t)
    // UPDATE x = x * 2 WHERE x > 0
    VersionedTable.updateWhere(spark, t, col("x") > 0,
      Map("x" -> (col("x") * 2)))
    assert(VersionedTable.read(spark, t).select("id", "x")
      .as[(Long, Double)].collect().toSet
      === Set((1L, 20.0), (2L, 40.0), (3L, -5.0)))
    // DELETE WHERE x < 0
    VersionedTable.deleteWhere(spark, t, col("x") < 0)
    assert(VersionedTable.read(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 2L))
    // snapshot isolation: v1 still holds all three original rows
    assert(VersionedTable.readVersion(spark, t, 1).count() === 3)
    // a NULL predicate row is kept by DELETE and untouched by UPDATE
    val t2 = tbl()
    VersionedTable.write(Seq((1L, Some(1.0)), (2L, None)).toDF("id", "x"), t2)
    VersionedTable.deleteWhere(spark, t2, col("x") > 100)
    assert(VersionedTable.read(spark, t2).count() === 2)
    VersionedTable.updateWhere(spark, t2, col("x") > 0, Map("x" -> lit(9.0)))
    assert(VersionedTable.read(spark, t2).select("id", "x")
      .as[(Long, Option[Double])].collect().toSet
      === Set((1L, Some(9.0)), (2L, None)))
    // unknown column is rejected before anything commits
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, t2, lit(true), Map("nope" -> lit(1)))
    }
  }

  test("writeEvolve appends a frame with new columns, null-filling both sides") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    // strict write refuses the widened schema...
    intercept[org.apache.spark.sql.AnalysisException] {
      VersionedTable.write(Seq((2L, "b", 7.5)).toDF("id", "s", "score"), t)
    }
    // ...writeEvolve accepts it
    VersionedTable.writeEvolve(Seq((2L, "b", 7.5)).toDF("id", "s", "score"), t)
    val rows = VersionedTable.read(spark, t)
      .select("id", "s", "score").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(rows === Set((1L, "a", None), (2L, "b", Some(7.5))))
  }

  test("optimizeZorder rewrites the snapshot Z-clustered; stats prune both columns") {
    val t = tbl()
    val df = spark.range(0, 512).select(col("id"),
      (col("id") % 16).as("a"), ((col("id") / 16) % 16).as("b"))
    VersionedTable.write(df, t)
    val v = VersionedTable.optimizeZorder(spark, t, nFiles = 8, cols = Seq("a", "b"))
    // content unchanged
    assert(VersionedTable.readVersion(spark, t, v).count() === 512)
    VersionedTable.collectStats(spark, t, v, Seq("a", "b"))
    // a selective range on EITHER z-column must open fewer files than
    // the snapshot holds — the multi-column locality zorder gives
    def opened(colName: String): Long =
      VersionedTable.prunedRead(spark, t, colName, 0, 1, version = v)
        .select(input_file_name()).distinct().count()
    assert(opened("a") < 8, "no pruning on a")
    assert(opened("b") < 8, "no pruning on b")
  }

  test("restore re-commits an old version's content as a NEW version") {
    val t = tbl()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), t)
    VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), t) // append → v2
    val v3 = VersionedTable.restore(spark, t, 1)
    assert(v3 === 3)
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a")))
    // history is append-only: the intermediate version is untouched
    assert(VersionedTable.readVersion(spark, t, 2).count() === 2)
    // restoring to the current content is a no-op (no empty commit)
    assert(VersionedTable.restore(spark, t, 3) === 3)
    // a vacuumed source version refuses to restore
    VersionedTable.vacuum(spark, t, keepVersions = 1)
    intercept[IllegalArgumentException] {
      VersionedTable.restore(spark, t, 1)
    }
  }

  test("CHECK constraints reject the whole batch, nothing committed") {
    val t = tbl()
    val checks = Seq(
      VersionedTable.Check("price_positive", col("price") > 0),
      VersionedTable.Check("id_not_null", col("id").isNotNull))
    val v1 = VersionedTable.writeChecked(
      Seq((1L, 10.0), (2L, 5.0)).toDF("id", "price"), t, checks)
    assert(v1 === 1)
    // violating append: nothing commits, version unchanged
    val ex = intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.writeChecked(
        Seq((3L, 7.0), (4L, -1.0)).toDF("id", "price"), t, checks)
    }
    assert(ex.getMessage.contains("price_positive"))
    assert(VersionedTable.currentVersion(spark, t) === 1)
    assert(VersionedTable.read(spark, t).count() === 2)
    // NULL predicate result counts as a violation (strict DQ reading)
    intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.writeChecked(
        Seq((Some(5L), None: Option[Double])).toDF("id", "price"), t, checks)
    }
    // clean append still goes through
    assert(VersionedTable.writeChecked(
      Seq((6L, 1.0)).toDF("id", "price"), t, checks) === 2)
    assert(VersionedTable.read(spark, t).count() === 3)
  }
}
