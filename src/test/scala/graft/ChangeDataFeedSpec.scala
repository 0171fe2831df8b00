package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLog

/** Protocol-true Delta CHANGE DATA FEED: with
  * `delta.enableChangeDataFeed=true` every DML commit carries `cdc`
  * actions over `_change_data/` parquet files (PROTOCOL.md "Add CDC
  * File"), and [[DeltaLog.changes]] serves those commits from the cdc
  * files EXCLUSIVELY — precise row-level deletes and
  * update_preimage/update_postimage pairs instead of the whole-file
  * remove+add reconstruction. */
class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  private def catalogRoot(tag: String): String = {
    val root = Files.createTempDirectory(s"graft-cdf-$tag").toString
    spark.conf.set(s"spark.sql.catalog.gcdf_$tag", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.gcdf_$tag.root", root)
    root
  }

  private def feed(t: String, from: Long, to: Long): Set[(Long, String, String, Long)] =
    DeltaLog.changes(spark, t, from, to)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet

  test("batch readChangeFeed takes TIME bounds: startingTimestamp inclusive, endingTimestamp inclusive") {
    val t = Files.createTempDirectory("graft-cdf-ts").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1), t) // v0
    Thread.sleep(60)
    val ts = System.currentTimeMillis()
    Thread.sleep(60)
    DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1), t) // v1
    Thread.sleep(60)
    val tEnd = System.currentTimeMillis()
    Thread.sleep(60)
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v").coalesce(1), t) // v2
    def cdf(opts: Map[String, String]): Set[(Long, String)] = {
      var r = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(t).select("k", "v").as[(Long, String)].collect().toSet
    }
    assert(cdf(Map("startingTimestamp" -> ts.toString))
      === Set((2L, "b"), (3L, "c")))
    assert(cdf(Map("startingTimestamp" -> ts.toString,
      "endingTimestamp" -> tEnd.toString)) === Set((2L, "b")))
    // version + timestamp bound together refuse
    intercept[Exception] {
      cdf(Map("startingTimestamp" -> ts.toString, "startingVersion" -> "0"))
    }
  }

  test("SET TBLPROPERTIES enables CDF with the protocol bump; COW delete writes precise cdc rows") {
    val root = catalogRoot("del")
    val t = s"$root/ns/t"
    DeltaLog.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    val out = spark.sql(
      "ALTER TABLE gcdf_del.ns.t SET TBLPROPERTIES " +
        "('delta.enableChangeDataFeed' = 'true')").collect()
    assert(out(0).getLong(1) === 1L)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.configuration.get("delta.enableChangeDataFeed")
      .contains("true"))
    // legacy writer version 4 introduced CDF
    assert(snap.protocol._2 === 4)

    DeltaLog.delete(spark, t, col("k") === 2L) // v2
    // the cdc files exist on disk under _change_data
    val cd = new java.io.File(t, "_change_data")
    assert(cd.isDirectory && cd.listFiles().exists(_.getName.endsWith(".parquet")))
    // PRECISE feed: only the deleted row, never the rewrite's
    // delete+reinsert of the surviving rows
    assert(feed(t, 1L, 2L) === Set((2L, "b", "delete", 2L)))
    // a plain append still reconstructs inserts from the file diff
    DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v").coalesce(1), t) // v3
    assert(feed(t, 2L, 3L) === Set((9L, "z", "insert", 3L)))
    // UNSET drops the property; the next delete reconstructs again
    spark.sql("ALTER TABLE gcdf_del.ns.t UNSET TBLPROPERTIES " +
      "('delta.enableChangeDataFeed')").collect() // v4
    DeltaLog.delete(spark, t, col("k") === 3L) // v5
    assert(feed(t, 4L, 5L) === Set(
      (1L, "a", "delete", 5L), (3L, "c", "delete", 5L),
      (1L, "a", "insert", 5L)))
  }

  test("COW UPDATE and MERGE emit update_preimage/update_postimage/insert legs") {
    val t = Files.createTempDirectory("graft-cdf-upd").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    DeltaLog.update(spark, t, col("k") >= 2L,
      Map("v" -> concat(col("v"), lit("!")))) // v2
    assert(feed(t, 1L, 2L) === Set(
      (2L, "b", "update_preimage", 2L), (2L, "b!", "update_postimage", 2L),
      (3L, "c", "update_preimage", 2L), (3L, "c!", "update_postimage", 2L)))
    // MERGE: one matched key (replaced), one unmatched (inserted)
    DeltaLog.merge(spark, t,
      Seq((3L, "C"), (7L, "g")).toDF("k", "v"), keyCols = Seq("k")) // v3
    assert(feed(t, 2L, 3L) === Set(
      (3L, "c!", "update_preimage", 3L), (3L, "C", "update_postimage", 3L),
      (7L, "g", "insert", 3L)))
    // the current rows are what the post-DML table should hold
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b!"), (3L, "C"), (7L, "g")))
  }

  test("DV arm under CDF: cdc rows serve the feed, no file-granular fallback") {
    val t = Files.createTempDirectory("graft-cdf-dv").toString + "/t"
    DeltaLog.write(spark, (1L to 20L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      DeltaLog.delete(spark, t, col("k") > 18L) // v2: DV sidecar commit
      DeltaLog.update(spark, t, col("k") === 1L,
        Map("v" -> lit("ONE"))) // v3: DV update
    } finally spark.conf.unset("spark.graft.dv.enabled")
    // the DV commit re-adds the same path — with CDF the feed comes
    // from the cdc files, not the row-diff replay
    assert(feed(t, 1L, 2L) === Set(
      (19L, "r19", "delete", 2L), (20L, "r20", "delete", 2L)))
    assert(feed(t, 2L, 3L) === Set(
      (1L, "r1", "update_preimage", 3L), (1L, "ONE", "update_postimage", 3L)))
    assert(DeltaLog.read(spark, t).where(col("k") === 1L)
      .select("v").as[String].collect().toSeq === Seq("ONE"))
  }

  test("mixed polled range: a cdc-LESS DV commit and cdc commits — cdc versions serve from _change_data exclusively") {
    val t = Files.createTempDirectory("graft-cdf-mix").toString + "/t"
    DeltaLog.write(spark, (1L to 20L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), t)                              // v0
    spark.conf.set("spark.graft.dv.enabled", "true")
    try DeltaLog.delete(spark, t, col("k") === 5L) // v1: DV, CDF OFF → no cdc
    finally spark.conf.unset("spark.graft.dv.enabled")
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true")) // v2: config-only metaData
    DeltaLog.update(spark, t, col("k") === 1L,
      Map("v" -> lit("ONE")))                      // v3: COW rewrite + cdc
    // the range mixes a cdc-less DV commit (row-diff replay) with a
    // cdc-bearing commit — the latter must serve from its cdc files
    // EXCLUSIVELY (precise pre/post images), never reconstructed as
    // whole-file delete+insert legs of the rewritten file
    val all = feed(t, 0L, 3L)
    assert(all.filter(_._4 == 1L) === Set((5L, "r5", "delete", 1L)))
    assert(all.filter(_._4 == 3L) === Set(
      (1L, "r1", "update_preimage", 3L), (1L, "ONE", "update_postimage", 3L)))
    assert(!all.exists(_._4 == 2L)) // the config commit changes no rows
  }

  test("DV protocol upgrade from a legacy protocol enumerates the implied features") {
    val t = Files.createTempDirectory("graft-dv-proto").toString + "/t"
    DeltaLog.write(spark, (1L to 9L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), t) // legacy (1,2)
    assert(DeltaLog.snapshot(spark, t).protocol._1 === 1)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try DeltaLog.delete(spark, t, col("k") === 2L)
    finally spark.conf.unset("spark.graft.dv.enabled")
    val (mrv, mwv, _, wf) = DeltaLog.snapshot(spark, t).protocol
    assert((mrv, mwv) === ((3, 7)))
    // (1,2) implied appendOnly + invariants — they must ride along or
    // a spec-compliant writer would stop honoring them
    assert(Set("appendOnly", "invariants", "deletionVectors")
      .subsetOf(wf.toSet), wf.toString)
    assert(!wf.contains("checkConstraints")) // writer 3+ only
  }

  test("vacuum reclaims change-data files past the retention horizon") {
    val t = Files.createTempDirectory("graft-cdf-vac").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))                 // v1
    DeltaLog.delete(spark, t, col("k") === 1L)                     // v2: cdc
    DeltaLog.write(spark, Seq((4L, "d")).toDF("k", "v").coalesce(1), t) // v3
    DeltaLog.delete(spark, t, col("k") === 2L)                     // v4: cdc
    def cdcFiles = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) walk(f)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil)
      walk(new java.io.File(t, "_change_data"))
    }
    assert(cdcFiles.size === 2)
    // dry run lists the aged cdc file but deletes nothing
    val dry = DeltaLog.vacuum(spark, t, keepVersions = 2, dryRun = true)
    assert(dry.exists(_.startsWith("_change_data/")), dry)
    assert(cdcFiles.size === 2)
    // real vacuum: v2's cdc file is reclaimed, v4's survives and its
    // feed still reads
    DeltaLog.vacuum(spark, t, keepVersions = 2)
    assert(cdcFiles.size === 1)
    assert(feed(t, 3L, 4L) === Set((2L, "b", "delete", 4L)))
  }

  test("partitioned table: cdc files live in hive dirs, partition values re-attach") {
    val t = Files.createTempDirectory("graft-cdf-part").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "x", "p1"), (2L, "y", "p1"), (3L, "z", "p2"))
        .toDF("k", "v", "p"), t, partitionBy = Seq("p"))
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    DeltaLog.delete(spark, t, col("k") === 2L) // v2
    val rows = DeltaLog.changes(spark, t, 1L, 2L)
      .select("k", "v", "p", "_change_type")
      .as[(Long, String, String, String)].collect().toSet
    assert(rows === Set((2L, "y", "p1", "delete")))
    // the cdc file sits under a hive partition dir of _change_data
    val pdir = new java.io.File(s"$t/_change_data/p=p1")
    assert(pdir.isDirectory &&
      pdir.listFiles().exists(_.getName.endsWith(".parquet")))
  }
}
