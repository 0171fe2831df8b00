package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.DeltaLog

/** Expired-log cleanup — the WRITER side of
  * `delta.logRetentionDuration`: commit JSONs / checkpoints /
  * compactions / checksums below the newest checkpoint and past
  * retention are DELETED from disk, the snapshot keeps serving from
  * the checkpoint alone, and time travel into the reaped range
  * refuses loudly. What stops a per-micro-batch streaming sink's
  * `_delta_log` from growing without bound. */
class DeltaLogCleanupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("logcleanup").toString
  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logNames(path: String): Set[String] =
    fs(path).listStatus(new Path(path, "_delta_log")).toSeq
      .map(_.getPath.getName).toSet

  test("cleanup deletes expired commits below the checkpoint; reads survive; reaped time travel refuses") {
    val path = tmp()
    // checkpointInterval=2 → checkpoints at v2 and v4
    (0 until 5).foreach { i =>
      DeltaLog.write(spark, Seq((i.toLong, s"r$i")).toDF("k", "v"), path,
        checkpointInterval = 2)
    }
    assert(logNames(path).contains("00000000000000000004.checkpoint.parquet"))
    // nothing is old enough under the default 30-day retention
    assert(DeltaLog.cleanupLog(spark, path).isEmpty)
    // explicit cutoff in the future: v0..v3 commits + the v2
    // checkpoint fall below the v4 checkpoint and get reaped
    val victims = DeltaLog.cleanupLog(spark, path,
      olderThanMs = Some(System.currentTimeMillis() + 60000))
    assert(victims.contains("00000000000000000000.json"))
    assert(victims.contains("00000000000000000003.json"))
    assert(victims.contains("00000000000000000002.checkpoint.parquet"))
    assert(!victims.contains("00000000000000000004.json"))
    assert(!victims.contains("00000000000000000004.checkpoint.parquet"))
    victims.foreach(n => assert(!logNames(path).contains(n)))

    // the current snapshot serves from the checkpoint + retained tail
    assert(DeltaLog.read(spark, path).count() === 5L)
    // appends keep working after cleanup
    DeltaLog.write(spark, Seq((99L, "new")).toDF("k", "v"), path,
      checkpointInterval = 2)
    assert(DeltaLog.read(spark, path).count() === 6L)
    // time travel into the reaped range refuses loudly
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, path, versionAsOf = Some(1L))
    }
    // …while the checkpointed version itself stays reachable
    assert(DeltaLog.snapshot(spark, path, versionAsOf = Some(4L))
      .files.nonEmpty)
  }

  test("no checkpoint → nothing cleaned; CALL surface reports the count") {
    val path = tmp()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), path,
      checkpointInterval = 100)
    assert(DeltaLog.cleanupLog(spark, path,
      olderThanMs = Some(System.currentTimeMillis() + 60000)).isEmpty)
    // build a checkpointed history, then reap via CALL
    (0 until 4).foreach { i =>
      DeltaLog.write(spark, Seq((i.toLong, "x")).toDF("k", "v"), path,
        checkpointInterval = 2)
    }
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    val n = spark.sql(
      s"CALL graft.system.cleanup_delta_log('$path', '$ts')")
      .collect().head.getString(1).toInt
    assert(n > 0)
    assert(DeltaLog.read(spark, path).count() === 5L)
  }

  test("retention parses Delta duration forms; enableExpiredLogCleanup=false opts out of the auto-run") {
    assert(DeltaLog.parseRetention("interval 30 days") === Some(30L * 86400000L))
    assert(DeltaLog.parseRetention("7 days") === Some(7L * 86400000L))
    assert(DeltaLog.parseRetention("interval 2 weeks") === Some(14L * 86400000L))
    assert(DeltaLog.parseRetention("48 HOURS") === Some(48L * 3600000L))
    assert(DeltaLog.parseRetention("interval 1 millisecond") === Some(1L))
    assert(DeltaLog.parseRetention("whenever") === None)

    // opt-out: a 0ms retention would reap on the next checkpoint —
    // unless delta.enableExpiredLogCleanup=false
    val path = tmp()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), path)
    DeltaLog.setTableProperties(spark, path, Map(
      "delta.logRetentionDuration" -> "interval 1 millisecond",
      "delta.enableExpiredLogCleanup" -> "false"))
    (0 until 4).foreach { i =>
      DeltaLog.write(spark, Seq((i.toLong, "x")).toDF("k", "v"), path,
        checkpointInterval = 2)
    }
    // every commit JSON still on disk
    assert((0 to 5).forall(v =>
      logNames(path).contains(f"$v%020d.json")))

    // flipping the opt-out on: the next checkpointed commit reaps
    DeltaLog.setTableProperties(spark, path, Map(
      "delta.enableExpiredLogCleanup" -> "true"))
    Thread.sleep(5) // let the 1ms retention pass
    (0 until 3).foreach { i =>
      DeltaLog.write(spark, Seq((100L + i, "y")).toDF("k", "v"), path,
        checkpointInterval = 2)
    }
    assert(!logNames(path).contains("00000000000000000000.json"))
    assert(DeltaLog.read(spark, path).count() === 8L)
  }
}
