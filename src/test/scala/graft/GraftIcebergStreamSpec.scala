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
}
