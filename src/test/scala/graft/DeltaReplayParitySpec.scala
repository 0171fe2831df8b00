package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Parity between the DRIVER replay fast path (checkpoint parquet via
  * [[DeltaCheckpointIo]], tail via Jackson) and the DISTRIBUTED replay
  * it replaces under `spark.sql.graft.delta.driverReplayMaxBytes`.
  * The driver path serves every small log now, so these tests keep
  * the distributed path honest (and vice versa): same snapshot state,
  * same change feed, from the same bytes. */
class DeltaReplayParitySpec extends graft.SparkSpec {
  import spark.implicits._

  private val GateKey = "spark.sql.graft.delta.driverReplayMaxBytes"

  private def distributed[A](body: => A): A = {
    spark.conf.set(GateKey, "0")
    try body finally spark.conf.unset(GateKey)
  }

  /** Build the same commit sequence twice (checkpoint at v2 via
    * interval 2, a txn watermark, a remove via overwriting merge). */
  private def build(policyV2: Boolean): String = {
    val t = Files.createTempDirectory("graft-paritycp").toString + "/t"
    DeltaLog.write(spark, (1 to 40).map(i => (i.toLong, s"r$i"))
      .toDF("k", "v"), t, checkpointInterval = 2)
    if (policyV2)
      DeltaLog.setTableProperties(spark, t, Map(
        "delta.checkpointPolicy" -> "v2", "delta.checkpointInterval" -> "2"))
    DeltaLog.write(spark, (41 to 60).map(i => (i.toLong, s"r$i"))
      .toDF("k", "v"), t, checkpointInterval = 2)
    DeltaLog.merge(spark, t, (1 to 10).map(i => (i.toLong, s"m$i"))
      .toDF("k", "v"), Seq("k"), checkpointInterval = 2)
    DeltaLog.write(spark, (61 to 70).map(i => (i.toLong, s"r$i"))
      .toDF("k", "v"), t, checkpointInterval = 2)
    t
  }

  private def structural(s: DeltaLog.Snapshot) =
    (s.version, s.schema, s.partitionColumns,
      s.configuration - "delta.checkpointInterval",
      s.protocol, s.txns, s.domains, s.files.size,
      s.files.map(_.partitionValues).sortBy(_.toString))

  test("checkpointed snapshot: driver replay == distributed replay (classic and v2)") {
    for (v2 <- Seq(false, true)) {
      val tD = build(v2) // replayed via the driver fast path (default)
      val tX = build(v2) // identical build, replayed distributed-only
      val snapD = DeltaLog.snapshot(spark, tD)
      val snapX = distributed { DeltaLog.snapshot(spark, tX) }
      assert(structural(snapD) === structural(snapX),
        s"v2=$v2 structural snapshot mismatch")
      val rowsD = DeltaLog.read(spark, tD).as[(Long, String)].collect().toSet
      val rowsX = DeltaLog.read(spark, tX).as[(Long, String)].collect().toSet
      assert(rowsD === rowsX, s"v2=$v2 row mismatch")
      assert(rowsD.contains((5L, "m5")) && rowsD.contains((70L, "r70")))
      // and the SAME table read both ways agrees too (fresh commit
      // between reads so the segment cache cannot serve either side)
      DeltaLog.write(spark, Seq((99L, "x")).toDF("k", "v"), tD,
        checkpointInterval = 2)
      val a = DeltaLog.read(spark, tD).count()
      DeltaLog.write(spark, Seq((100L, "y")).toDF("k", "v"), tD,
        checkpointInterval = 2)
      val b = distributed { DeltaLog.read(spark, tD).count() }
      assert(b === a + 1)
    }
  }

  test("change feed: driver tail parse == distributed tail parse") {
    val t = Files.createTempDirectory("graft-paritycf").toString + "/t"
    DeltaLog.write(spark, (1 to 20).map(i => (i.toLong, s"a$i"))
      .toDF("k", "v"), t)
    val from = DeltaLog.snapshot(spark, t).version
    DeltaLog.write(spark, (21 to 30).map(i => (i.toLong, s"b$i"))
      .toDF("k", "v"), t)
    DeltaLog.merge(spark, t, Seq((1L, "upd1"), (31L, "new31")).toDF("k", "v"),
      Seq("k")) // remove+add of the hit file + an insert
    val to = DeltaLog.snapshot(spark, t).version
    def feed(): Seq[(Long, String, String, Long)] =
      DeltaLog.changes(spark, t, from, to)
        .select(col("k"), col("v"), col("_change_type"),
          col("_commit_version"))
        .as[(Long, String, String, Long)].collect().toSeq.sorted
    val d = feed()
    val x = distributed { feed() }
    assert(d === x)
    assert(d.exists { case (k, v, ct, _) => k == 31L && ct == "insert" })
    assert(d.exists { case (k, _, ct, _) => k == 1L && ct == "delete" })
  }
}
