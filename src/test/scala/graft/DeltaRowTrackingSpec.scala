package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Row tracking (PROTOCOL.md §Row Tracking): baseRowId assignment,
  * the rowIdHighWaterMark domain, fresh-id reads, OPTIMIZE
  * preservation through materialized columns, and the concurrent
  * writer re-assignment rebase. */
class DeltaRowTrackingSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-rowtrack").toString

  private def rowIds(t: String): Map[Int, Long] =
    DeltaLog.readWithRowIds(spark, t)
      .select(col("id"), col("_row_id"))
      .as[(Int, Long)].collect().toMap

  test("enablement backfills existing files; ids are 0..N-1 and unique") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 10).map(i => (i, s"s$i")).toDF("id", "s"), t)
    DeltaLog.write(spark, (11 to 25).map(i => (i, s"s$i")).toDF("id", "s"), t)
    val v = DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    assert(v === 2L)
    val snap = DeltaLog.snapshot(spark, t)
    val (_, mwv, _, wf) = snap.protocol
    assert(mwv === 7 && wf.contains("rowTracking") && wf.contains("domainMetadata"))
    assert(DeltaLog.rowIdHighWaterMark(snap) === 24L)
    assert(snap.files.forall(_.baseRowId.nonEmpty))
    val ids = DeltaLog.readWithRowIds(spark, t)
      .select("_row_id").as[Long].collect().sorted
    assert(ids === (0L until 25L).toArray)
  }

  test("appends take fresh disjoint ranges; _row_commit_version records the commit") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 5).map(i => (i, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true")) // v1
    DeltaLog.write(spark, (6 to 8).map(i => (i, "b")).toDF("id", "s"), t) // v2
    DeltaLog.write(spark, (9 to 9).map(i => (i, "c")).toDF("id", "s"), t) // v3
    val rows = DeltaLog.readWithRowIds(spark, t)
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .as[(Int, Long, Long)].collect()
    assert(rows.map(_._2).distinct.length === 9)
    assert(DeltaLog.rowIdHighWaterMark(DeltaLog.snapshot(spark, t)) === 8L)
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert((1 to 5).forall(byId(_) === 1L)) // backfill re-add at v1
    assert((6 to 8).forall(byId(_) === 2L))
    assert(byId(9) === 3L)
  }

  test("OPTIMIZE preserves row ids and commit versions via materialization") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 20).map(i => (i, s"x$i")).toDF("id", "s"), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    DeltaLog.write(spark, (21 to 40).map(i => (i, s"x$i")).toDF("id", "s"), t)
    val before = DeltaLog.readWithRowIds(spark, t)
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .as[(Int, Long, Long)].collect().toSet
    val nFilesBefore = DeltaLog.snapshot(spark, t).files.size
    assert(nFilesBefore > 1)
    DeltaLog.optimize(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.size < nFilesBefore)
    // fresh baseRowIds on the compacted files, but the MATERIALIZED
    // values win — every row keeps its identity
    assert(snap.files.forall(_.baseRowId.nonEmpty))
    val after = DeltaLog.readWithRowIds(spark, t)
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .as[(Int, Long, Long)].collect().toSet
    assert(after === before)
    // plain reads never see the materialized physical columns
    assert(DeltaLog.read(spark, t).columns.toSeq === Seq("id", "s"))
  }

  test("DV delete keeps survivors' row ids; deleted ids vanish") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 30).map(i => (i, s"x$i")).toDF("id", "s"), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    val before = rowIds(t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try DeltaLog.delete(spark, t, col("id") % 10 === 0)
    finally spark.conf.set("spark.graft.dv.enabled", "false")
    val after = rowIds(t)
    assert(after.keySet === before.keySet -- Set(10, 20, 30))
    assert(after.forall { case (id, rid) => before(id) === rid })
  }

  test("COW delete on a row-tracked table: untouched files keep ids, rewrites get fresh unique ones") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 10).map(i => (i, "a")).toDF("id", "s"), t)
    DeltaLog.write(spark, (11 to 20).map(i => (i, "b")).toDF("id", "s"), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    val before = rowIds(t)
    DeltaLog.delete(spark, t, col("id") === 15) // rewrites file 2 only
    val after = rowIds(t)
    assert(after.keySet === before.keySet - 15)
    // rows of the UNTOUCHED file keep their identity
    assert((1 to 10).forall(i => after(i) === before(i)))
    // the rewritten survivors got fresh ids (non-preserved DML), all
    // unique and above nothing stale — watermark advanced
    assert(after.values.toSeq.distinct.length === after.size)
    assert(DeltaLog.rowIdHighWaterMark(DeltaLog.snapshot(spark, t)) >
      before.values.max)
  }

  test("concurrent row-tracked appends both land with disjoint shifted ranges") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 4).map(i => (i, "a")).toDF("id", "s"), t) // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true")) // v1, hwm=3
    // stale writer staged an append against v1's watermark…
    val stage = Files.createTempDirectory("graft-rt-part").toString
    (5 to 7).map(i => (i, "z")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = java.nio.file.Paths.get(t, "late-rt.parquet")
    java.nio.file.Files.copy(part.toPath, dst)
    // …but a winner landed v2 first and took row ids 4..8
    DeltaLog.write(spark, (8 to 12).map(i => (i, "w")).toDF("id", "s"), t)
    assert(DeltaLog.rowIdHighWaterMark(DeltaLog.snapshot(spark, t)) === 8L)
    val v = DeltaLog.commitCas(spark, t, 2L, Seq(
      s"""{"add":{"path":"late-rt.parquet","partitionValues":{},"size":${dst.toFile.length()},"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":3}","baseRowId":4,"defaultRowCommitVersion":2}}""",
      s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":6}","removed":false}}"""),
      DeltaLog.BlindAppend)
    assert(v === 3L)
    val snap = DeltaLog.snapshot(spark, t)
    // the loser's range shifted past the winner's watermark: 9..11
    assert(DeltaLog.rowIdHighWaterMark(snap) === 11L)
    val ids = DeltaLog.readWithRowIds(spark, t)
      .select("_row_id").as[Long].collect().sorted
    assert(ids === (0L until 12L).toArray)
  }

  test("shallow clone carries row ids, the watermark domain, and clustering") {
    val t = tmp()
    DeltaLog.write(spark, (1 to 6).map(i => (i, "a")).toDF("id", "s"), t)
    DeltaLog.setTableProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    val t2 = tmp() + "/clone"
    DeltaLog.cloneShallow(spark, t, t2)
    assert(DeltaLog.rowIdHighWaterMark(DeltaLog.snapshot(spark, t2)) === 5L)
    assert(rowIds(t2) === rowIds(t))
  }
}
