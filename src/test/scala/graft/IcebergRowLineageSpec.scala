package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.IcebergTable

/** Iceberg v3 ROW LINEAGE (spec v3 §Row Lineage): appended rows get
  * implicit ids `first_row_id + position`, the table's `next-row-id`
  * advances per snapshot, UNCHANGED rows keep their `_row_id` across
  * DML snapshots, and rewrite paths that would silently re-key rows
  * refuse. */
class IcebergRowLineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("rowlineage").toString + "/t"

  test("appends claim disjoint contiguous id ranges; _row_id materializes") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 40L).map(i => (i, s"a$i")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // pre-upgrade files have no lineage: _row_id is null for them
    IcebergTable.write(spark,
      (100L until 130L).map(i => (i, s"b$i")).toDF("k", "v")
        .repartition(3), t)
    IcebergTable.write(spark,
      (200L until 210L).map(i => (i, s"c$i")).toDF("k", "v"), t)

    val snap = IcebergTable.snapshot(spark, t)
    val withIds = snap.files.filter(_.firstRowId.isDefined)
    assert(withIds.map(_.records).sum === 40L) // the two post-upgrade appends
    // ranges are disjoint and contiguous overall: 0..39
    val claimed = withIds.sortBy(_.firstRowId.get)
      .flatMap(f => f.firstRowId.get until (f.firstRowId.get + f.records))
    assert(claimed === (0L until 40L))

    val rows = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows.size === 80)
    // pre-upgrade rows: null; post-upgrade rows: unique 0..39
    assert((0L until 40L).forall(k => rows(k).isEmpty))
    val ids = (100L until 130L).flatMap(rows(_)) ++
      (200L until 210L).flatMap(rows(_))
    assert(ids.size === 40 && ids.distinct.size === 40)
    assert(ids.sorted === (0L until 40L))
  }

  test("unchanged rows keep their _row_id across a MOR DELETE; post-images get fresh ids") {
    val t = tmp()
    IcebergTable.write(spark, Seq((0L, "seed")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.write(spark,
      (1L until 31L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)

    val before = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    IcebergTable.delete(spark, t, col("k") % 5L === 0L)
    val after = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // survivors keep their ids; deleted keys are gone
    assert(after.keySet === before.keySet.filter(_ % 5 != 0))
    after.foreach { case (k, id) => assert(id === before(k),
      s"row $k changed _row_id across an unrelated delete") }

    // UPDATE: the post-image rows claim FRESH ids (their file is new)
    IcebergTable.update(spark, t, col("k") === 1L,
      Map("v" -> org.apache.spark.sql.functions.lit("upd")))
    val upd = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(upd(1L) !== after(1L))
    assert(upd(2L) === after(2L)) // untouched row, untouched id
    // snapshots advance next-row-id monotonically
    val snaps = IcebergTable.snapshotIds(spark, t)
    assert(snaps.nonEmpty)
  }

  test("rewrites that would re-key lineage rows refuse loudly") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.write(spark,
      (2L until 20L).map(i => (i, s"v$i")).toDF("k", "v"), t)
    intercept[IllegalArgumentException] {
      IcebergTable.rewriteDataFiles(spark, t)
    }
    // over-gate DML falls toward COW — which must refuse, not re-key
    spark.conf.set("spark.graft.mor.maxDeleteRows", "1")
    try intercept[IllegalArgumentException] {
      IcebergTable.delete(spark, t, col("k") >= 2L)
    } finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
  }
}
