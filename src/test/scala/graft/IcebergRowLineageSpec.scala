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

  test("compaction PRESERVES every _row_id by materializing the column (id-preserving rewrite)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // a small-file pile with lineage ids, scarred by a MOR DELETE
    IcebergTable.write(spark,
      (2L until 12L).map(i => (i, s"v$i")).toDF("k", "v").repartition(3), t)
    IcebergTable.write(spark,
      (12L until 20L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2), t)
    IcebergTable.delete(spark, t, col("k") === 5L || col("k") === 15L)

    def ids() = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val before = ids()
    val nextBefore = IcebergTable.nextRowId(spark, t)

    val sid = IcebergTable.rewriteDataFiles(spark, t)
    assert(sid !== -1L)
    // fewer files, same rows, EVERY _row_id identical (pre-lineage
    // row keeps its null)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.deletes.isEmpty, "compaction folds the delete pile")
    assert(ids() === before)
    assert(before(1L).isEmpty && before(2L).nonEmpty)
    // no fresh ranges were claimed by the rewrite
    assert(IcebergTable.nextRowId(spark, t) === nextBefore)
    // the rewritten files carry NO first_row_id (rows carry the
    // materialized column instead)
    assert(snap.files.forall(_.firstRowId.isEmpty))

    // a SECOND compaction round-trips the materialized column
    IcebergTable.write(spark, Seq((99L, "z")).toDF("k", "v"), t)
    val afterAppend = ids()
    assert(afterAppend(99L).nonEmpty)
    IcebergTable.rewriteDataFiles(spark, t)
    assert(ids() === afterAppend)
    // and the plain read does NOT leak the materialized column
    assert(IcebergTable.read(spark, t).columns.toSeq === Seq("k", "v"))
  }

  test("_last_updated_sequence_number: inherited from the file seq, stable across DML and compaction") {
    val t = tmp()
    IcebergTable.write(spark, Seq((0L, "seed")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.write(spark,
      (1L until 6L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark,
      (6L until 9L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1), t)
    def seqs() = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_last_updated_sequence_number").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val s0 = seqs()
    // pre-lineage row: null; the two appends carry DISTINCT seqs
    assert(s0(0L).isEmpty)
    assert(s0(1L).nonEmpty && s0(6L).nonEmpty && s0(1L) != s0(6L))
    (1L until 6L).foreach(k => assert(s0(k) === s0(1L)))

    // a MOR UPDATE bumps ONLY the post-image row's seq
    IcebergTable.update(spark, t, col("k") === 2L,
      Map("v" -> org.apache.spark.sql.functions.lit("UPD")))
    val s1 = seqs()
    assert(s1(2L).get > s0(2L).get, "post-image carries the new seq")
    (Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L)).foreach(k => assert(s1(k) === s0(k)))

    // compaction MATERIALIZES the seqs — identical before/after even
    // though the rewritten file commits at a fresh sequence number
    IcebergTable.rewriteDataFiles(spark, t)
    assert(seqs() === s1)
  }

  test("the over-gate COW fallback preserves surviving _row_ids; post-images inherit fresh ones") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.write(spark,
      (2L until 20L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    def ids() = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val before = ids()

    // over-gate DELETE falls to COW: the rewritten file's SURVIVORS
    // keep their ids via the materialized column
    spark.conf.set("spark.graft.mor.maxDeleteRows", "1")
    try IcebergTable.delete(spark, t, col("k") >= 15L)
    finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    val afterDel = ids()
    assert(afterDel.keySet === before.keySet.filter(_ < 15L))
    afterDel.foreach { case (k, id) => assert(id === before(k), s"k=$k") }

    // over-gate UPDATE: survivors keep ids, post-images INHERIT
    // fresh ones from the staged file's first_row_id
    spark.conf.set("spark.graft.mor.maxDeleteRows", "1")
    try IcebergTable.update(spark, t, col("k") === 5L,
      Map("v" -> org.apache.spark.sql.functions.lit("UPD")))
    finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    val afterUpd = ids()
    (afterDel.keySet - 5L).foreach(k =>
      assert(afterUpd(k) === afterDel(k), s"k=$k"))
    val newId = afterUpd(5L)
    assert(newId.nonEmpty && newId != afterDel(5L),
      "the post-image row must carry a FRESH id")
    assert(!afterDel.values.flatten.toSet.contains(newId.get))
  }

  test("lineage gate is TABLE-level: ids survive a second rewrite after a FULL compaction (no first_row_id entries left)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((0L, "seed")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.write(spark,
      (1L to 12L).map(i => (i, s"v$i")).toDF("k", "v").repartition(3), t)

    def ids() = IcebergTable.readWithRowIds(spark, t)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    // full compaction: EVERY surviving entry now lacks first_row_id
    // (ids live only as the materialized column) — the state where a
    // per-file `exists(_.firstRowId.isDefined)` gate flips false
    IcebergTable.rewriteDataFiles(spark, t)
    val snap1 = IcebergTable.snapshot(spark, t)
    assert(snap1.rowLineage, "v3 + next-row-id ⇒ table-level lineage")
    assert(snap1.files.forall(_.firstRowId.isEmpty))
    val after1 = ids()
    assert((1L to 12L).forall(k => after1(k).nonEmpty))

    // a MOR delete adds ONLY a position-delete file (still zero
    // first_row_id entries), then a SECOND compaction: pre-fix this
    // took the non-lineage branch and silently re-keyed every row
    IcebergTable.delete(spark, t, col("k") === 7L)
    IcebergTable.rewriteDataFiles(spark, t)
    val after2 = ids()
    assert(after2.keySet === after1.keySet - 7L)
    after2.foreach { case (k, id) => assert(id === after1(k), s"k=$k") }

    // COW DELETE on the fully-compacted table (gate forced to 0):
    // rewriteCow's lineage branch must also fire off the table gate
    spark.conf.set("spark.graft.mor.maxDeleteRows", "0")
    try IcebergTable.delete(spark, t, col("k") === 3L)
    finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    val after3 = ids()
    assert(after3.keySet === after2.keySet - 3L)
    after3.foreach { case (k, id) => assert(id === after2(k), s"k=$k") }
  }
}
