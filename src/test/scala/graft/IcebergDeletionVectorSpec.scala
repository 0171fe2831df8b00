package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.{DeletionVectors, IcebergTable}

/** Iceberg v3 DELETION VECTORS: row-level DML on a format-version-3
  * table writes Puffin `deletion-vector-v1` blobs (one per affected
  * data file, referenced by manifest fields 143/144/145) instead of
  * position-delete parquet; a new DV FOLDS the file's previous DV and
  * any v2-era parquet positions (the spec makes a DV total for its
  * file), superseded DV entries drop, and both read paths serve the
  * merged state. */
class IcebergDeletionVectorSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def tmp(): String =
    Files.createTempDirectory("icedv").toString + "/t"

  private def fsOf(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("DELETE on a v3 table writes a puffin DV; both read paths serve the survivors") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), t)
    spark.sql(s"ALTER TABLE '$t' SET TBLPROPERTIES ('format-version'='3')")
    IcebergTable.delete(spark, t, col("k") % 10L === 0L)

    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.deletes.nonEmpty && snap.deletes.forall(_.isDv),
      s"expected only DV delete entries: ${snap.deletes}")
    snap.deletes.foreach { d =>
      assert(d.path.endsWith(".puffin"))
      assert(d.referencedDataFile.isDefined && d.contentOffset.isDefined &&
        d.contentSize.isDefined)
    }
    assert(snap.deletes.map(_.records).sum === 10L)

    val scala_ = IcebergTable.read(spark, t).select("k").as[Long].collect()
    assert(scala_.length === 90 && scala_.forall(_ % 10 != 0))
    val dsv2 = spark.read.format("graft-iceberg").load(t)
      .select("k").as[Long].collect()
    assert(dsv2.sorted.toSeq === scala_.sorted.toSeq)
  }

  test("a second DELETE folds into ONE DV per file; the superseded entry drops") {
    val t = tmp()
    // single data file so the fold is observable
    IcebergTable.write(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    spark.sql(s"ALTER TABLE '$t' SET TBLPROPERTIES ('format-version'='3')")
    IcebergTable.delete(spark, t, col("k") < 5L)
    IcebergTable.delete(spark, t, col("k") >= 45L)

    val snap = IcebergTable.snapshot(spark, t)
    val dvs = snap.deletes.filter(_.isDv)
    assert(dvs.size === 1, s"expected one folded DV, got: $dvs")
    assert(dvs.head.records === 10L) // 5 + 5, folded
    val rows = IcebergTable.read(spark, t).select("k").as[Long].collect()
    assert(rows.sorted.toSeq === (5L until 45L))
    // time travel: the first delete's snapshot still serves its own state
    val ids = IcebergTable.snapshotIds(spark, t)
    val mid = IcebergTable.read(spark, t, snapshotIdAsOf = Some(ids(1)))
      .select("k").as[Long].collect()
    assert(mid.sorted.toSeq === (5L until 50L))
  }

  test("upgrading a v2 table with parquet position deletes: the new DV folds them for its file") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    IcebergTable.delete(spark, t, col("k") === 7L) // v2 parquet delete
    assert(IcebergTable.snapshot(spark, t).deletes.forall(d => !d.isDv))
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.delete(spark, t, col("k") === 9L) // v3 DV, folds pos 7

    val snap = IcebergTable.snapshot(spark, t)
    val dv = snap.deletes.filter(_.isDv)
    assert(dv.size === 1 && dv.head.records === 2L,
      s"DV must fold the v2 position: ${snap.deletes}")
    val rows = IcebergTable.read(spark, t).select("k").as[Long].collect()
    assert(rows.length === 38 && !rows.contains(7L) && !rows.contains(9L))
    // the DSv2 scan agrees (double-applying the still-carried parquet
    // delete is harmless — deletes are idempotent)
    assert(spark.read.format("graft-iceberg").load(t).count() === 38L)
  }

  test("UPDATE on a v3 table is a DV + fresh data files, one snapshot") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 30L).map(i => (i, i * 2L)).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.update(spark, t, col("k") < 3L,
      Map("v" -> org.apache.spark.sql.functions.lit(999L)))
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.deletes.nonEmpty && snap.deletes.forall(_.isDv))
    val rows = IcebergTable.read(spark, t).as[(Long, Long)].collect().toMap
    assert(rows.size === 30)
    assert((0L until 3L).forall(rows(_) === 999L))
    assert(rows(5L) === 10L)
  }

  test("DV blob codec round-trips; CRC corruption refuses; downgrade refuses") {
    val ps = Seq(0L, 1L, 7L, (1L << 33) + 5L, (1L << 34))
    val blob = DeletionVectors.dvBlobBytes(ps)
    assert(DeletionVectors.dvBlobPositions(blob).toSeq === ps.sorted)
    val bad = blob.clone(); bad(6) = (bad(6) ^ 0x5a).toByte
    intercept[IllegalArgumentException] {
      DeletionVectors.dvBlobPositions(bad)
    }
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    intercept[IllegalArgumentException] {
      IcebergTable.upgradeFormatVersion(spark, t, 2)
    }
  }

  test("change feed surfaces a DV DELETE's rows exactly once (the Delta DV-CDC parity leg)") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    val s1 = IcebergTable.snapshot(spark, t).snapshotId
    // MOR DELETE via a v3 deletion vector between two polled snapshots
    IcebergTable.delete(spark, t, col("k") === 3L || col("k") === 7L)
    val s2 = IcebergTable.snapshot(spark, t).snapshotId
    val ch = IcebergTable.changes(spark, t, s1, s2)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(ch.sorted === Seq((3L, "delete"), (7L, "delete")))

    // a SECOND DV delete on the same file (folded total vector) must
    // surface ONLY the newly-dead rows — the pair-diff, not the fold
    IcebergTable.delete(spark, t, col("k") === 5L)
    val s3 = IcebergTable.snapshot(spark, t).snapshotId
    val ch2 = IcebergTable.changes(spark, t, s2, s3)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(ch2 === Seq((5L, "delete")))

    // full-range replay composes: 10 inserts + 3 deletes
    val full = IcebergTable.changes(spark, t, -1L, s3)
      .select("k", "_change_type").as[(Long, String)].collect()
    assert(full.count(_._2 == "insert") === 10)
    assert(full.filter(_._2 == "delete").map(_._1).sorted.toSeq
      === Seq(3L, 5L, 7L))
    // and syncChanges carries a replica to the live row set
    val (_, inc) = IcebergTable.syncChanges(spark, t, -1L)
    val replayed = inc.get.select("k", "_change_type")
      .as[(Long, String)].collect()
    val liveKeys = replayed.filter(_._2 == "insert").map(_._1).toSet --
      replayed.filter(_._2 == "delete").map(_._1).toSet
    assert(liveKeys === IcebergTable.read(spark, t)
      .select("k").as[Long].collect().toSet)
  }

  test("change feed: MOR UPDATE emits post-image inserts + pre-image deletes; v2 position parquet serves too") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 6L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    val s1 = IcebergTable.snapshot(spark, t).snapshotId
    // v2 table: MOR DELETE lands as position-delete PARQUET
    IcebergTable.delete(spark, t, col("k") === 2L)
    val s2 = IcebergTable.snapshot(spark, t).snapshotId
    val ch = IcebergTable.changes(spark, t, s1, s2)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(ch === Seq((2L, "delete")))
    // MOR UPDATE: one snapshot = new DV/pos-delete + post-image file
    IcebergTable.update(spark, t, col("k") === 4L,
      Map("v" -> org.apache.spark.sql.functions.lit("UPD")))
    val s3 = IcebergTable.snapshot(spark, t).snapshotId
    val up = IcebergTable.changes(spark, t, s2, s3)
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(up === Seq((4L, "UPD", "insert"), (4L, "v4", "delete")))
  }
}
