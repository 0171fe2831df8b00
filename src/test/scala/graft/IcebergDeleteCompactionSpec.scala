package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `rewrite_position_delete_files` — Iceberg delete-file maintenance
  * WITHOUT a data rewrite ([[IcebergTable.rewritePositionDeleteFiles]]):
  * the MOR delete pile folds into few sorted, bounds-bearing files,
  * dangling rows (referencing dead data files) drop, equality deletes
  * carry with their ORIGINAL sequence numbers, and the data manifests
  * are untouched — reads before and after hash-match. */
class IcebergDeleteCompactionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dcompact").toString + "/t"

  test("N small MOR deletes fold into ONE delete file; reads unchanged; data untouched") {
    val t = tmp()
    val df = (1 to 400).map(i => (i, s"r$i", i % 7)).toDF("id", "s", "g")
    IcebergTable.write(spark, df.repartition(4), t)
    // a pile: three separate MOR DELETE commits → three delete files
    IcebergTable.delete(spark, t, col("id") % 11 === 0)
    IcebergTable.delete(spark, t, col("id") % 13 === 0)
    IcebergTable.delete(spark, t, col("id") % 17 === 0)
    val before = IcebergTable.snapshot(spark, t)
    assert(before.deletes.count(_.content == 1) === 3)
    val expect = IcebergTable.read(spark, t)
      .as[(Int, String, Int)].collect().toSet

    val snapId = IcebergTable.rewritePositionDeleteFiles(spark, t)
    val after = IcebergTable.snapshot(spark, t)
    assert(after.snapshotId === snapId)
    assert(after.deletes.count(_.content == 1) === 1, "pile folded to one file")
    // data side COMPLETELY untouched: same paths, same seqs
    assert(after.files.map(f => (f.path, f.seq)).sortBy(_._1) ===
      before.files.map(f => (f.path, f.seq)).sortBy(_._1))
    // the folded file carries tight file_path bounds
    assert(after.deletes.filter(_.content == 1).forall(_.pathBounds.isDefined))
    val got = IcebergTable.read(spark, t)
      .as[(Int, String, Int)].collect().toSet
    assert(got === expect)
    // row counts: 3 piles had no overlap, so the merged count is the sum
    assert(after.deletes.filter(_.content == 1).map(_.records).sum ===
      before.deletes.filter(_.content == 1).map(_.records).sum)
    // time travel still serves the pre-compaction snapshot
    val old = IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(before.snapshotId))
    assert(old.count() === expect.size.toLong)
  }

  test("dangling deletes (referencing rewritten data files) DROP in the merge") {
    val t = tmp()
    IcebergTable.write(spark,
      (1 to 100).map(i => (i, s"a$i")).toDF("id", "s"), t)
    IcebergTable.write(spark,
      (101 to 200).map(i => (i, s"b$i")).toDF("id", "s"), t)
    IcebergTable.delete(spark, t, col("id") % 10 === 0) // 20 pos-delete rows
    val expect = IcebergTable.read(spark, t).count()
    // a COW UPDATE rewrites every match-bearing data file (over-gate
    // path): prior delete manifests carry, but their rows now
    // reference DEAD paths — the dangling-delete shape
    spark.conf.set("spark.graft.mor.maxDeleteRows", "0")
    try IcebergTable.update(spark, t, col("id") <= 200,
      Map("s" -> concat(col("s"), lit("")))) // identity rewrite
    finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    val mid = IcebergTable.snapshot(spark, t)
    assert(IcebergTable.read(spark, t).count() === expect)
    if (mid.deletes.exists(_.content == 1)) {
      val snapId = IcebergTable.rewritePositionDeleteFiles(spark, t)
      val after = IcebergTable.snapshot(spark, t)
      assert(after.snapshotId === snapId)
      // every carried delete row was dangling → no delete files remain
      assert(after.deletes.isEmpty)
      assert(IcebergTable.read(spark, t).count() === expect)
    } else {
      // the COW rewrite already dropped the manifests — compaction is
      // then a clean no-op
      assert(IcebergTable.rewritePositionDeleteFiles(spark, t) ===
        mid.snapshotId)
    }
  }

  test("equality deletes carry with ORIGINAL sequence numbers") {
    val t = tmp()
    IcebergTable.write(spark,
      (1 to 50).map(i => (i, s"v$i")).toDF("id", "s"), t)
    // equality upsert: delete-by-key at seq 2, re-insert at seq 2
    IcebergTable.upsertEquality(spark, t,
      Seq((5, "V5"), (6, "V6")).toDF("id", "s"), Seq("id"))
    // rows re-written AFTER the eq delete — the eq file must never
    // re-apply to them post-compaction
    IcebergTable.delete(spark, t, col("id") === 10) // a pos-delete pile entry
    IcebergTable.delete(spark, t, col("id") === 11)
    val expect = IcebergTable.read(spark, t)
      .as[(Int, String)].collect().toSet
    assert(expect.contains((5, "V5")) && !expect.contains((10, "r10")))

    IcebergTable.rewritePositionDeleteFiles(spark, t)
    val after = IcebergTable.snapshot(spark, t)
    assert(after.deletes.count(_.content == 1) === 1)
    val eq = after.deletes.filter(_.content == 2)
    assert(eq.size === 1)
    assert(eq.head.seq === 2L, "equality delete keeps its original seq")
    val got = IcebergTable.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === expect)
  }

  test("no-op cases return the current snapshot without a commit") {
    val t = tmp()
    IcebergTable.write(spark, (1 to 10).map(i => (i, i)).toDF("a", "b"), t)
    val v0 = IcebergTable.snapshot(spark, t).snapshotId
    assert(IcebergTable.rewritePositionDeleteFiles(spark, t) === v0)
    IcebergTable.delete(spark, t, col("a") === 1) // ONE clean delete file
    val v1 = IcebergTable.snapshot(spark, t).snapshotId
    assert(IcebergTable.rewritePositionDeleteFiles(spark, t) === v1)
  }

  test("v3: dangling DVs drop, live DVs carry as existing") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("dvdangle")
      .toString + "/t"
    // two pre-lineage files (written before the v3 upgrade, so the
    // COW fallback below is permitted)
    IcebergTable.write(spark,
      (0L until 40L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1), t)
    IcebergTable.write(spark,
      (100L until 140L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // DV on file B (lives on), DV on file A (to dangle)
    IcebergTable.delete(spark, t, col("k") === 100L)
    IcebergTable.delete(spark, t, col("k") === 1L)
    // over-gate DELETE confined to file A -> COW rewrites A; the
    // carried delete manifests now hold a DV referencing dead A
    spark.conf.set("spark.graft.mor.maxDeleteRows", "1")
    try IcebergTable.delete(spark, t, col("k") >= 2L && col("k") < 40L)
    finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    val before = IcebergTable.snapshot(spark, t)
    val dangling = before.deletes.filter(d => d.isDv &&
      !d.referencedDataFile.exists(before.files.map(_.path).toSet))
    assert(dangling.nonEmpty, s"expected a dangling DV: ${before.deletes}")
    val rows = IcebergTable.read(spark, t).select("k").as[Long]
      .collect().sorted

    IcebergTable.rewritePositionDeleteFiles(spark, t)
    val after = IcebergTable.snapshot(spark, t)
    val dvs = after.deletes.filter(_.isDv)
    assert(dvs.size === 1 &&
      dvs.head.referencedDataFile.exists(after.files.map(_.path).toSet),
      s"only the LIVE DV must carry: ${after.deletes}")
    assert(dvs.head.seq === before.deletes.filter(_.isDv)
      .find(_.referencedDataFile == dvs.head.referencedDataFile).get.seq,
      "carried DV must keep its ORIGINAL sequence number")
    val rowsAfter = IcebergTable.read(spark, t).select("k").as[Long]
      .collect().sorted
    assert(rowsAfter.toSeq === rows.toSeq, "maintenance must not change rows")
  }
}
