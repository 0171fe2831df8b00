package graft

import java.nio.file.Files

import graft.sources.IcebergTable

/** Iceberg sort orders (spec §Sorting): `WRITE ORDERED BY` registers
  * a real default sort order in metadata, subsequent writes honor it
  * (range-partitioned + locally sorted staging), and the payoff is
  * the 100 TB one — per-file bounds on the sort column become tight
  * and non-overlapping, so metadata skipping prunes most files on a
  * sort-key predicate. */
class IcebergSortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("sortorder").toString

  test("WRITE ORDERED BY yields non-overlapping per-file bounds; order survives appends") {
    val path = tmp()
    IcebergTable.write(spark,
      Seq((99L, "seed")).toDF("k", "v"), path)
    val oid = spark.sql(s"ALTER TABLE '$path' WRITE ORDERED BY (k ASC)")
      .collect().head.getLong(0)
    assert(oid === 1L)
    assert(IcebergTable.snapshot(spark, path).sortOrder === Seq(("k", true)))

    // shuffled append over 4 input partitions: unsorted staging would
    // give every file ~full-range k bounds
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle((0L until 400L).toList)
      .map(i => (i, s"v$i")).toDF("k", "v").repartition(4)
    IcebergTable.write(spark, data, path)

    val snap = IcebergTable.snapshot(spark, path)
    // the order survived the append's metadata rebuild (carry bug)
    assert(snap.sortOrder === Seq(("k", true)))
    val newFiles = snap.files.filter(_.seq == snap.files.map(_.seq).max)
    assert(newFiles.size >= 2, "expected several staged files")
    val ranges = newFiles.flatMap(_.bounds.get("k")).sortBy(_._1)
    assert(ranges.size === newFiles.size, "every new file must carry k bounds")
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file k-ranges overlap: $ranges")
      case _ =>
    }
    // rows intact
    assert(IcebergTable.read(spark, path).count() === 401L)

    // the tight layout actually skips: a narrow k predicate plans a
    // strict subset of the new files
    val pruned = IcebergTable.prunedFiles(spark, snap,
      org.apache.spark.sql.functions.col("k") < 50L)
    assert(pruned.size < snap.files.size,
      s"bounds skipping failed: ${pruned.size} of ${snap.files.size}")
  }

  test("WRITE UNORDERED resets to order 0; DESC parses; unknown column refuses") {
    val path = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), path)
    spark.sql(s"ALTER TABLE '$path' WRITE ORDERED BY (k DESC, v)")
    assert(IcebergTable.snapshot(spark, path).sortOrder ===
      Seq(("k", false), ("v", true)))
    val r = spark.sql(s"ALTER TABLE '$path' WRITE UNORDERED").collect()
    assert(r.head.getLong(0) === 0L)
    assert(IcebergTable.snapshot(spark, path).sortOrder === Seq.empty)
    intercept[IllegalArgumentException] {
      IcebergTable.setWriteOrder(spark, path, Seq(("nope", true)))
    }
  }

  test("partitioned writes sort locally within each partition directory") {
    val path = tmp()
    val rnd = new scala.util.Random(11)
    val seed = Seq((0L, "p0", "x")).toDF("k", "p", "v")
    IcebergTable.write(spark, seed, path, partitionBy = Seq("p"))
    IcebergTable.setWriteOrder(spark, path, Seq(("k", true)))
    val data = rnd.shuffle((1L until 201L).toList)
      .map(i => (i, s"p${i % 2}", s"v$i")).toDF("k", "p", "v")
      .repartition(2)
    IcebergTable.write(spark, data, path, partitionBy = Seq("p"))
    val snap = IcebergTable.snapshot(spark, path)
    assert(snap.sortOrder === Seq(("k", true)))
    assert(IcebergTable.read(spark, path).count() === 201L)
    // every new file still carries k bounds (sorting must not break
    // partitioned staging or stats collection)
    val newFiles = snap.files.filter(_.seq == snap.files.map(_.seq).max)
    assert(newFiles.nonEmpty && newFiles.forall(_.bounds.contains("k")))
  }

  test("compaction PRESERVES the sort order: post-OPTIMIZE files keep non-overlapping k bounds") {
    val path = tmp()
    IcebergTable.write(spark, Seq((9999L, "seed")).toDF("k", "v"), path)
    IcebergTable.setWriteOrder(spark, path, Seq(("k", true)))
    // a pile of small ordered files + a MOR delete scar (so the
    // rewrite has real folding work)
    val rnd = new scala.util.Random(3)
    (0 until 3).foreach { b =>
      IcebergTable.write(spark,
        rnd.shuffle((b * 200L until (b + 1) * 200L).toList)
          .map(i => (i, s"v$i")).toDF("k", "v").repartition(3), path)
    }
    IcebergTable.delete(spark, path,
      org.apache.spark.sql.functions.col("k") % 10L === 0L)

    val sid = IcebergTable.rewriteDataFiles(spark, path,
      targetFileBytes = 2048L) // force several output files
    assert(sid !== -1L)
    val snap = IcebergTable.snapshot(spark, path)
    assert(snap.deletes.isEmpty, "compaction folds the delete pile")
    val files = snap.files
    assert(files.size >= 2, s"expected several compacted files, got ${files.size}")
    // the sort clustering SURVIVED the rewrite: k bounds tight and
    // non-overlapping across the compacted files (bin-packing would
    // give every file near-full-range bounds)
    val ranges = files.flatMap(_.bounds.get("k")).sortBy(_._1)
    assert(ranges.size === files.size, "every compacted file must carry k bounds")
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"compacted file k-ranges overlap: $ranges")
      case _ =>
    }
    // rows intact (600 + seed - 60 deleted)
    assert(IcebergTable.read(spark, path).count() === 541L)
    // and skipping still works post-compaction
    val pruned = IcebergTable.prunedFiles(spark, snap,
      org.apache.spark.sql.functions.col("k") < 50L)
    assert(pruned.size < files.size)
  }

  test("PARTITIONED compaction keeps per-partition sort clustering") {
    val path = tmp()
    IcebergTable.write(spark, Seq((0L, "p0", "x")).toDF("k", "p", "v"),
      path, partitionBy = Seq("p"))
    IcebergTable.setWriteOrder(spark, path, Seq(("k", true)))
    val rnd = new scala.util.Random(5)
    (0 until 3).foreach { _ =>
      IcebergTable.write(spark,
        rnd.shuffle((1L until 301L).toList)
          .map(i => (i, s"p${i % 2}", s"v$i")).toDF("k", "p", "v")
          .repartition(2), path, partitionBy = Seq("p"))
    }
    val sid = IcebergTable.rewriteDataFiles(spark, path,
      targetFileBytes = 4096L)
    assert(sid !== -1L)
    val snap = IcebergTable.snapshot(spark, path)
    assert(IcebergTable.read(spark, path).count() === 901L)
    // within EACH partition dir the compacted files' k bounds must
    // not overlap
    snap.files.groupBy(_.partitionTuple.get("p").map(_.toString))
      .foreach { case (pt, fs) =>
        val ranges = fs.flatMap(_.bounds.get("k")).sortBy(_._1)
        assert(ranges.size === fs.size, s"missing k bounds in $pt")
        ranges.sliding(2).foreach {
          case Seq((_, hi1), (lo2, _)) =>
            assert(hi1 <= lo2, s"partition $pt k-ranges overlap: $ranges")
          case _ =>
        }
      }
  }
}
