package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** EXECUTOR-COLLECTED write statistics (the r15 100×-scale commit-path
  * seam): above `spark.sql.graft.footerStatsDriverMaxFiles` the
  * per-file footer stats pass runs as ONE Spark job over executors
  * instead of driver ranged I/O — zero driver footer reads — and the
  * resulting manifest stats are identical to the driver path's. */
class IcebergWriteStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-wstats").toString + "/t"

  private def df = (0L until 64L).map(i => (i, s"v$i", i * 2.0))
    .toDF("k", "s", "v").repartition(8, col("k"))

  private def statKey(f: IcebergTable.DataFile) =
    (f.records, f.valueCounts.toSeq.sorted, f.nullCounts.toSeq.sorted,
      f.bounds.toSeq.sortBy(_._1))

  test("above the gate: stats from a Spark job, ZERO driver footer reads, manifest stats identical to the driver path") {
    val t1 = tmp()
    val t2 = tmp()
    try {
      // executor path: gate far below the 8 staged files
      spark.conf.set("spark.sql.graft.footerStatsDriverMaxFiles", "1")
      val before = IcebergTable.driverFooterReads.get()
      IcebergTable.write(spark, df, t1)
      assert(IcebergTable.driverFooterReads.get() === before,
        "driver footer-read staged files above the gate")
      // driver path twin
      spark.conf.set("spark.sql.graft.footerStatsDriverMaxFiles", "10000")
      IcebergTable.write(spark, df, t2)
      assert(IcebergTable.driverFooterReads.get() > before)

      val exec = IcebergTable.snapshot(spark, t1).files
      val drv = IcebergTable.snapshot(spark, t2).files
      assert(exec.size === 8 && drv.size === 8)
      // same per-file stats multiset (paths differ; stats must not)
      assert(exec.map(statKey).sortBy(_.toString)
        === drv.map(statKey).sortBy(_.toString))
      assert(exec.forall(f => f.bounds.nonEmpty && f.records > 0))
      // both tables serve identical rows
      assert(IcebergTable.read(spark, t1)
        .as[(Long, String, Double)].collect().toSet
        === IcebergTable.read(spark, t2)
        .as[(Long, String, Double)].collect().toSet)
    } finally
      spark.conf.unset("spark.sql.graft.footerStatsDriverMaxFiles")
  }

  test("Delta twin: per-add stats JSON present and row-identical above the gate") {
    val t1 = tmp()
    val t2 = tmp()
    try {
      spark.conf.set("spark.sql.graft.footerStatsDriverMaxFiles", "1")
      DeltaLog.write(spark, df, t1)
      spark.conf.set("spark.sql.graft.footerStatsDriverMaxFiles", "10000")
      DeltaLog.write(spark, df, t2)
      val s1 = DeltaLog.snapshot(spark, t1)
      val s2 = DeltaLog.snapshot(spark, t2)
      assert(s1.files.size === 8 && s2.files.size === 8)
      assert(s1.files.forall(_.stats.exists(_.contains("numRecords"))))
      // stats JSON multiset identical across the two paths
      assert(s1.files.flatMap(_.stats).sorted
        === s2.files.flatMap(_.stats).sorted)
      assert(DeltaLog.read(spark, t1)
        .as[(Long, String, Double)].collect().toSet
        === DeltaLog.read(spark, t2)
        .as[(Long, String, Double)].collect().toSet)
    } finally
      spark.conf.unset("spark.sql.graft.footerStatsDriverMaxFiles")
  }
}
