package graft

import org.apache.spark.sql.functions._

/** Ad-hoc phase stopwatch for the commit-path interop queries: run the
  * same steps the graded query runs, timing each. Not a test. */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.sources.GraftSession.local(cpus)
    val which = if (args.nonEmpty) args.toSet else Set("dcompact", "pmor")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.sources.{IcebergTable, Tables}
    for (round <- 1 to 2) {
      println(s"--- round $round (round 1 = warmup) ---")
      if (which("dcompact")) {
        println("== interop_iceberg_dcompact phases ==")
        val tp = java.nio.file.Files.createTempDirectory("graft-ph-dcomp")
          .toString + "/t"
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderpriority"))
        t("write") { IcebergTable.write(spark, o.repartition(4), tp) }
        t("delete1") { IcebergTable.delete(spark, tp, col("o_orderkey") % 7 === 0) }
        t("delete2") { IcebergTable.delete(spark, tp, col("o_totalprice") < 10000) }
        t("delete3") { IcebergTable.delete(spark, tp,
          col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 2 === 0) }
        t("snapshot-before") { IcebergTable.snapshot(spark, tp) }
        t("rewritePosDeletes") { IcebergTable.rewritePositionDeleteFiles(spark, tp) }
        t("snapshot-after") { IcebergTable.snapshot(spark, tp) }
        t("read+agg") {
          spark.read.format("graft-iceberg").load(tp)
            .groupBy(col("o_orderstatus")).agg(count(lit(1)), sum(col("o_totalprice")))
            .count()
        }
        spark.catalog.clearCache()
      }
      if (which("pmor")) {
        println("== interop_iceberg_pmor phases ==")
        val tp = java.nio.file.Files.createTempDirectory("graft-ph-pmor")
          .toString + "/t"
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
            col("o_totalprice"))
        t("write(partitioned)") { IcebergTable.write(spark, o.repartition(4), tp,
          partitionBy = Seq("years(o_orderdate)")) }
        t("delete") { IcebergTable.delete(spark, tp,
          col("o_orderstatus") === "F" && col("o_totalprice") < 50000) }
        t("update") { IcebergTable.update(spark, tp,
          col("o_orderstatus") === "P" && col("o_orderkey") % 4 === 0,
          Map("o_totalprice" -> (col("o_totalprice") * 2))) }
        t("read+agg") {
          spark.read.format("graft-iceberg").load(tp)
            .where(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")))
            .groupBy(col("o_orderstatus")).agg(count(lit(1)), sum(col("o_totalprice")))
            .count()
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
