package graft

import org.apache.spark.sql.SparkSession

/** Dump ONE graded query's result + oracle SQL for a focused DuckDB
  * compare (tools/compare.py does the full suite). Not a test.
  * Usage: Test/runMain graft.ProbeDump <queryName> <outDir> [sfDir]
  */
object ProbeDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val outDir = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/${name}_oracle.sql"),
      SparkEntry.oracleSql(name).getBytes("UTF-8"))
    println(s"[probedump] wrote $outDir/$name.parquet")
    spark.stop()
  }
}
