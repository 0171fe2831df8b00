package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.similarity.Similarity
import graft.functions.Det.roundTo

/** Sub-stage timing for ann_ivf_kmeans. Not a test. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe3] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[probe3] --- round $round ---")
      val e = Tables.embeddings(spark, sfDir).select(col("vec_id"),
        transform(col("embedding"), x => roundTo(x.cast("double"), 10)).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("materialize-e") { e.count() }
      val cents = time("kmeans-2-iters") {
        Similarity.kmeansCentroids(e, k = 16, iters = 2, sumScale = 10)
      }
      time("ivf-search") {
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 100), k = 5, nCells = 16,
          nProbe = 2, trainedCentroids = Some(cents)).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
