package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextFunctions
import graft.dedup.NearDup

/** Sub-stage timing for the near-dup pipelines. Not a test. */
object Probe2 {
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    for (round <- 1 to 2) {
      println(s"[probe2] --- round $round ---")
      val docs = Tables.documents(spark, sfDir)
      time("shingles-only") {
        docs.select(col("doc_id"),
          array_distinct(TextFunctions.shingles(col("text"), 3)).as("__sh"))
          .filter(size(col("__sh")) > 0).count()
      }
      val sh = docs.select(col("doc_id"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("__sh"))
        .filter(size(col("__sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sh-materialize") { sh.count() }
      val inv = sh.select(col("doc_id"), explode(col("__sh")).as("__g"))
      time("inv-explode") { inv.count() }
      val common = inv.select(col("doc_id").as("id_a"), col("__g"))
        .join(inv.select(col("doc_id").as("id_b"), col("__g")), Seq("__g"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("__c"))
      time("common-counts") { common.count() }
      time("full-ngram") {
        NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
      spark.catalog.clearCache()
      // minhash sub-stages
      val withSig = docs.select(col("doc_id"),
        TextFunctions.shingles(col("text"), 3).as("__sh"),
        NearDup.minHashSignature(col("text"), 3).as("__sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("minhash-sig") { withSig.count() }
      val cands = NearDup.lshCandidates(NearDup.lshBands(withSig, "doc_id", "__sig"), "doc_id")
      time("minhash-cands") { cands.count() }
      time("full-minhash") {
        NearDup.minHashPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
