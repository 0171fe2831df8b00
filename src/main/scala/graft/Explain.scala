package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the named queries (all when no
  * names given) — the explain-driven optimization loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // the SAME session shape Bench/Verify run (extensions included —
    // SQL MERGE and the top-k rewrite cannot even plan without them)
    val spark = graft.sources.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
