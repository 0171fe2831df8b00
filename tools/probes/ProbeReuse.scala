package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.concurrent.TrieMap

/** Ad-hoc probe: how many stages of a graded query actually READ
  * input (file scans / cache blocks), i.e. whether AQE stage reuse
  * collapsed identical subtrees at runtime. Not a test.
  * Usage: Test/runMain graft.ProbeReuse <queryName> [sfDir]
  */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_item_cooccurrence"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.sources.GraftSession.local(8)
    val scans = TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val b = sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        if (b > 0) scans.put(sc.stageInfo.stageId, b)
      }
    })
    SparkEntry.queries(name)(spark, sfDir).count()
    Thread.sleep(1000)
    println(s"SCAN_STAGES=${scans.size} BYTES=${scans.values.toSeq.sorted.mkString(",")}")
    spark.stop()
  }
}
