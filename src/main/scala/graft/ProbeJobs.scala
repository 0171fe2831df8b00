package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Ad-hoc per-JOB profiler: run selected queries (warmup + 1 timed
  * pass) with a listener recording every Spark job's wall time, task
  * count and call site, so commit-path-bound queries (many small
  * sequential jobs) show WHERE the time goes. Not a test.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.ProbeJobs interop_iceberg_dcompact"
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("interop_iceberg_dcompact")
    val spark = graft.sources.GraftSession.local(cpus)

    case class JobRec(id: Int, var desc: String, var start: Long,
      var end: Long, var tasks: Int, var taskTimeMs: Long)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.Map[Int, Int]()
    @volatile var record = false
    // SQL executions carry the triggering call site in their start
    // event — attribute each job to it (the stage name is just the
    // async-execution wrapper frame)
    val execDesc = mutable.Map[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.synchronized { execDesc(s.executionId) = s.description }
        case _ => ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => execDesc.synchronized {
            execDesc.get(id.toLong) }.map(_.takeWhile(_ != '\n')))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .orElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.synchronized {
          jobs(j.jobId) = JobRec(j.jobId, desc, j.time, 0L, 0, 0L)
          j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (record) {
        jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (record) {
        jobs.synchronized {
          stageToJob.get(t.stageId).flatMap(jobs.get).foreach { r =>
            r.tasks += 1
            if (t.taskMetrics != null)
              r.taskTimeMs += t.taskMetrics.executorRunTime
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      // warmup (codegen/JIT)
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable => println(s"[probe] $name warmup FAILED: $e") }
      spark.catalog.clearCache()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      record = true
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      record = false
      spark.catalog.clearCache()
      val snap = jobs.synchronized { jobs.values.toVector }
      val jobWall = snap.map(r => (r.end - r.start).max(0L)).sum / 1e3
      println(f"\n=== $name: wall $wallS%.3f s, ${snap.size} jobs " +
        f"(job wall sum $jobWall%.3f s, gap ${wallS - jobWall}%.3f s), $n rows ===")
      // group jobs by description for a compact profile
      val byDesc = snap.groupBy(_.desc).map { case (d, rs) =>
        (d, rs.size, rs.map(r => (r.end - r.start).max(0L)).sum / 1e3,
          rs.map(_.tasks).sum, rs.map(_.taskTimeMs).sum / 1e3)
      }.toVector.sortBy(-_._3)
      byDesc.take(40).foreach { case (d, cnt, wall, tasks, ttime) =>
        println(f"  ${wall}%8.3f s  n=$cnt%-4d tasks=$tasks%-6d taskTime=${ttime}%8.3f s  $d")
      }
      // gap timeline: time between consecutive jobs (driver-side work)
      val ordered = snap.sortBy(_.start)
      val gaps = ordered.sliding(2).collect {
        case Vector(a, b) if b.start > a.end && a.end > 0 =>
          (b.start - a.end, a.desc, b.desc)
      }.toVector.sortBy(-_._1).take(12)
      println("  -- largest inter-job gaps (driver work): --")
      gaps.foreach { case (ms, after, before) =>
        println(f"  ${ms / 1e3}%8.3f s  after [$after] before [$before]")
      }
    }
    spark.stop()
  }
}
