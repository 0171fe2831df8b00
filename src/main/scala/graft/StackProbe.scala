package graft
object StackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val name = if (args.nonEmpty) args(0) else "interop_iceberg_dcompact"
    val iters = if (args.length > 1) args(1).toInt else 6
    val spark = graft.sources.GraftSession.local(cpus)
    SparkEntry.queries(name)(spark, sfDir).count() // warmup
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var go = true
    val self = Thread.currentThread()
    val sampler = new Thread(() => {
      while (go) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if ((t ne self) && t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
            !t.getName.startsWith("Executor task launch")) {
            val frames = st.take(64).map(f => s"${f.getClassName}.${f.getMethodName}")
            val top = frames.headOption.getOrElse("")
            if (!top.startsWith("jdk.internal.misc.Unsafe") &&
                !top.contains("EPoll") && !top.contains("SocketDispatcher") &&
                !top.contains("Thread.getAllStackTraces")) {
              val key = frames.find(f => f.contains("graft") ||
                f.contains("org.apache.spark") || f.contains("janino") ||
                f.contains("hadoop"))
                .map(g => s"${frames.head} ... $g").getOrElse(frames.take(2).mkString(" <- "))
              hist.merge(s"[${t.getName.take(20)}] $key", 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    var i = 0
    while (i < iters) { SparkEntry.queries(name)(spark, sfDir).count(); i += 1 }
    go = false
    println(f"[stk] $name x$iters: ${(System.nanoTime()-t0)/1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, n) =>
      println(f"[stk] $n%5d  $k")
    }
    spark.stop()
  }
}
