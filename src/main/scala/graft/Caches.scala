package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Library-wide registry of query-owned cache blocks.
  *
  * Operators and graded queries persist intermediates that feed
  * multiple plan branches (signature frames, edge graphs,
  * post-aggregation frames). Those persists are scoped to the query
  * that created them; Bench/Verify drop them between queries with
  * `spark.catalog.clearCache()`, but an interactive caller composing
  * query functions in a long-lived session needs a scoped release
  * that leaves caches persisted by OTHER code untouched. Every
  * persist in the library routes through [[tracked]] so
  * [[unpersistAll]] can release exactly the blocks the library
  * created.
  */
object Caches {

  /** Cache blocks created by library code, awaiting cleanup. */
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at MEMORY_AND_DISK and register it for
    * [[unpersistAll]]. Entries whose blocks are already gone
    * (callers using catalog.clearCache() instead of unpersistAll)
    * are pruned on each call — otherwise the queue retains every
    * plan ever persisted in a long session. */
  def tracked(df: DataFrame): DataFrame = {
    val it = persistedFrames.iterator()
    while (it.hasNext)
      if (it.next().storageLevel == StorageLevel.NONE)
        it.remove()
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persistedFrames.add(p)
    p
  }

  /** Unpersist every cache block any library operator or graded
    * query has created (scoped cleanup — leaves caches persisted by
    * other code untouched, unlike `catalog.clearCache()`). */
  def unpersistAll(blocking: Boolean = false): Unit = {
    var d = persistedFrames.poll()
    while (d != null) { d.unpersist(blocking); d = persistedFrames.poll() }
  }
}
