package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Optimistic concurrency for real Delta commits ([[DeltaLog.commitCas]]):
  * a writer that loses the exclusive-create version race re-reads the
  * winner's commit(s), classifies the logical conflict from the action
  * lines, and REBASES — retries at the next free version — when the
  * transactions are disjoint (delta.io concurrency-control semantics at
  * WriteSerializable). In package graft.sources to drive the
  * private[sources] CAS with a deterministically STALE first version —
  * the exact state a racing writer is in the instant it loses. */
class DeltaConcurrencySpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-concurrency").toString

  /** Stage one real parquet file under `table/rel`, return (size). */
  private def stage(table: String, rel: String,
                    df: org.apache.spark.sql.DataFrame): Long = {
    val t = Files.createTempDirectory("graft-cc-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(table, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toFile.length()
  }

  private def addLine(rel: String, size: Long, dataChange: Boolean = true) =
    s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,"modificationTime":1,"dataChange":$dataChange}}"""
  private def removeLine(rel: String, dataChange: Boolean = true) =
    s"""{"remove":{"path":"$rel","deletionTimestamp":1,"dataChange":$dataChange}}"""

  /** Table-relative paths of the snapshot's live files. */
  private def liveRel(table: String): Set[String] =
    DeltaLog.snapshot(spark, table).files
      .map(f => f.path.split('/').takeRight(1).mkString).toSet

  test("blind append REBASES past a concurrent data-only winner") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v1 = the winner
    // a racing writer computed v=1 before the winner landed
    val sz = stage(t, "late-append.parquet", Seq((3, "c")).toDF("id", "s"))
    val v = DeltaLog.commitCas(spark, t, 1L,
      Seq(addLine("late-append.parquet", sz)), DeltaLog.BlindAppend)
    assert(v === 2L)
    assert(DeltaLog.listVersions(spark, t) === Seq(0L, 1L, 2L))
    val got = DeltaLog.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("OPTIMIZE-shaped commit (ReadFiles) rebases over a concurrent append") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "s"), t) // v0
    val toCompact = DeltaLog.snapshot(spark, t).files
      .map(_.path.split('/').last)
    DeltaLog.write(spark, Seq((9, "z")).toDF("id", "s"), t) // v1 winner append
    val sz = stage(t, "compacted-0.parquet",
      Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val lines = toCompact.map(removeLine(_, dataChange = false)) :+
      addLine("compacted-0.parquet", sz, dataChange = false)
    val v = DeltaLog.commitCas(spark, t, 1L, lines, DeltaLog.ReadFiles)
    assert(v === 2L)
    val got = DeltaLog.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "b"), (9, "z")))
    // the compacted file is live, the compacted-away inputs are not
    assert(liveRel(t).contains("compacted-0.parquet"))
    assert(toCompact.forall(f => !liveRel(t).contains(f)))
  }

  test("write-write on the same file REFUSES (ConcurrentDeleteDelete)") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "s"), t) // v0
    val victim = DeltaLog.snapshot(spark, t).files.head.path.split('/').last
    // winner v1: a DELETE that rewrote the victim file
    DeltaLog.delete(spark, t, col("id") === 1)
    val e = intercept[DeltaLog.CommitConflictException] {
      DeltaLog.commitCas(spark, t, 1L, Seq(removeLine(victim)),
        DeltaLog.ReadFiles)
    }
    assert(e.kind === "ConcurrentDeleteDelete")
  }

  test("predicate-scoped DML vs concurrent dataChange append REFUSES") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    val f0 = DeltaLog.snapshot(spark, t).files.head.path.split('/').last
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t) // v1 winner append
    val sz = stage(t, "rewritten-0.parquet", Seq((1, "A")).toDF("id", "s"))
    val e = intercept[DeltaLog.CommitConflictException] {
      DeltaLog.commitCas(spark, t, 1L,
        Seq(removeLine(f0), addLine("rewritten-0.parquet", sz)),
        DeltaLog.ReadTable)
    }
    assert(e.kind === "ConcurrentAppend")
  }

  test("concurrent metadata change REFUSES every rebase") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.addColumns(spark, t,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.IntegerType)))) // v1 winner DDL
    val sz = stage(t, "app-0.parquet", Seq((3, "c")).toDF("id", "s"))
    val e = intercept[DeltaLog.CommitConflictException] {
      DeltaLog.commitCas(spark, t, 1L, Seq(addLine("app-0.parquet", sz)),
        DeltaLog.BlindAppend)
    }
    assert(e.kind === "MetadataChanged")
  }

  test("same idempotent txn appId racing itself REFUSES") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t) // v0
    DeltaLog.write(spark, Seq((2, "b")).toDF("id", "s"), t,
      txn = Some(("sink-app", 7L))) // v1 winner carries the txn marker
    val sz = stage(t, "app-1.parquet", Seq((3, "c")).toDF("id", "s"))
    val e = intercept[DeltaLog.CommitConflictException] {
      DeltaLog.commitCas(spark, t, 1L,
        Seq(addLine("app-1.parquet", sz),
          """{"txn":{"appId":"sink-app","version":8,"lastUpdated":1}}"""),
        DeltaLog.BlindAppend)
    }
    assert(e.kind === "ConcurrentTransaction")
  }

  test("concurrent threaded appends ALL land (no spurious failures)") {
    val t = tmp()
    DeltaLog.write(spark, Seq((0, "seed")).toDF("id", "s"), t) // v0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val futures = (1 to 6).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            DeltaLog.write(spark, Seq((i, s"w$i")).toDF("id", "s"), t)
          }
        })
      }
      start.countDown()
      val versions = futures.map(_.get(120,
        java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet.size === 6, "each append took a distinct version")
      assert(versions.toSet === (1L to 6L).toSet)
    } finally pool.shutdownNow()
    val got = DeltaLog.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === (1 to 6).map(i => (i, s"w$i")).toSet + ((0, "seed")))
  }
}
