package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Optimistic concurrency for real Iceberg commits
  * ([[IcebergTable.casCommit]]): a writer that loses the
  * `v<N+1>.metadata.json` exclusive-create race re-reads the winner's
  * metadata, classifies the logical conflict, and REBASES — re-applies
  * the prepared snapshot against the winner's state, regenerating the
  * cheap driver artifacts (manifests, manifest list, metadata JSON)
  * while the staged data files are reused verbatim (real Iceberg's
  * commit.retry semantics). In package graft.sources to inject a
  * deterministically STALE snapshot into [[IcebergTable.commitMorSnapshot]]
  * — the exact state a racing DML holds the instant it loses. */
class IcebergConcurrencySpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-iceberg-cc").toString

  test("concurrent threaded appends ALL land (no spurious failures)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((0, "seed")).toDF("id", "s"), t)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val futures = (1 to 5).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            IcebergTable.write(spark, Seq((i, s"w$i")).toDF("id", "s"), t)
          }
        })
      }
      start.countDown()
      val snapIds = futures.map(_.get(180,
        java.util.concurrent.TimeUnit.SECONDS))
      assert(snapIds.toSet.size === 5, "each append minted a distinct snapshot")
    } finally pool.shutdownNow()
    val got = IcebergTable.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === (1 to 5).map(i => (i, s"w$i")).toSet + ((0, "seed")))
    // every snapshot in the chain stays time-travelable
    assert(IcebergTable.snapshotIds(spark, t).size === 6)
  }

  test("stale MOR DELETE vs winner append: serializable REFUSES, snapshot isolation rebases") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    val stale = IcebergTable.snapshot(spark, t) // the DML's read snapshot
    // winner lands between the DML's read and its commit
    IcebergTable.write(spark, Seq((9, "z")).toDF("id", "s"), t)
    val victim = stale.files.head
    // DEFAULT isolation is serializable (Spark-Iceberg's
    // write.delete.isolation-level): the winner's appended rows were
    // never scanned by the predicate — refuse
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.commitMorSnapshot(spark, t, stale,
        rows = Seq((victim.path, 0L)), appendDf = None, operation = "delete")
    }
    assert(e.kind === "ConcurrentAppend")
    // snapshot isolation opts into the rebase
    IcebergTable.setProperties(spark, t,
      Map("write.delete.isolation-level" -> "snapshot"))
    val stale2 = IcebergTable.snapshot(spark, t)
    IcebergTable.write(spark, Seq((10, "y")).toDF("id", "s"), t) // winner 2
    val snapId = IcebergTable.commitMorSnapshot(spark, t, stale2,
      rows = Seq((victim.path, 0L)), appendDf = None, operation = "delete")
    assert(snapId > 0)
    val got = IcebergTable.read(spark, t).as[(Int, String)].collect().toSet
    // both winners' rows SURVIVE the rebased delete
    assert(got.contains((9, "z")) && got.contains((10, "y")))
    assert(got.size === 3) // 4 rows - 1 deleted
  }

  test("COPY-ON-WRITE rebase refuses when a winner added NEW delete files (no resurrection)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    IcebergTable.setProperties(spark, t,
      Map("write.delete.isolation-level" -> "snapshot"))
    val stale = IcebergTable.snapshot(spark, t)
    val victim = stale.files.head
    // winner: a MOR DELETE lands a new delete file on the victim
    IcebergTable.delete(spark, t, col("id") === 1)
    // a COW rewrite staged from the stale snapshot would re-commit the
    // deleted row at a sequence number the winner's delete cannot
    // touch — refuse
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.commitMorSnapshot(spark, t, stale, rows = Seq.empty,
        appendDf = Some(Seq((1, "A")).toDF("id", "s")),
        operation = "overwrite", removePaths = Set(victim.path))
    }
    assert(e.kind === "ConcurrentDeleteDelete")
    // the winner's delete stands
    assert(!IcebergTable.read(spark, t).as[(Int, String)]
      .collect().toSet.contains((1, "a")))
  }

  test("full REPLACE (compaction) against a stale base REFUSES (ConcurrentWrite)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    val stale = IcebergTable.snapshot(spark, t)
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t) // winner
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.commitMorSnapshot(spark, t, stale, rows = Seq.empty,
        appendDf = Some(Seq((1, "a")).toDF("id", "s")),
        operation = "replace", carryExisting = false)
    }
    assert(e.kind === "ConcurrentWrite")
    // the winner's state is intact
    assert(IcebergTable.read(spark, t).count() === 2)
  }

  test("position deletes referencing a concurrently REWRITTEN file refuse") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t)
    val stale = IcebergTable.snapshot(spark, t)
    val victim = stale.files.head
    // winner: compaction rewrites every data file (2 small files → 1)
    IcebergTable.rewriteDataFiles(spark, t)
    assert(IcebergTable.snapshot(spark, t).snapshotId !== stale.snapshotId)
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.commitMorSnapshot(spark, t, stale,
        rows = Seq((victim.path, 0L)), appendDf = None, operation = "delete")
    }
    assert(e.kind === "ConcurrentRewrite")
  }

  test("COPY-ON-WRITE rewriting a concurrently rewritten file refuses") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t)
    val stale = IcebergTable.snapshot(spark, t)
    val victim = stale.files.head
    IcebergTable.rewriteDataFiles(spark, t) // winner: 2 files → 1
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.commitMorSnapshot(spark, t, stale, rows = Seq.empty,
        appendDf = Some(Seq((1, "A")).toDF("id", "s")), operation = "overwrite",
        removePaths = Set(victim.path))
    }
    assert(e.kind === "ConcurrentDeleteDelete")
  }

  test("threaded mixed appends + DML: every outcome is clean commit or clean refusal, never corruption") {
    val t = tmp()
    // seed rows live in their own id range; deletes target ONLY seed
    // rows, appends mint unique positive ids — so the final row set is
    // exactly determined by WHICH operations reported success
    IcebergTable.write(spark,
      (-20 to -1).map(i => (i, s"seed$i")).toDF("id", "s"), t)
    val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val deleted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val jobs = (1 to 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            if (i % 2 == 0) {
              IcebergTable.write(spark, Seq((i, s"w$i")).toDF("id", "s"), t)
              appended.add(i)
            } else {
              val victim = -i // one seed row per deleting thread
              try {
                IcebergTable.delete(spark, t,
                  org.apache.spark.sql.functions.col("id") === victim)
                deleted.add(victim)
              } catch {
                // serializable isolation may refuse a racing append —
                // a CLEAN refusal, never a torn commit
                case _: IcebergTable.CommitConflictException => ()
              }
            }
          }
        })
      }
      start.countDown()
      jobs.foreach(_.get(240, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    import scala.collection.JavaConverters._
    // integrity: metadata parses, snapshot ids unique, reads serve the
    // EXACT set implied by the successful operations
    val ids = IcebergTable.snapshotIds(spark, t)
    assert(ids.toSet.size === ids.size, "snapshot ids are unique")
    val got = IcebergTable.read(spark, t).as[(Int, String)].collect()
    assert(got.length === got.toSet.size, "no duplicated rows")
    val expect = ((-20 to -1).toSet -- deleted.asScala) ++ appended.asScala
    assert(got.map(_._1).toSet === expect,
      s"successful ops: +${appended.asScala.toSeq.sorted} " +
        s"-${deleted.asScala.toSeq.sorted}")
    assert(appended.asScala.size === 4, "every append landed")
  }

  test("table properties and refs SURVIVE appends (rebuilt root carries them)") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    IcebergTable.setProperties(spark, t, Map("owner" -> "graft"))
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t) // append
    assert(IcebergTable.properties(spark, t).get("owner") === Some("graft"))
    IcebergTable.write(spark, Seq((3, "c")).toDF("id", "s"), t,
      overwrite = true) // overwrite keeps properties too
    assert(IcebergTable.properties(spark, t).get("owner") === Some("graft"))
  }

  test("the SAME streaming app replaying an already-committed batch refuses") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t,
      txn = Some(("sink-app", 5L)))
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t,
        txn = Some(("sink-app", 5L)))
    }
    assert(e.kind === "ConcurrentTransaction")
    // a NEWER batch of the same app lands fine
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t,
      txn = Some(("sink-app", 6L)))
    assert(IcebergTable.read(spark, t).count() === 2)
  }
}
