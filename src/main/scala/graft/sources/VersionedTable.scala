package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned-table layer over plain parquet — the in-sandbox
  * analog of the Delta tables the reference writes everywhere
  * (reference: bronze_ingestion.py:86, silver_transformation.py:101,
  * gold_transformation.py:56-60,80-85,152-158 — `format("delta")`,
  * MERGE, OPTIMIZE). No Delta/Iceberg jars exist in this
  * environment, so the same capabilities are re-expressed with a
  * commit-file protocol:
  *
  *   table/
  *     _v00000001/  _v00000002/ ...   immutable data snapshots
  *     _c00000001   _c00000002  ...   commit files (the log)
  *     _stage_<uuid>/                 in-flight staged snapshots
  *     _LATEST                        pointer CACHE: probe start
  *
  * Commit (multi-writer safe, Delta-style optimistic concurrency):
  *
  *  1. stage the new snapshot into a UNIQUELY named `_stage_<uuid>`
  *     dir — concurrent writers never touch each other's files;
  *  2. CAS: create the next version's commit file `_cN`
  *     create-EXCLUSIVE (an atomic namenode op on HDFS-like stores;
  *     O_EXCL via java.nio on local files). Its content names the
  *     stage dir. Exactly ONE writer wins version N; the loser
  *     deletes its stage, re-reads the table — now including the
  *     winner's rows — recomputes its content and retries at N+1.
  *     No lost updates, linear history;
  *  3. finish: rename the stage to `_vN` (atomic) and advance the
  *     `_LATEST` pointer cache monotonically. Finishing is
  *     idempotent and ANYONE may do it — a reader that sees a
  *     claimed-but-unfinished commit completes the rename itself, so
  *     a writer crashing between CAS and rename blocks nobody.
  *
  * Readers resolve the version by probing commit files forward from
  * the pointer cache — commit files are the source of truth, the
  * pointer only saves probe steps, so a stale/raced/lost pointer can
  * never expose a wrong version. A crashed writer leaves at most an
  * orphan stage dir (cleaned by vacuum after an age threshold — an
  * IN-FLIGHT writer's stage is always younger).
  *
  * Scale notes: snapshots can be arbitrarily large — the protocol
  * costs one staged write + one commit-file create per commit
  * regardless of data size. `merge` is the SCD1 MERGE analog
  * (O(target) rewrite into a NEW version — the old version stays
  * readable: readers racing the commit are snapshot-isolated).
  * `optimize` rewrites the CURRENT snapshot compacted as a new
  * version — table-service style, fully concurrent with readers of
  * older versions.
  */
object VersionedTable {

  private val PtrName = "_LATEST"
  private val MaxCommitRetries = 20
  /** vacuum deletes unreferenced stage dirs older than this. */
  private val StageOrphanAgeMs = 60L * 60 * 1000

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(table: String, v: Long): String =
    f"$table/_v$v%08d"

  private def commitFile(table: String, v: Long): Path =
    new Path(table, f"_c$v%08d") // %08d widens past 1e8 commits

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  /** Current committed version, 0 if the table does not exist yet.
    * Commit files are authoritative; `_LATEST` is only the probe
    * start (it may lag — it is advanced AFTER the CAS). Unfinished
    * commits found on the way are completed (see [[finishCommit]]). */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    if (!f.exists(new Path(table))) return 0L
    val ptr = new Path(table, PtrName)
    var v =
      if (f.exists(ptr))
        try math.max(0L, readSmall(f, ptr).trim.toLong)
        catch { case _: Throwable => 0L }
      else 0L
    while (f.exists(commitFile(table, v + 1))) {
      finishCommit(spark, table, v + 1)
      v += 1
    }
    v
  }

  /** The commit tag recorded with a version (for exactly-once batch
    * replay detection); None if untagged or not committed. Tags live
    * in the commit file, which is retained even after vacuum. */
  def commitTagOf(spark: SparkSession, table: String, v: Long): Option[String] = {
    val f = fs(spark, table)
    val cf = commitFile(table, v)
    if (v < 1 || !f.exists(cf)) None
    else readSmall(f, cf).split("\n", -1) match {
      case arr if arr.length >= 2 && arr(1).nonEmpty => Some(arr(1))
      case _ => None
    }
  }

  /** How far back tagSeen scans. Commit files are retained forever,
    * so the replay-detection window is bounded explicitly; it only
    * needs to exceed the replay horizon (foreachBatch replays at
    * most the LAST batch — interleaved service commits push it a few
    * versions back at most). */
  private val TagScanBound = 64

  /** Whether `tag` was recorded with any commit in the scan window. */
  private def tagSeen(spark: SparkSession, table: String, cur: Long,
                      tag: String): Boolean = {
    var v = cur
    while (v >= 1 && v > cur - TagScanBound) {
      if (commitTagOf(spark, table, v).contains(tag)) return true
      v -= 1
    }
    false
  }

  /** The CAS: atomically claim version `v` by creating its commit
    * file create-exclusive, content naming the staged snapshot.
    * Returns false if another writer holds `v`. On success the
    * commit is also finished (rename + pointer) before returning.
    * `v` must be currentVersion+1 — versions are claimed in order. */
  private[graft] def tryCommit(spark: SparkSession, table: String, v: Long,
                               stageName: String, tag: Option[String],
                               external: String = ""): Boolean = {
    val f = fs(spark, table)
    val cf = commitFile(table, v)
    val payload =
      (stageName + "\n" + tag.getOrElse("") + "\n" + external).getBytes("UTF-8")
    // the SHARED exclusive-create primitive (AtomicCas: NIO O_EXCL on
    // local filesystems — FileSystem.create(path, false) there is
    // check-then-create, a TOCTOU window — namenode-atomic create on
    // HDFS-likes); Delta and Iceberg commits use the same one
    val created = AtomicCas.createExclusive(f, cf, payload)
    if (created) {
      // winner-only: clear any orphan dir squatting on the target
      // version (a legacy/garbage dir — this protocol itself never
      // writes `_vN` directly). Only the CAS winner may delete here;
      // helpers in finishCommit never remove an existing dir.
      val dir = new Path(versionDir(table, v))
      if (f.exists(dir)) f.delete(dir, true)
      finishCommit(spark, table, v)
    }
    created
  }

  /** Complete a claimed commit — idempotent, and ANYONE may call it
    * (the Delta "anyone can finish the job" property): rename the
    * staged dir into place if still pending, then advance the
    * pointer cache. If both stage and version dir are gone the
    * version was vacuumed; the claim stands. */
  private[graft] def finishCommit(spark: SparkSession, table: String, v: Long): Unit = {
    val f = fs(spark, table)
    val cf = commitFile(table, v)
    if (!f.exists(cf)) return
    val stageName = readSmall(f, cf).split("\n", -1)(0)
    if (stageName.nonEmpty) {
      val stage = new Path(table, stageName)
      val dir = new Path(versionDir(table, v))
      if (!f.exists(dir) && f.exists(stage)) f.rename(stage, dir)
    }
    advancePointer(spark, table, v)
  }

  /** Monotonically advance the `_LATEST` probe-start cache. Races
    * here are harmless: commit files are authoritative and
    * currentVersion probes FORWARD from whatever the pointer says. */
  private def advancePointer(spark: SparkSession, table: String, v: Long): Unit = {
    val f = fs(spark, table)
    val ptr = new Path(table, PtrName)
    val cur =
      if (f.exists(ptr))
        try readSmall(f, ptr).trim.toLong catch { case _: Throwable => 0L }
      else 0L
    if (cur >= v) return
    val tmp = new Path(table, PtrName + "__tmp" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, ptr)) { f.delete(ptr, false); f.rename(tmp, ptr) }
  }

  /** Optimistic-concurrency commit loop: compute content against the
    * current version, stage it uniquely, CAS the next version. A
    * losing writer discards its stage and recomputes against the
    * winner's result. `content` returning None means "already
    * applied, no-op" (replayed tagged batch). */
  private def commitLoop(spark: SparkSession, table: String,
                         tag: Option[String] = None,
                         partitionBy: Seq[String] = Nil)
                        (content: Long => Option[DataFrame]): Long = {
    val f = fs(spark, table)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val cur = currentVersion(spark, table)
      content(cur) match {
        case None => return cur
        case Some(df) =>
          val stageName = "_stage_" + java.util.UUID.randomUUID().toString.take(12)
          val w = df.write.mode(SaveMode.Overwrite)
          (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
            .parquet(s"$table/$stageName")
          if (tryCommit(spark, table, cur + 1, stageName, tag)) return cur + 1
          f.delete(new Path(table, stageName), true) // lost the race
      }
      attempt += 1
    }
    sys.error(s"commit of $table lost $MaxCommitRetries optimistic races; giving up")
  }

  /** Write `df` as the next version. `overwrite=false` appends to the
    * current snapshot's logical content (union semantics, realized as
    * a full new snapshot — plain parquet has no manifest to extend;
    * a production format would add data files + a manifest entry).
    * Multi-writer safe: concurrent appends serialize through the CAS
    * and each recomputes on loss, so no append is lost. */
  def write(df: DataFrame, table: String, overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    commitLoop(spark, table) { cur =>
      Some(if (overwrite || cur == 0) df
           else readVersion(spark, table, cur).unionByName(df))
    }
  }

  /** Partition EVOLUTION (Iceberg-style): commit the next version
    * hive-partitioned on `partitionCols` — each version owns its
    * layout, so a table can change (or drop) its partitioning at any
    * commit without rewriting history, and reads of any version are
    * layout-transparent (`spark.read.parquet` restores partition
    * columns from the directory structure; they surface LAST in the
    * read schema, and their types follow partition-column inference —
    * keep them string/int-stable across layouts). `overwrite=false`
    * appends to the logical content and re-lays-out the whole
    * snapshot, as `write` does. */
  def writeLayout(df: DataFrame, table: String, partitionCols: Seq[String],
                  overwrite: Boolean = false): Long = {
    require(partitionCols.nonEmpty, "writeLayout: no partition columns")
    val spark = df.sparkSession
    commitLoop(spark, table, partitionBy = partitionCols) { cur =>
      Some(if (overwrite || cur == 0) df
           else readVersion(spark, table, cur).unionByName(df))
    }
  }

  /** Read the table at its current version (snapshot-isolated: the
    * version is resolved once, at plan-build time). */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(spark, table))

  /** Schema-evolving append (Delta `mergeSchema` analog): columns
    * present on only one side null-fill on the other, so a producer
    * may add columns without coordinating a rewrite. Plain `write`
    * stays strict — silent widening is usually a bug; evolution is
    * opt-in here, as in Delta. */
  def writeEvolve(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    commitLoop(spark, table) { cur =>
      Some(if (cur == 0) df
           else readVersion(spark, table, cur)
             .unionByName(df, allowMissingColumns = true))
    }
  }

  /** DELETE FROM ... WHERE analog: commits a new version without the
    * matching rows (an O(table) rewrite on plain parquet — a log
    * format would rewrite only the touched files; same API, same
    * snapshot isolation: older versions still hold the rows). */
  def deleteWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column): Long = {
    commitLoop(spark, table) { cur =>
      require(cur >= 1, s"cannot DELETE from empty table $table")
      // strict NULL reading as in writeChecked: a NULL predicate
      // neither matches nor silently drops — it keeps the row
      Some(readVersion(spark, table, cur)
        .where(!coalesce(predicate, lit(false))))
    }
  }

  /** UPDATE ... SET ... WHERE analog: rows matching `predicate` get
    * `assignments` applied; everything else is untouched. Committed
    * as one new version through the same optimistic CAS. */
  def updateWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    commitLoop(spark, table) { cur =>
      require(cur >= 1, s"cannot UPDATE empty table $table")
      val snap = readVersion(spark, table, cur)
      val hit = coalesce(predicate, lit(false))
      assignments.keys.foreach(c =>
        require(snap.columns.contains(c), s"UPDATE of unknown column $c"))
      // ONE projection over the ORIGINAL columns — SQL UPDATE is
      // simultaneous (SET a = b, b = a must swap, not copy) — with
      // each assignment cast back to its column's DECLARED type (an
      // update must never silently widen the table schema)
      Some(snap.select(snap.columns.map { c =>
        assignments.get(c)
          .map(expr => when(hit, expr.cast(snap.schema(c).dataType))
            .otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }.toSeq: _*))
    }
  }

  /** Snapshot path referenced OUTSIDE this table's directory (set by
    * [[cloneShallow]]); None for ordinary staged commits. */
  private def externalPathOf(spark: SparkSession, table: String,
                             v: Long): Option[String] = {
    val f = fs(spark, table)
    val cf = commitFile(table, v)
    if (!f.exists(cf)) None
    else readSmall(f, cf).split("\n", -1) match {
      case arr if arr.length >= 3 && arr(2).nonEmpty => Some(arr(2))
      case _ => None
    }
  }

  /** The directory actually holding version `v`'s data: the local
    * `_vN` snapshot, or — for a shallow-cloned version — the source
    * snapshot the commit file points at. */
  private def versionPath(spark: SparkSession, table: String, v: Long): String = {
    val f = fs(spark, table)
    val dir = versionDir(table, v)
    if (f.exists(new Path(dir))) dir
    else externalPathOf(spark, table, v).getOrElse(dir)
  }

  /** Time travel: read an older committed version (reference Delta
    * `VERSION AS OF` analog). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    require(version >= 1, s"no committed version $version in $table")
    spark.read.parquet(versionPath(spark, table, version))
  }

  /** `TIMESTAMP AS OF` analog: read the last version whose commit
    * landed at or before `tsMillis`. Commit times come from the
    * commit files' filesystem modification time — exactly Delta's
    * rule (per-commit timestamps from the log files), including its
    * caveat that copying a table without preserving mtimes rewrites
    * perceived commit history. */
  def readAsOfTimestamp(spark: SparkSession, table: String,
                        tsMillis: Long): DataFrame = {
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    var chosen = 0L
    var v = 1L
    while (v <= cur) {
      if (f.getFileStatus(commitFile(table, v)).getModificationTime <= tsMillis)
        chosen = v
      v += 1
    }
    require(chosen >= 1,
      s"no version of $table committed at or before $tsMillis")
    readVersion(spark, table, chosen)
  }

  /** Shallow CLONE analog (Delta `CREATE TABLE ... SHALLOW CLONE`):
    * `dst`'s next version is a metadata-only commit whose commit file
    * points at `src`'s current snapshot directory — zero data copied,
    * cost independent of table size. The clone then evolves
    * independently: its next write materializes a full snapshot of
    * its own, and writes to `src` never appear in `dst` (the clone
    * pinned ONE source version). Clone-of-clone chains flatten: the
    * reference always targets a real snapshot dir. Caveat (same as
    * Delta): vacuuming `src` past the referenced version breaks the
    * clone's un-materialized version — clone sources should retain
    * that snapshot. */
  def cloneShallow(spark: SparkSession, src: String, dst: String): Long = {
    val srcV = currentVersion(spark, src)
    require(srcV >= 1, s"cannot shallow-clone $src: no committed version")
    val srcPath = versionPath(spark, src, srcV)
    val f = fs(spark, dst)
    f.mkdirs(new Path(dst))
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val cur = currentVersion(spark, dst)
      if (tryCommit(spark, dst, cur + 1, "", None, external = srcPath))
        return cur + 1
      attempt += 1
    }
    sys.error(s"shallow clone into $dst lost $MaxCommitRetries races; giving up")
  }

  /** MERGE (SCD1 upsert) analog of the reference's Delta
    * `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`: keep the
    * latest row per key between target and updates, commit as a new
    * version. Deterministic last-writer-wins by `versionCol`. */
  /** Keyed WHOLE-ROW upsert (the SQL `MERGE INTO … UPDATE SET * /
    * INSERT *` shape): target rows holding a source key are replaced
    * by the source row, unmatched source rows insert — one new
    * version through the optimistic CAS. Source must be key-unique
    * (counted gate — an ambiguous merge never half-applies). */
  def mergeReplace(updates: DataFrame, table: String,
                   keys: Seq[String]): Long = {
    val spark = updates.sparkSession
    require(keys.nonEmpty, "MERGE with no key columns")
    require(updates.groupBy(keys.map(col): _*).count()
      .where(col("count") > 1).limit(1).count() == 0L,
      "merge source has duplicate keys — aggregate it first")
    commitLoop(spark, table) { cur =>
      Some(if (cur == 0) updates
      else readVersion(spark, table, cur)
        .join(updates.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(updates))
    }
  }

  /** GENERALIZED MERGE — the flexible SQL shapes (conditional /
    * partial-column matched UPDATE, matched DELETE, conditional
    * INSERT) as one committed version of the full-state table.
    * Affected rows are tracked by an exact per-row id, so a matched
    * row whose clause condition is false survives unchanged even when
    * another row shares its key. Expression resolution contract:
    * [[MergeSpec]]. */
  def mergeFlexible(updates: DataFrame, table: String, keys: Seq[String],
                    matched: Seq[MergeSpec.Matched],
                    notMatched: Seq[MergeSpec.NotMatched],
                    bySource: Seq[MergeSpec.NotMatchedBySource] = Seq.empty,
                    extraOn: Option[org.apache.spark.sql.Column] = None): Long = {
    val spark = updates.sparkSession
    import MergeSpec.SrcPrefix
    require(keys.nonEmpty, "MERGE with no key columns")
    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "MERGE with no clauses")
    require(updates.groupBy(keys.map(col): _*).count()
      .where(col("count") > 1).limit(1).count() == 0L,
      "merge source has duplicate keys — aggregate it first")
    // ordered clauses, first-match-wins (standard SQL MERGE)
    val mc = Option(matched).filter(_.nonEmpty).map(MergeSpec.ofMatched)
    val bsc = Option(bySource).filter(_.nonEmpty).map(MergeSpec.ofBySource)
    val nmc = Option(notMatched).filter(_.nonEmpty).map(MergeSpec.ofNotMatched)
    def insertProjection(unmatchedSrc: DataFrame,
                         outCols: Seq[String]): DataFrame = {
      val c = nmc.get
      unmatchedSrc.where(c.any)
        .select(outCols.map(n => c.value(n, col(n)).as(n)): _*)
    }
    commitLoop(spark, table) { cur =>
      Some {
        if (cur == 0)
          // first commit DEFINES the schema: expression inserts name
          // the target columns, INSERT * adopts the source's
          nmc.map(_ => insertProjection(updates,
            notMatched.find(_.assignments.nonEmpty)
              .map(_.assignments.map(_._1))
              .getOrElse(updates.columns.toSeq)))
            .getOrElse(updates.limit(0))
        else {
          val t = graft.Caches.tracked(readVersion(spark, table, cur)
            .withColumn("__rid", monotonically_increasing_id()))
          val tableCols = t.columns.toSeq.filterNot(_ == "__rid")
          val srcRen = updates.select(updates.columns.toSeq.map(c =>
            col(c).as(SrcPrefix + c)): _*)
          // non-equi residual ON conjuncts ride the equality join
          val joinCond = extraOn.foldLeft(
            keys.map(k => col(k) === col(SrcPrefix + k)).reduce(_ && _))(
            _ && _)
          val affected = mc match {
            case Some(c) => t.join(srcRen, joinCond, "inner").where(c.any)
            case None => t.join(srcRen, joinCond, "inner").limit(0)
          }
          val bsAffected: Option[DataFrame] = bsc.map(c =>
            (extraOn match {
              case None => t.join(
                updates.select(keys.map(col): _*).distinct(),
                keys, "left_anti")
              case Some(_) => t.join(srcRen, joinCond, "left_anti")
            }).where(c.any))
          val allRids = bsAffected
            .map(b => affected.select("__rid").unionByName(b.select("__rid")))
            .getOrElse(affected.select("__rid"))
          val kept = t.join(allRids, Seq("__rid"), "left_anti").drop("__rid")
          val updated: Option[DataFrame] = mc.filter(_.hasUpdate).map { c =>
            affected.where(!c.isDelete).select(tableCols.map(n =>
              c.value(n, col(n)).as(n)): _*)
          }
          val bsUpdated: Option[DataFrame] =
            bsc.filter(_.hasUpdate).zip(bsAffected).map { case (c, bsa) =>
              bsa.where(!c.isDelete).select(tableCols.map(n =>
                c.value(n, col(n)).as(n)): _*)
            }
          val inserts: Option[DataFrame] = nmc.map { _ =>
            val unmatchedSrc = extraOn match {
              case None => updates.join(
                t.select(keys.map(col): _*).distinct(), keys, "left_anti")
              case Some(_) => srcRen.join(t, joinCond, "left_anti")
                .select(updates.columns.toSeq.map(c =>
                  col(SrcPrefix + c).as(c)): _*)
            }
            insertProjection(unmatchedSrc, tableCols)
          }
          (Seq(kept) ++ updated.toSeq ++ bsUpdated.toSeq ++ inserts.toSeq)
            .reduce(_.unionByName(_))
        }
      }
    }
  }

  def merge(updates: DataFrame, table: String, keys: Seq[String],
            versionCol: String): Long = {
    val spark = updates.sparkSession
    commitLoop(spark, table) { cur =>
      Some(if (cur == 0) updates
           else graft.operators.Dedup.keepLatest(
             readVersion(spark, table, cur).unionByName(updates), keys, versionCol))
    }
  }

  /** Additive MERGE (incremental aggregation): per key, SUM the
    * `sumCols` of the current snapshot and the (possibly
    * unaggregated) update rows, commit as a new version — the
    * maintained-gold-table pattern (running counts/revenue) without
    * reprocessing history. Use exact-additive column types
    * (long/decimal): double sums would drift with merge order. */
  def mergeAggregate(updates: DataFrame, table: String, keys: Seq[String],
                     sumCols: Seq[String],
                     commitTag: Option[String] = None): Long = {
    val spark = updates.sparkSession
    def agg(df: DataFrame): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(sum(col(sumCols.head)).as(sumCols.head),
          sumCols.tail.map(c => sum(col(c)).as(c)): _*)
    commitLoop(spark, table, commitTag) { cur =>
      // exactly-once under at-least-once replay: additive merges are
      // NOT idempotent, so a batch tag rides inside the atomically
      // created commit file — a replayed batch whose tag appears in
      // the scan window is a no-op. The check re-runs on every
      // optimistic retry, so a racing duplicate of the same batch
      // cannot double-apply either.
      if (commitTag.isDefined && tagSeen(spark, table, cur, commitTag.get)) None
      else Some(
        if (cur == 0) agg(updates)
        else agg(readVersion(spark, table, cur)
          .select((keys ++ sumCols).map(col): _*)
          .unionByName(updates.select((keys ++ sumCols).map(col): _*))))
    }
  }

  /** RESTORE analog (Delta `RESTORE TABLE ... VERSION AS OF v`):
    * re-commit the CONTENT of an older committed version as a NEW
    * version. History stays linear and append-only — nothing is
    * rewound, so concurrent readers, time travel to intermediate
    * versions, and the tag ledger are all unaffected; a concurrent
    * writer racing the restore serializes through the CAS like any
    * other commit. Fails if the source version was vacuumed. */
  def restore(spark: SparkSession, table: String, toVersion: Long): Long = {
    commitLoop(spark, table) { cur =>
      require(toVersion >= 1 && toVersion <= cur,
        s"cannot restore $table to $toVersion (current $cur)")
      require(fs(spark, table).exists(new Path(versionPath(spark, table, toVersion))),
        s"version $toVersion of $table was vacuumed; cannot restore")
      if (toVersion == cur) None // already that content — no-op
      else Some(readVersion(spark, table, toVersion))
    }
  }

  /** A named row-level CHECK constraint (Delta
    * `ALTER TABLE ADD CONSTRAINT ... CHECK` analog): `predicate` must
    * hold on EVERY row of the post-commit snapshot. */
  final case class Check(name: String, predicate: org.apache.spark.sql.Column)

  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** `write` with CHECK enforcement: validates the WHOLE would-be
    * snapshot (current content + incoming rows under append) before
    * the CAS — a violating batch commits NOTHING, like a Delta write
    * into a constrained table. Validation is ONE combinable
    * aggregation (a sum of violation flags per constraint) over the
    * candidate content, re-run on every optimistic retry so a racing
    * writer can never sneak a violating merge through. NULL predicate
    * results count as violations (ANSI CHECK treats NULL as pass;
    * data-pipeline DQ wants the strict reading — a null-valued row
    * slipping a `price > 0` gate is exactly the bug being guarded). */
  def writeChecked(df: DataFrame, table: String, checks: Seq[Check],
                   overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    commitLoop(spark, table) { cur =>
      val content =
        if (overwrite || cur == 0) df
        else readVersion(spark, table, cur).unionByName(df)
      val aggs = checks.map(c =>
        sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
          .as(c.name))
      val counts = content.agg(aggs.head, aggs.tail: _*).collect()(0)
      checks.zipWithIndex.foreach { case (c, i) =>
        val bad = counts.getLong(i)
        if (bad > 0) throw new ConstraintViolationException(
          s"CHECK constraint '${c.name}' violated by $bad row(s); commit of $table aborted")
      }
      Some(content)
    }
  }

  /** OPTIMIZE as a table service: rewrite the current snapshot into
    * `nFiles` files (optionally range-clustered on `clusterCols` for
    * min/max data skipping) and commit it as a new version — readers
    * of any committed version are never disturbed, and a concurrent
    * writer beating the service to the CAS simply makes the service
    * recompact the newer snapshot on retry. */
  def optimize(spark: SparkSession, table: String, nFiles: Int,
               clusterCols: Seq[String] = Nil): Long = {
    commitLoop(spark, table) { cur =>
      require(cur >= 1, s"cannot optimize empty table $table")
      val data = readVersion(spark, table, cur)
      Some(if (clusterCols.isEmpty) data.coalesce(nFiles)
           else Layout.clusterBy(data, nFiles, clusterCols: _*))
    }
  }

  /** `OPTIMIZE ... ZORDER BY` as a table service (the reference runs
    * exactly this on its Delta gold tables,
    * gold_transformation.py:160): rewrite the current snapshot
    * Z-ORDER-clustered on `cols` as a new version, so file-level
    * min/max stats prune reads on ANY of the Z columns (pair with
    * [[collectStats]] + [[prunedRead]]). */
  def optimizeZorder(spark: SparkSession, table: String, nFiles: Int,
                     cols: Seq[String], bits: Int = 8): Long = {
    commitLoop(spark, table) { cur =>
      require(cur >= 1, s"cannot optimize empty table $table")
      Some(Layout.zorderBy(readVersion(spark, table, cur), nFiles, cols, bits))
    }
  }

  /** VACUUM analog: drop snapshot dirs older than `keepVersions`
    * behind the current version (bounds storage; time travel then
    * reaches only the retained window — commit files stay, so
    * history/tags survive). Also sweeps orphan stage dirs left by
    * crashed LOSERS, age-guarded so an in-flight writer's stage is
    * never touched. */
  def vacuum(spark: SparkSession, table: String, keepVersions: Int = 2): Unit = {
    val cur = currentVersion(spark, table)
    val f = fs(spark, table)
    if (!f.exists(new Path(table))) return
    var v = cur - keepVersions
    while (v >= 1 && f.exists(new Path(versionDir(table, v)))) {
      f.delete(new Path(versionDir(table, v)), true)
      if (f.exists(statsFile(table, v))) f.delete(statsFile(table, v), false)
      v -= 1
    }
    f.listStatus(new Path(table))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_stage_"))
      .filter(s => System.currentTimeMillis() - s.getModificationTime > StageOrphanAgeMs)
      .foreach(s => f.delete(s.getPath, true))
  }

  // ---------------- data skipping (per-file column stats) ----------------

  private def statsFile(table: String, v: Long): Path =
    new Path(table, f"_t$v%08d")

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Collect per-file min/max stats for `cols` of version `v` into a
    * sidecar `_tN` file — the in-sandbox analog of the per-file stats
    * a Delta log / Iceberg manifest records at commit time. ONE cheap
    * metadata-shaped job (`groupBy(input_file_name())` — map-side
    * combinable, one row per file). Stats are an OPTIMIZATION only:
    * a missing/partial sidecar just disables skipping, never
    * correctness. Call after `write`/`merge`/`optimize`; typically on
    * a snapshot range-clustered by `optimize(clusterCols=...)`, which
    * is what makes min/max ranges disjoint and skipping effective. */
  def collectStats(spark: SparkSession, table: String, v: Long,
                   cols: Seq[String]): Unit = {
    val data = readVersion(spark, table, v)
    // min/max in the column's NATIVE type (numeric order for
    // numerics), rendered to string only for serialization —
    // aggregating the cast would give lexicographic bounds and prune
    // wrong files
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val rows = data.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per data file of one version
    val sb = new StringBuilder
    rows.foreach { r =>
      val fileName = r.getString(0).split('/').last
      cols.foreach { c =>
        val mn = Option(r.getAs[String](s"__min_$c"))
        val mx = Option(r.getAs[String](s"__max_$c"))
        // all-null files carry no range — recorded as absent (kept
        // conservatively by every prune)
        if (mn.isDefined && mx.isDefined)
          sb.append(s"${enc(fileName)}\t${enc(c)}\t${enc(mn.get)}\t${enc(mx.get)}\n")
      }
    }
    val f = fs(spark, table)
    val out = f.create(statsFile(table, v), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Data-skipping read: version `v`'s files whose [min,max] range
    * for `column` intersects [lo,hi] — files provably outside the
    * range are never opened. Numeric bounds compare numerically,
    * anything else lexicographically (ISO dates order correctly).
    * The residual `BETWEEN` filter stays in the plan (file pruning is
    * file-granular, not row-granular), so the result is identical to
    * an unpruned scan+filter even with stale/missing stats. */
  def prunedRead(spark: SparkSession, table: String, column: String,
                 lo: Any, hi: Any, version: Long = -1L): DataFrame = {
    val v = if (version >= 1) version else currentVersion(spark, table)
    val f = fs(spark, table)
    val dir = new Path(versionPath(spark, table, v))
    val all = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val sfp = statsFile(table, v)
    val numeric = lo.isInstanceOf[Number] && hi.isInstanceOf[Number]
    val ranges: Map[String, (String, String)] =
      if (!f.exists(sfp)) Map.empty
      else readSmall(f, sfp).split("\n").filter(_.nonEmpty).flatMap { line =>
        line.split("\t", -1) match {
          case Array(file, c, mn, mx) if dec(c) == column =>
            Some(dec(file) -> (dec(mn), dec(mx)))
          case _ => None
        }
      }.toMap
    def overlaps(mn: String, mx: String): Boolean =
      if (numeric)
        try {
          val (l, h) = (lo.asInstanceOf[Number].doubleValue(),
            hi.asInstanceOf[Number].doubleValue())
          mx.toDouble >= l && mn.toDouble <= h
        } catch { case _: NumberFormatException => true } // conservative
      else mx >= lo.toString && mn <= hi.toString
    val kept = all.filter { p =>
      ranges.get(p.getName) match {
        case Some((mn, mx)) => overlaps(mn, mx)
        case None => true // no stats for this file — must read it
      }
    }
    val residual = col(column).between(lit(lo), lit(hi))
    if (kept.isEmpty)
      readVersion(spark, table, v).where(residual).limit(0)
    else
      spark.read.parquet(kept.map(_.toString): _*).where(residual)
  }

  // ---------------- CDC: version-diff changes read ----------------

  /** Change-data-feed analog: the row-level diff between two
    * committed versions, tagged `insert` / `delete` in a
    * `_change_type` column (an update appears as delete+insert, as in
    * Delta CDF without column-level diffing). Plain-parquet snapshots
    * carry no per-commit file diff, so this is an exceptAll in both
    * directions — two hash shuffles over the two snapshots. A
    * production format reads the commit log's file-level diff
    * instead; the API (and its consumers) stay the same. */
  def changes(spark: SparkSession, table: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion >= 0 && toVersion >= fromVersion,
      s"bad change range [$fromVersion, $toVersion]")
    def snap(v: Long): Option[DataFrame] =
      if (v == 0) None else Some(readVersion(spark, table, v))
    (snap(fromVersion), snap(toVersion)) match {
      case (None, None) => sys.error("empty change range on empty table")
      case (None, Some(b)) => b.withColumn("_change_type", lit("insert"))
      case (Some(_), None) => sys.error("toVersion predates fromVersion")
      case (Some(a), Some(b)) =>
        b.exceptAll(a).withColumn("_change_type", lit("insert"))
          .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
    }
  }

  /** Incremental consumption (the poll-based analog of a Delta
    * streaming source reading the change feed): the row-level changes
    * committed AFTER `lastVersion`, plus the version the consumer is
    * carried to. A consumer loop persists the returned version as its
    * offset and applies the `_change_type`-tagged rows to its
    * downstream state — exactly-once replication when the apply and
    * the offset commit are atomic on the consumer side (the same
    * contract a checkpointed streaming source gives its sink). A full
    * DataSourceV2 MicroBatchStream would expose this as
    * `readStream.format(...)`; the per-batch work is identical. */
  def syncChanges(spark: SparkSession, table: String,
                  lastVersion: Long): (Long, Option[DataFrame]) = {
    val cur = currentVersion(spark, table)
    if (cur <= lastVersion) (cur, None)
    else (cur, Some(changes(spark, table, lastVersion, cur)))
  }

  /** Committed version history (from the retained snapshot dirs):
    * (version, n_files, total_bytes) — DESCRIBE HISTORY analog. */
  def history(spark: SparkSession, table: String): DataFrame = {
    val sess = spark
    import sess.implicits._
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    (1L to cur).flatMap { v =>
      val p = new Path(versionPath(spark, table, v))
      if (!f.exists(p)) None
      else {
        val files = f.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        Some((v, files.length.toLong, files.map(_.getLen).sum))
      }
    }.toDF("version", "n_files", "total_bytes")
  }
}
