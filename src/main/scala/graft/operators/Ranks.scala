package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact global / per-group rank WITHOUT a single-reducer window.
  *
  * `row_number() OVER (ORDER BY ...)` (no PARTITION BY) moves the
  * whole table through one task — Spark itself warns "Moving all
  * data to a single partition". This operator computes the identical
  * rank with a two-pass range-bucketed plan that stays parallel:
  *
  *  1. approxQuantile on the leading order column → ~`nBuckets`
  *     boundary values (plan-time, tiny driver-side list — same
  *     pattern as the IVF centroids / z-order cuts);
  *  2. narrow bucket assignment by boundary comparison (all ties of
  *     a boundary value land in the SAME bucket, so the secondary
  *     order columns only ever break ties within one bucket);
  *  3. per-(group, bucket) counts → cumulative offsets via a window
  *     over the tiny counts table (nBuckets × groups rows);
  *  4. `row_number` within (group, bucket) + bucket offset = the
  *     exact global rank. Each bucket sorts independently — at
  *     100 TB the sort work spreads over `nBuckets` × groups tasks
  *     instead of one per group.
  *
  * The result is EXACT for any boundary set (boundaries only choose
  * how work is split, never the rank values), so approxQuantile's
  * approximation — and any run-to-run wobble in it — cannot change
  * the output. Determinism of the output therefore only requires
  * the usual total order on (orderCols).
  *
  * The offsets table is broadcast: it has nBuckets rows per group.
  * With a very high-cardinality group column prefer a plain window
  * `row_number` partitioned by the group (that is already parallel);
  * this operator is for FEW/NO groups — exactly where the naive
  * window collapses to one reducer.
  */
object Ranks {

  private val B = "__rk_bucket"
  private val OFF = "__rk_off"
  private val CNT = "__rk_cnt"

  /** Range-bucket assignment for `bucketOn`: boundaries from
    * approxQuantile (actual data values; the 1% error only skews
    * bucket balance, never rank correctness — all ties of a boundary
    * value land in the same bucket). Nulls sort first under asc
    * (Spark default) — they get bucket -1. */
  private def withBucket(df: DataFrame, bucketOn: String,
                         nBuckets: Int): DataFrame = {
    require(nBuckets > 1, "nBuckets must be > 1")
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = df.stat.approxQuantile(bucketOn, probes, 0.01).distinct.sorted
    val bucketExpr = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((bnd, i), acc) => when(col(bucketOn) < bnd, lit(i)).otherwise(acc)
    }
    df.withColumn(B, when(col(bucketOn).isNull, lit(-1)).otherwise(bucketExpr))
  }

  /** Adds `rankCol` (1-based row_number in the total order
    * (partitionCols, orderCols)) and `countCol` (rows per group) to
    * `df`. `bucketOn` must be the leading order column, ascending,
    * numeric (the range-bucketing key). */
  def withExactRank(df: DataFrame, partitionCols: Seq[String],
                    orderCols: Seq[Column], bucketOn: String,
                    rankCol: String, countCol: String,
                    nBuckets: Int = 32): DataFrame = {
    // the bucketed frame feeds BOTH the counts pass and the final
    // ranked join — persist it so the source is scanned once and the
    // bucket comparison chain evaluates once (cache lives with the
    // returned plan; callers may drop it via catalog/unpersist)
    val withB = withBucket(df, bucketOn, nBuckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = withB.groupBy(partitionCols.map(col) :+ col(B): _*)
      .agg(count(lit(1)).as(CNT))
    val offsets: DataFrame =
      if (partitionCols.isEmpty) {
        // global case: the counts table is ≤ nBuckets+1 rows — fold
        // the cumulative offsets on the driver at plan time (same
        // bounded-collect pattern as the IVF centroids / z-order
        // cuts) instead of a partition-less window that would gather
        // to a single task.
        val cs = counts.collect()
          .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val n = cs.map(_._2).sum
        val offs = cs.map(_._2).scanLeft(0L)(_ + _)
        val spark = df.sparkSession
        import spark.implicits._
        cs.zipWithIndex.map { case ((b, _), i) => (b, offs(i), n) }
          .toSeq.toDF(B, OFF, countCol)
      } else {
        // grouped case: cumulative offsets via a window over the tiny
        // (groups × nBuckets) counts table — partitioned by the real
        // group columns, so the partitionSpec is never empty
        val grp = partitionCols.map(col)
        val wOff = Window.partitionBy(grp: _*).orderBy(col(B).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.partitionBy(grp: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        counts
          .withColumn(OFF, coalesce(sum(col(CNT)).over(wOff), lit(0L)))
          .withColumn(countCol, sum(col(CNT)).over(wTot))
          .drop(CNT)
      }
    val joinKeys = partitionCols :+ B
    val wIn = Window.partitionBy(joinKeys.map(col): _*).orderBy(orderCols: _*)
    // null-safe (<=>) join: a null GROUP value must still receive its
    // rank — a USING join would silently drop the whole null group
    val renamed = joinKeys.foldLeft(offsets)((d, c) =>
      d.withColumnRenamed(c, s"__rk_j_$c"))
    val cond = joinKeys.map(c => col(c) <=> col(s"__rk_j_$c")).reduce(_ && _)
    withB.join(broadcast(renamed), cond)
      .withColumn(rankCol, col(OFF) + row_number().over(wIn).cast("long"))
      .drop(joinKeys.map(c => s"__rk_j_$c"): _*)
      .drop(B, OFF)
  }

  /** Exact order-statistic SELECTION: for each group, the row values
    * of `orderCols` at the requested 1-based rank positions in the
    * total order (partitionCols, orderCols asc) — WITHOUT ranking the
    * whole table. Returns driver-side rows
    * `(partitionCols..., rank, orderCols...)`, one per requested rank
    * (ranks outside [1, n] are silently dropped).
    *
    * Plan shape (the classic two-pass selection): (1) one scan
    * aggregating row counts per (group, range-bucket) — the counts
    * table (groups × nBuckets rows) folds to cumulative offsets on
    * the driver; (2) one scan filtered to ONLY the buckets containing
    * a target rank, with a row_number window partitioned per
    * (group, bucket) over that small slice. The expensive total sort
    * never happens: at 100 TB pass 2 sorts ~1/nBuckets of each
    * group, in parallel. `ranksOf` maps each group's row count n to
    * its target ranks (e.g. `n => Seq((n + 1) / 2)` for the median).
    *
    * Groups are assumed bounded (the counts table is collected);
    * with very many groups use [[withExactRank]]'s distributed
    * offsets instead. */
  def valuesAtRanks(df: DataFrame, partitionCols: Seq[String],
                    orderCols: Seq[String], bucketOn: String,
                    ranksOf: Long => Seq[Long],
                    nBuckets: Int = 32): Array[org.apache.spark.sql.Row] = {
    // one scan of the source, three consumers: the narrow projection
    // of just the rank-relevant columns is persisted, so the boundary
    // probe (approxQuantile, which materializes the cache), the
    // counts pass and the bucket-filtered selection pass all read the
    // same cached columnar blocks instead of re-scanning the source.
    // The cache holds only (partitionCols ++ orderCols) — a few
    // numeric/string columns, spilling to disk past memory — and is
    // dropped before returning (this method is eager end-to-end).
    val proj = df.select((partitionCols ++ orderCols).distinct.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try valuesAtRanksOn(proj, partitionCols, orderCols, bucketOn, ranksOf, nBuckets)
    finally proj.unpersist(false)
  }

  private def valuesAtRanksOn(df: DataFrame, partitionCols: Seq[String],
                              orderCols: Seq[String], bucketOn: String,
                              ranksOf: Long => Seq[Long],
                              nBuckets: Int): Array[org.apache.spark.sql.Row] = {
    val withB = withBucket(df, bucketOn, nBuckets)
    val nG = partitionCols.length
    val cnts = withB.groupBy((partitionCols :+ B).map(col): _*)
      .agg(count(lit(1)).as(CNT)).collect()
    // (groupKey, bucket, rankWithinBucket, globalRank) per target
    val targets: Seq[(Seq[Any], Int, Long, Long)] =
      cnts.groupBy(r => Seq.tabulate(nG)(r.get)).toSeq.flatMap {
        case (g, rows) =>
          val sorted = rows.map(r => (r.getInt(nG), r.getLong(nG + 1))).sortBy(_._1)
          val n = sorted.map(_._2).sum
          val cum = sorted.map(_._2).scanLeft(0L)(_ + _)
          ranksOf(n).distinct.filter(rk => rk >= 1 && rk <= n).map { rk =>
            val bi = sorted.indices.find(i => cum(i) < rk && rk <= cum(i + 1)).get
            (g, sorted(bi)._1, rk - cum(bi), rk)
          }
      }
    if (targets.isEmpty) return Array.empty
    def groupCond(g: Seq[Any]): Column =
      partitionCols.zip(g).map { case (c, v) => col(c) <=> lit(v) }
        .foldLeft(lit(true))(_ && _)
    val needed = targets.map { case (g, b, _, _) => groupCond(g) && col(B) === b }
      .reduce(_ || _)
    val w = Window.partitionBy((partitionCols :+ B).map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
    val rn = "__rk_rn"
    val hits = withB.filter(needed)
      .withColumn(rn, row_number().over(w).cast("long"))
      .filter(targets.map { case (g, b, rIn, _) =>
        groupCond(g) && col(B) === b && col(rn) === rIn
      }.reduce(_ || _))
      .select((partitionCols :+ B :+ rn).map(col) ++ orderCols.map(col): _*)
      .collect()
    hits.map { r =>
      val g = Seq.tabulate(nG)(r.get)
      val (b, rIn) = (r.getInt(nG), r.getLong(nG + 1))
      val global = targets
        .find(t => t._1 == g && t._2 == b && t._3 == rIn).get._4
      org.apache.spark.sql.Row.fromSeq(
        g ++ Seq(global) ++ orderCols.indices.map(i => r.get(nG + 2 + i)))
    }.sortBy(_.toString) // deterministic order for callers
  }

  /** ntile(k)-equivalent bucket id from an exact rank: the first
    * (n mod k) buckets take ceil(n/k) rows, the rest floor(n/k) —
    * identical to SQL NTILE over the same total order. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast("long")           // rows per small bucket
    val rem = n % k                                 // buckets with base+1
    val cut = (base + 1) * rem                      // ranks in big buckets
    when(rank <= cut, floor((rank - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + floor((rank - cut - 1) / base).cast("long") + 1)
  }
}
