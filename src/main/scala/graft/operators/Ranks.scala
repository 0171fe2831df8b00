package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SortableBucketExpr.sortableBucket

/** Exact global / per-group rank WITHOUT a single-reducer window.
  *
  * `row_number() OVER (ORDER BY ...)` (no PARTITION BY) moves the
  * whole table through one task — Spark itself warns "Moving all
  * data to a single partition". This operator computes the identical
  * rank with a two-pass range-bucketed plan that stays parallel:
  *
  *  1. narrow bucket assignment on a FIXED order-preserving value
  *     grid ([[graft.functions.SortableBucketExpr]] — sign, exponent
  *     and top mantissa bits of the double). The grid is a pure
  *     function of the value, so no sampling/boundary-probe job is
  *     needed: the counts pass below discovers the populated buckets
  *     and their boundaries in the SAME job;
  *  2. per-(group, bucket) counts → cumulative offsets (driver fold
  *     for the global case, tiny window over the counts table for
  *     the grouped case);
  *  3. `row_number` within (group, bucket) + bucket offset = the
  *     exact global rank. Each bucket sorts independently — at
  *     100 TB the sort work spreads over populated-buckets × groups
  *     tasks instead of one per group.
  *
  * The result is EXACT for any grid (equal values always share a
  * bucket, and buckets only choose how work is split, never the rank
  * values). The grid being data-independent also makes the split
  * deterministic across runs — there is no approxQuantile wobble.
  * Determinism of the output therefore only requires the usual total
  * order on (orderCols).
  *
  * The offsets table is broadcast: at most 2^(64-shift) rows per
  * group (65k at the default shift). With a very high-cardinality
  * group column prefer a plain window `row_number` partitioned by
  * the group (that is already parallel); this operator is for
  * FEW/NO groups — exactly where the naive window collapses to one
  * reducer.
  */
object Ranks {

  private val B = "__rk_bucket"
  private val OFF = "__rk_off"
  private val CNT = "__rk_cnt"

  /** Fixed-grid bucket assignment for `bucketOn`: an order-preserving
    * pure function of the value (no data pass). Nulls sort first
    * under asc (Spark default) — they get bucket Long.MinValue, below
    * every finite bucket id. */
  private def withBucket(df: DataFrame, bucketOn: String,
                         shift: Int): DataFrame = {
    require(shift >= 32 && shift <= 60, "shift must be in [32, 60]")
    df.withColumn(B, when(col(bucketOn).isNull, lit(Long.MinValue))
      .otherwise(sortableBucket(col(bucketOn).cast("double"), shift)))
  }

  /** Adds `rankCol` (1-based row_number in the total order
    * (partitionCols, orderCols)) and `countCol` (rows per group) to
    * `df`. `bucketOn` must be the leading order column, ascending,
    * numeric (the range-bucketing key). `shift` sets the grid
    * granularity (see [[graft.functions.SortableBucketExpr]]).
    *
    * Two scans of `df` (counts pass + ranked join), both narrow — no
    * persist: at scale, re-reading a columnar scan twice beats
    * caching the whole input, and the bucket id is a single cheap
    * expression. */
  def withExactRank(df: DataFrame, partitionCols: Seq[String],
                    orderCols: Seq[Column], bucketOn: String,
                    rankCol: String, countCol: String,
                    shift: Int = 48): DataFrame = {
    val withB = withBucket(df, bucketOn, shift)
    val counts = withB.groupBy(partitionCols.map(col) :+ col(B): _*)
      .agg(count(lit(1)).as(CNT))
    val offsets: DataFrame =
      if (partitionCols.isEmpty) {
        // global case: the counts table has one row per POPULATED
        // bucket (bounded by the grid, not the data) — fold the
        // cumulative offsets on the driver at plan time (same
        // bounded-collect pattern as the IVF centroids / z-order
        // cuts) instead of a partition-less window that would gather
        // to a single task.
        val cs = counts.collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val n = cs.map(_._2).sum
        val offs = cs.map(_._2).scanLeft(0L)(_ + _)
        val spark = df.sparkSession
        import spark.implicits._
        cs.zipWithIndex.map { case ((b, _), i) => (b, offs(i), n) }
          .toSeq.toDF(B, OFF, countCol)
      } else {
        // grouped case: cumulative offsets via a window over the tiny
        // (groups × buckets) counts table — partitioned by the real
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

  /** Adds `cumCol` — the EXACT running sum of the DECIMAL `valueCol`
    * in the global total order (orderCols) — plus `totalCol` (the
    * grand total), WITHOUT a single-reducer window. Same fixed-grid
    * two-pass as [[withExactRank]]: one job computes per-bucket
    * decimal partial sums, whose cumulative prior-offsets fold on the
    * driver (bounded by the grid, not the data); the in-bucket
    * running sum is a window partitioned per bucket, so the sort
    * work spreads across populated buckets. Exactness comes from
    * decimal arithmetic end-to-end: bucket partials, driver fold
    * (BigDecimal) and the window sum never touch floating point.
    *
    * `ascending` is the direction of the leading (bucketOn) order
    * column; `orderCols` must spell the SAME total order including
    * the direction. */
  def withRunningSum(df: DataFrame, valueCol: String, orderCols: Seq[Column],
                     bucketOn: String, ascending: Boolean,
                     cumCol: String, totalCol: String,
                     shift: Int = 48): DataFrame = {
    val valueScale = df.schema(valueCol).dataType match {
      case dt: org.apache.spark.sql.types.DecimalType => dt.scale
      case other => throw new IllegalArgumentException(
        s"withRunningSum needs a DECIMAL valueCol for exactness; " +
          s"'$valueCol' is $other — fixed-point-scale it upstream")
    }
    val withB = withBucket(df, bucketOn, shift)
    // a bucket whose rows are all NULL in valueCol sums to NULL —
    // fold it as zero (SQL SUM skips nulls)
    val partials = withB.groupBy(col(B)).agg(sum(col(valueCol)).as(CNT)).collect()
      .map(r => (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO)))
    // desc: Ordering.reverse, NOT sortBy(-_) — negating the null
    // bucket id Long.MinValue overflows back to itself, which would
    // put the null bucket FIRST where Spark's desc sorts nulls LAST
    val ordered =
      if (ascending) partials.sortBy(_._1)
      else partials.sortBy(_._1)(Ordering[Long].reverse)
    val total = ordered.map(_._2)
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    val priors = ordered.map(_._2).scanLeft(java.math.BigDecimal.ZERO)(_ add _)
    val spark = df.sparkSession
    import spark.implicits._
    val jB = s"__rs_j_$B"
    val offDf = ordered.zipWithIndex.map { case ((b, _), i) =>
      (b, scala.math.BigDecimal(priors(i)), scala.math.BigDecimal(total))
    }.toSeq.toDF(jB, OFF, totalCol)
      // offsets keep the input's decimal scale — hardcoding a scale
      // would silently round prior-offsets of finer-scaled values
      .select(col(jB), col(OFF).cast(s"decimal(38,$valueScale)").as(OFF),
        col(totalCol).cast(s"decimal(38,$valueScale)").as(totalCol))
    val wIn = Window.partitionBy(col(B)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offDf), col(B) === col(jB))
      .withColumn(cumCol, col(OFF) + sum(col(valueCol)).over(wIn))
      .drop(B, jB, OFF)
  }

  /** Exact order-statistic SELECTION: for each group, the row values
    * of `orderCols` at the requested 1-based rank positions in the
    * total order (partitionCols, orderCols asc) — WITHOUT ranking the
    * whole table. Returns driver-side rows
    * `(partitionCols..., rank, orderCols...)`, one per requested rank
    * (ranks outside [1, n] are silently dropped).
    *
    * Plan shape (the classic two-pass selection, TWO driver actions
    * total): (1) ONE scan aggregating row counts per (group,
    * fixed-grid range bucket) — because the grid is a pure function
    * of the value, this single job yields both the bucket boundaries
    * AND the counts (no separate sampling/approxQuantile probe); the
    * counts table (groups × populated buckets) folds to cumulative
    * offsets on the driver; (2) one scan filtered to ONLY the buckets
    * containing a target rank, with a row_number window partitioned
    * per (group, bucket) over that small slice. The expensive total
    * sort never happens: at 100 TB pass 2 sorts only the cut
    * buckets, in parallel. `ranksOf` maps each group's row count n
    * to its target ranks (e.g. `n => Seq((n + 1) / 2)` for the
    * median).
    *
    * Groups are assumed bounded (the counts table is collected);
    * with very many groups use [[withExactRank]]'s distributed
    * offsets instead. */
  def valuesAtRanks(df: DataFrame, partitionCols: Seq[String],
                    orderCols: Seq[String], bucketOn: String,
                    ranksOf: Long => Seq[Long],
                    shift: Int = 48): Array[org.apache.spark.sql.Row] = {
    // narrow projection of just the rank-relevant columns so both
    // scans prune to (partitionCols ++ orderCols) at the source
    val proj = df.select((partitionCols ++ orderCols).distinct.map(col): _*)
    val withB = withBucket(proj, bucketOn, shift)
    val nG = partitionCols.length
    // action 1 of 2: per-(group, bucket) counts — boundaries and
    // offsets in one job
    val cnts = withB.groupBy((partitionCols :+ B).map(col): _*)
      .agg(count(lit(1)).as(CNT)).collect()
    // (groupKey, bucket, rankWithinBucket, globalRank) per target
    val targets: Seq[(Seq[Any], Long, Long, Long)] =
      cnts.groupBy(r => Seq.tabulate(nG)(r.get)).toSeq.flatMap {
        case (g, rows) =>
          val sorted = rows.map(r => (r.getLong(nG), r.getLong(nG + 1))).sortBy(_._1)
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
    // action 2 of 2: row_number over only the cut-containing buckets
    val hits = withB.filter(needed)
      .withColumn(rn, row_number().over(w).cast("long"))
      .filter(targets.map { case (g, b, rIn, _) =>
        groupCond(g) && col(B) === b && col(rn) === rIn
      }.reduce(_ || _))
      .select((partitionCols :+ B :+ rn).map(col) ++ orderCols.map(col): _*)
      .collect()
    hits.map { r =>
      val g = Seq.tabulate(nG)(r.get)
      val (b, rIn) = (r.getLong(nG), r.getLong(nG + 1))
      val global = targets
        .find(t => t._1 == g && t._2 == b && t._3 == rIn).get._4
      org.apache.spark.sql.Row.fromSeq(
        g ++ Seq(global) ++ orderCols.indices.map(i => r.get(nG + 2 + i)))
    }.sortBy(_.toString) // deterministic order for callers
  }

  /** Exact LOWER weighted quantiles per group: for each percent p in
    * `pcts` (1..100), the smallest value in the (orderCols asc) total
    * order whose running integer weight satisfies 100·cum ≥ p·total.
    * [[valuesAtRanks]] generalized from row counts to weight sums:
    * pass 1 aggregates per-(group, bucket) weights — crossing buckets
    * and in-bucket weight targets for EVERY requested quantile fold
    * on the driver; pass 2 runs one running-weight window over ONLY
    * the union of crossing buckets and resolves each (group, pct)
    * target with a broadcast join against the tiny targets frame (a
    * crossing row may satisfy several quantiles of a small group — the
    * join keeps one output row per target). Weights must be
    * non-negative integral LONGs (fixed-point-scale fractional
    * weights upstream, e.g. cents); groups bounded. Returns rows
    * (partitionCols..., pct, orderCols...), sorted deterministically. */
  def weightedQuantiles(df: DataFrame, partitionCols: Seq[String],
                        orderCols: Seq[String], bucketOn: String,
                        weightCol: String, pcts: Seq[Int],
                        shift: Int = 48): Array[org.apache.spark.sql.Row] = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "pcts must be percents in [1, 100]")
    val spark = df.sparkSession
    val proj = df.select(
      ((partitionCols ++ orderCols) :+ weightCol).distinct.map(col): _*)
    val withB = withBucket(proj, bucketOn, shift)
    val nG = partitionCols.length
    // pass 1 of 2: per-(group, bucket) weight sums
    val sums = withB.groupBy((partitionCols :+ B).map(col): _*)
      .agg(sum(col(weightCol)).as(CNT)).collect()
    // (groupKey, crossing bucket, pct, in-bucket weight target)
    val targets: Seq[(Seq[Any], Long, Int, Long)] =
      sums.groupBy(r => Seq.tabulate(nG)(r.get)).toSeq.flatMap { case (g, rows) =>
        val sorted = rows.map(r => (r.getLong(nG), r.getLong(nG + 1))).sortBy(_._1)
        val total = sorted.map(_._2).sum
        if (total <= 0) Nil
        else {
          val cum = sorted.map(_._2).scanLeft(0L)(_ + _)
          pcts.map { p =>
            // smallest cum with 100*cum >= p*total
            val t = (total * p + 99) / 100
            val bi = sorted.indices.find(i => cum(i) < t && t <= cum(i + 1)).get
            (g, sorted(bi)._1, p, t - cum(bi))
          }
        }
      }
    if (targets.isEmpty) return Array.empty
    def groupCond(g: Seq[Any]): Column =
      partitionCols.zip(g).map { case (c, v) => col(c) <=> lit(v) }
        .foldLeft(lit(true))(_ && _)
    val needed = targets.map { case (g, b, _, _) => groupCond(g) && col(B) === b }
      .distinct.reduce(_ || _)
    val w = Window.partitionBy((partitionCols :+ B).map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rw = "__rk_rw"
    // tiny targets frame: (group..., bucket, pct, in-bucket target)
    val tSchema = org.apache.spark.sql.types.StructType(
      partitionCols.map(c => proj.schema(c).copy(name = "__t_" + c)) ++ Seq(
        org.apache.spark.sql.types.StructField("__t_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pct",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__t_t",
          org.apache.spark.sql.types.LongType)))
    val tRows = targets.map { case (g, b, p, t) =>
      // Seq(b, p, t) alone would widen the Int pct to Long
      org.apache.spark.sql.Row.fromSeq(g ++ Seq[Any](b, p, t)) }
    val tDf = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(tRows).asJava), tSchema)
    // pass 2 of 2: running weight over only the crossing buckets; the
    // crossing row for target t is the unique one with cum >= t and
    // cum - weight < t
    val joinCond = partitionCols.map(c => col(c) <=> col("__t_" + c))
      .foldLeft(col(B) === col("__t_b"))(_ && _) &&
      col(rw) >= col("__t_t") && (col(rw) - col(weightCol)) < col("__t_t")
    val hits = withB.filter(needed)
      .withColumn(rw, sum(col(weightCol)).over(w))
      .join(broadcast(tDf), joinCond)
      .select((partitionCols.map(col) :+ col("pct")) ++ orderCols.map(col): _*)
      .collect()
    hits.sortBy(_.toString)
  }

  /** Exact LOWER weighted median per group — [[weightedQuantiles]] at
    * p=50 (2·cum ≥ total), with the pct column dropped. Returns rows
    * (partitionCols..., orderCols...) like [[valuesAtRanks]]. */
  def weightedMedians(df: DataFrame, partitionCols: Seq[String],
                      orderCols: Seq[String], bucketOn: String,
                      weightCol: String,
                      shift: Int = 48): Array[org.apache.spark.sql.Row] = {
    val nG = partitionCols.length
    weightedQuantiles(df, partitionCols, orderCols, bucketOn, weightCol,
      Seq(50), shift)
      .map { r =>
        org.apache.spark.sql.Row.fromSeq(
          Seq.tabulate(nG)(r.get) ++ orderCols.indices.map(i => r.get(nG + 1 + i)))
      }.sortBy(_.toString)
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
