package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Vector math runs through [[graft.functions.DotProductExpr]] — a
  * strict left-to-right double-precision loop, bit-equal to DuckDB's
  * `list_inner_product` on double-cast lists (so the oracle can
  * verify rankings exactly) and ~10x faster than the interpreted
  * higher-order-function formulation.
  *
  * Scale path: `lshTopK` buckets vectors by random-hyperplane sign
  * bits so each query only scores its bucket (candidate set ~n/2^b),
  * vs `bruteForceTopK`'s O(n*q) full scan. Norms are computed once
  * per row BEFORE the join — never per candidate pair. The brute
  * force broadcasts the (smaller) query side: the corpus is never
  * shuffled, which is what survives a 100 TB corpus.
  */
object Similarity {

  /** Cast array<float> → array<double> (for callers that need a
    * double array; DotProductExpr upcasts internally). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself when ids collide). Query side
    * is broadcast; ranking via window on (query, score desc, id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id").as("neighbor_id"))
  }

  /** Metadata-filtered cosine top-k — the vector-DB "filtered
    * search": each query ranks ONLY corpus vectors whose `filterCol`
    * equals the query's. Unlike [[bruteForceTopK]]'s documented
    * all-pairs baseline, the metadata equality is part of the JOIN
    * KEY, so the broadcast-hash probe touches only same-key
    * candidates — with a selective filter column the candidate set
    * (and the work) shrinks by the key's selectivity, and at 100 TB
    * a corpus PARTITIONED BY the filter column prunes whole files
    * before the probe. Ranking is the row_number ≤ k idiom, which
    * the TopKPerGroup rewrite executes as the two-phase heap. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   filterCol: String, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(filterCol).as("__cf"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(filterCol).as("__qf"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.join(broadcast(q), col("__cf") === col("__qf"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__qf").as(filterCol), col("rank"),
        col("corpus_id").as("neighbor_id"))
  }

  /** Deterministic ±1 hyperplane components from the portable md5
    * hash of "i:b" — data-independent, computed ONCE at plan time and
    * baked into the plan as literal arrays (zero per-row hashing).
    * The oracle SQL interpolates the same constants. */
  def hyperplaneSigns(dim: Int, b: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      if (graft.functions.PortableHash.baseHash(md, s"$i:$b") % 2 == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nBits` fixed hyperplanes over `dim`-dimensional vectors. */
  def lshBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val plane = array(hyperplaneSigns(dim, b).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: score only within matching buckets. Recall is
    * traded for a ~2^nBits candidate reduction; multi-probe (flip one
    * bit) can be layered on for higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 4, dim: Int = 64,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), toDouble(col(vecCol)).as("__cv"))
      .withColumn("__bucket", lshBucket(col("__cv"), nBits, dim))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"))
      .withColumn("__bucket", lshBucket(col("__qv"), nBits, dim))
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.join(q, "__bucket")
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id").as("neighbor_id"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells`
    * Voronoi cells around centroid vectors, search only the `nProbe`
    * cells nearest each query.
    *
    * Centroids here are the `nCells` corpus vectors with the smallest
    * ids — deterministic and exactly reproducible by the SQL oracle.
    * Production would plug k-means centroids into the same plumbing
    * (the assign/probe plans are identical; only the centroid list
    * changes). Centroids are collected once at plan-build time (tiny:
    * nCells rows) and baked into the plan as literals, so cell
    * assignment is a narrow map — no join, no shuffle — and the only
    * shuffle is the probe join keyed by cell id.
    *
    * Scale: corpus is scored only against queries probing its cell —
    * candidate volume ~ nProbe/nCells of brute force; the corpus side
    * is never re-partitioned beyond the cell-id join. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              trainedCentroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // default centroid rule: the nCells lowest-id corpus vectors
    // (deterministic, oracle-replicable); pass [[kmeansCentroids]]
    // output for production-quality cells — the assign/probe plans
    // are identical, only the literals change
    val centroids: Array[Seq[Double]] = trainedCentroids
      .map(_.map(_.toSeq))
      .getOrElse(corpus
        .select(col(idCol), toDouble(col(vecCol)).as("__v"))
        .orderBy(col(idCol).asc).limit(nCells)
        .collect().map(_.getSeq[Double](1)))
    // cosine against centroid i, with the same expression shape the
    // oracle uses (dot / (norm*norm)) so float results are bit-equal.
    // Centroids enter the plan as ONE array-typed literal (indexed by
    // a foldable element_at, constant-folded back to a per-centroid
    // array before execution — identical runtime math) instead of
    // nCells×dim scalar lit()s: scalar doubles inline into the
    // generated source, so every new centroid set recompiled the
    // whole-stage codegen; array literals ride the references[] slot,
    // the source stays byte-identical across centroid sets, and the
    // Janino cache serves iteration 2+ (measured: the Lloyd-loop gap
    // in ann_ivf_kmeans was plan re-analysis + codegen, not data).
    val centLit = typedlit(centroids.map(_.toIndexedSeq).toIndexedSeq)
    val centNormLit = typedlit(centroids.map(c =>
      math.sqrt(c.map(x => x * x).sum)).toIndexedSeq)
    def centCos(v: Column, vn: Column, i: Int): Column =
      dot(v, element_at(centLit, i + 1)) / (vn * element_at(centNormLit, i + 1))
    // argmax over cells via struct ordering: max cosine, then the
    // SMALLEST cell id on ties (ni = -i, so max ni = min i)
    def bestCells(v: Column, vn: Column, take: Int): Column = {
      val scored = centroids.indices.map(i =>
        struct(centCos(v, vn, i).as("c"), lit(-i).as("ni")))
      slice(reverse(array_sort(array(scored: _*))), 1, take)
    }
    val c = corpus.select(col(idCol).as("corpus_id"), toDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("__cell", -bestCells(col("__cv"), col("__cn"), 1)(0).getField("ni"))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__cell", explode(transform(
        bestCells(col("__qv"), col("__qn"), nProbe), s => -s.getField("ni"))))
    val scored = c.join(q, "__cell")
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id").as("neighbor_id"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — the
    * centroid TRAINING step for [[ivfTopK]] ("production would plug
    * k-means centroids into the same plumbing"). Seeds are the k
    * lowest-id vectors (reproducible); each round is one narrow
    * assignment map against centroid LITERALS (squared euclidean via
    * the codegen'd dot product: |v|^2 - 2 v.c + |c|^2) plus one
    * per-(cell, dim) aggregation (the q_label_centroid shape). Only
    * k x dim doubles cross to the driver per round; the corpus is
    * scanned once per round and never shuffled beyond the tiny agg.
    * Empty cells keep their previous centroid. */
  def kmeansCentroids(vectors: DataFrame, k: Int, iters: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      sumScale: Int = 18): Array[Array[Double]] = {
    val v = vectors.select(col(idCol), toDouble(col(vecCol)).as("__v"))
    var centroids: Array[Array[Double]] = v
      .orderBy(col(idCol).asc).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      // one array-typed literal per round (not k×dim scalar lit()s):
      // keeps the generated source identical across rounds so the
      // codegen cache serves every iteration after the first — see
      // the centLit note in [[ivfTopK]]; element_at of a foldable
      // literal constant-folds, runtime math unchanged
      val centLit = typedlit(centroids.map(_.toIndexedSeq).toIndexedSeq)
      val centSqLit = typedlit(centroids.map(c =>
        c.map(x => x * x).sum).toIndexedSeq)
      def dist2(vc: Column, i: Int): Column =
        dot(vc, vc) - lit(2.0) * dot(vc, element_at(centLit, i + 1)) +
          element_at(centSqLit, i + 1)
      // argmin cell via struct sort: (dist, cell) ascending
      val scored = centroids.indices.map(i =>
        struct(dist2(col("__v"), i).as("d"), lit(i).as("c")))
      val cell = array_sort(array(scored: _*))(0).getField("c")
      // decimal accumulation: double sums depend on partial-merge
      // order (nondeterministic across runs); exact decimal sums make
      // the trained centroids byte-reproducible. `sumScale` sets the
      // decimal scale — pass 10 with 10-digit pre-rounded inputs for
      // CROSS-ENGINE byte equality (a double that is the nearest
      // double of a 10-digit decimal re-rounds to that decimal
      // unambiguously in any engine; scale 18 sits at the binary
      // noise floor and is Spark-reproducible only)
      // the argmin-cell expression must be materialized BELOW the
      // generator: selecting it alongside posexplode would plan it in
      // the Project ABOVE Generate, re-evaluating all k dist2
      // expressions once per exploded element (64x per row)
      val sums = v.select(cell.as("__cell"), col("__v"))
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__cell", "__d")
        .agg(count(lit(1)).as("__n"),
          sum(col("__x").cast(s"decimal(38,$sumScale)")).cast("double").as("__s"))
        .collect()
      val next = centroids.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (c, rows) =>
        rows.foreach { r =>
          next(c)(r.getInt(1)) = r.getDouble(3) / r.getLong(2)
        }
      }
      centroids = next
    }
    require(centroids.forall(_.length == dim))
    centroids
  }

  /** Mean squared distance of every vector to its nearest centroid —
    * the k-means objective, for convergence checks. */
  def kmeansInertia(vectors: DataFrame, centroids: Array[Array[Double]],
                    vecCol: String = "embedding"): Double = {
    val v = toDouble(col(vecCol))
    def dist2(i: Int): Column = {
      val c = centroids(i)
      dot(v, v) - lit(2.0) * dot(v, array(c.map(lit): _*)) +
        lit(c.map(x => x * x).sum)
    }
    val best = array_min(array(centroids.indices.map(dist2): _*))
    vectors.agg(avg(best)).head().getDouble(0)
  }

  /** Embedding-cosine near-dup pairs: all (a < b) pairs with cosine
    * >= threshold. Baseline O(n^2); scale path =
    * [[cosineNearDupPairsLsh]]. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val a = v.select(col(idCol).as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = v.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("__cos", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** LSH-bucketed cosine near-dup pairs — the subquadratic scale
    * path for the cross join above. Candidates are pairs whose
    * hyperplane-sign buckets differ in at most `probeBits` bits
    * (multi-probe: side a probes every bucket within hamming
    * probeBits of its own; probe values are distinct and side b
    * keeps its single bucket, so each qualifying pair matches on
    * exactly ONE probe value — no dedup pass). Every emitted pair
    * passes the exact cosine filter — precision is 1.0; recall is
    * the tunable (more bits = fewer candidates, lower recall;
    * bounded empirically in the spec). */
  def cosineNearDupPairsLsh(vectors: DataFrame, threshold: Double,
                            nBits: Int = 6, probeBits: Int = 2, dim: Int = 64,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val masks: Seq[Long] = (0L until (1L << nBits))
      .filter(m => java.lang.Long.bitCount(m) <= probeBits)
    val v = vectors.select(col(idCol), toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .withColumn("__bucket", lshBucket(col("__v"), nBits, dim))
    val probes = array(masks.map(m => col("__bucket").bitwiseXOR(lit(m))): _*)
    val a = v.select(col(idCol).as("id_a"), col("__v").as("__va"),
        col("__n").as("__na"), explode(probes).as("__probe"))
    val b = v.select(col(idCol).as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"), col("__bucket").as("__probe"))
    a.join(b, "__probe")
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  // ---------------- product quantization (PQ) ----------------

  /** Train per-subspace PQ codebooks: the embedding is split into `m`
    * contiguous subvectors and each subspace gets its own `k`-cell
    * deterministic [[kmeansCentroids]] run. Result: m codebooks of
    * k × (dim/m) doubles — m·k·(dim/m) = k·dim values on the driver,
    * independent of corpus size.
    *
    * Why PQ at 100 TB: a 64-dim float vector is 256 bytes; its PQ
    * code is m bytes (8 here) — a 32× memory cut that turns a
    * petabyte-scale ANN index into something executors hold in RAM,
    * at the cost of approximate (asymmetric-distance) ranking.
    * Candidate generation stays IVF/LSH; PQ compresses the scoring. */
  def pqTrain(vectors: DataFrame, m: Int, k: Int, iters: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = 64, sumScale: Int = 18): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { j =>
      val sliced = vectors.select(col(idCol),
        slice(toDouble(col(vecCol)), j * sub + 1, sub).as("embedding"))
      kmeansCentroids(sliced, k, iters, idCol, "embedding", sumScale)
    }
  }

  /** Per-subspace argmin code (0-based) — the same struct-sort argmin
    * against centroid literals the IVF assignment uses, over the
    * subvector slice. A pure narrow codegen'd expression. */
  private def pqCode(v: Column, codebook: Array[Array[Double]],
                     j: Int, sub: Int): Column = {
    val subv = slice(v, j * sub + 1, sub)
    val scored = codebook.indices.map { c =>
      val cw = codebook(c)
      val c2 = cw.map(x => x * x).sum
      struct((dot(subv, subv) - lit(2.0) * dot(subv, array(cw.map(lit): _*))
        + lit(c2)).as("d"), lit(c).as("c"))
    }
    array_sort(array(scored: _*))(0).getField("c")
  }

  /** Encode the corpus: id + `pq_code` (array of m small ints). */
  def pqEncode(vectors: DataFrame, codebooks: Array[Array[Array[Double]]],
               idCol: String = "vec_id", vecCol: String = "embedding",
               dim: Int = 64): DataFrame = {
    val m = codebooks.length
    val sub = dim / m
    val v = toDouble(col(vecCol))
    val codes = array(Array.tabulate(m)(j => pqCode(v, codebooks(j), j, sub)): _*)
    vectors.select(col(idCol), codes.as("pq_code"))
  }

  /** ADC (asymmetric distance) top-k: raw queries against the
    * PQ-ENCODED corpus. Per (query, code) pair the distance is
    * Σ_j |q_j − codebook_j[code_j]|² — the query side stays exact,
    * only the corpus is quantized (the standard PQ search). The
    * codebook rides into the plan as literal arrays; `element_at`
    * picks each subspace's reconstructed centroid at runtime, so the
    * whole scoring is one codegen'd projection — no shuffle beyond
    * the broadcast of the query side, corpus scanned once.
    *
    * `refine` > 1 adds the standard exact RE-RANK stage: ADC keeps a
    * k·refine shortlist per query (scored on m-byte codes), then the
    * shortlist alone joins back to the raw vectors for exact
    * distances — the shortlist is broadcast, so the corpus-side join
    * is a second narrow scan, never a shuffle. Quantization error
    * then only costs recall when a true neighbor falls outside the
    * shortlist, not when ADC merely mis-orders it. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             dim: Int = 64, refine: Int = 1): DataFrame = {
    val m = codebooks.length
    val sub = dim / m
    val enc = pqEncode(corpus, codebooks, idCol, vecCol, dim)
      .select(col(idCol).as("corpus_id"), col("pq_code"))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("__qv"))
    val dist = (0 until m).map { j =>
      val qj = slice(col("__qv"), j * sub + 1, sub)
      // codebook_j as a literal array-of-arrays; the row's j-th code
      // selects the reconstructed subcentroid (element_at is 1-based)
      val lut = array(codebooks(j).map(cw => array(cw.map(lit): _*)): _*)
      val cj = element_at(lut, col("pq_code")(j).cast("int") + 1)
      dot(qj, qj) - lit(2.0) * dot(qj, cj) + dot(cj, cj)
    }.reduce(_ + _)
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__d2", dist)
    val w = Window.partitionBy("query_id")
      .orderBy(col("__d2").asc, col("corpus_id").asc)
    val adc = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k * refine)
    if (refine <= 1)
      adc.select(col("query_id"), col("rank"), col("corpus_id").as("neighbor_id"))
    else {
      val raw = corpus.select(col(idCol).as("corpus_id"),
        toDouble(col(vecCol)).as("__cv"))
      val exact = dot(col("__qv"), col("__qv")) -
        lit(2.0) * dot(col("__qv"), col("__cv")) +
        dot(col("__cv"), col("__cv"))
      val shortlist = adc.select(col("query_id"), col("__qv"), col("corpus_id"))
      val wx = Window.partitionBy("query_id")
        .orderBy(col("__x2").asc, col("corpus_id").asc)
      raw.join(broadcast(shortlist), "corpus_id")
        .withColumn("__x2", exact)
        .withColumn("rank", row_number().over(wx))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("corpus_id").as("neighbor_id"))
    }
  }
}
