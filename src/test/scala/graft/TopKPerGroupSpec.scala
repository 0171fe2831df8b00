package graft

import scala.util.Random
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator plan path: RewriteTopKPerGroup must
  * replace the row_number-filter idiom with TopKPerGroupExec, and
  * the operator must be value-identical to the window it replaces
  * for any data, k, ordering and partitioning. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)

  private val rows: Seq[(Int, Int, Long)] =
    Seq.fill(500)((rnd.nextInt(13), rnd.nextInt(1000)))
      .zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }

  private def topkDf(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    rows.toDF("g", "v", "id")
      .repartition(7) // arbitrary placement: partial heaps must merge
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("the row_number<=k idiom plans as TopKPerGroupExec, not Window+Sort") {
    val df = topkDf(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // two-phase: a partial exec below the exchange, the final above
    assert("TopKPerGroup".r.findAllIn(plan).length == 2, plan)
  }

  test("operator output equals the window formulation exactly (any k)") {
    for (k <- Seq(1, 3, 10, 600)) {
      val got = topkDf(k).as[(Int, Int, Long, Int)].collect().toSet
      val expected = {
        spark.conf.set("spark.graft.rewrite.topk", "false")
        try topkDf(k).as[(Int, Int, Long, Int)].collect().toSet
        finally spark.conf.set("spark.graft.rewrite.topk", "true")
      }
      assert(got == expected, s"k=$k mismatch")
      assert(got.groupBy(_._1).values.forall(_.size <= k))
    }
  }

  test("kill-switch restores the window plan") {
    spark.conf.set("spark.graft.rewrite.topk", "false")
    try {
      val plan = topkDf(3).queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroup") && plan.contains("Window"))
    } finally spark.conf.set("spark.graft.rewrite.topk", "true")
  }

  test("rn = 1 (latest-per-key idiom) and rn < k also rewrite") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val df = Seq((1, 5, 1L), (1, 9, 2L), (2, 3, 3L)).toDF("g", "v", "id")
    val eq1 = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(eq1.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(eq1.select("g", "v").as[(Int, Int)].collect().toSet
      === Set((1, 9), (2, 3)))
    val lt = df.withColumn("rn", row_number().over(w)).filter(col("rn") < 2)
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(lt.select("g", "v").as[(Int, Int)].collect().toSet
      === Set((1, 9), (2, 3)))
  }

  test("rank() and dense_rank() <= k rewrite with exact tie semantics") {
    // heavy ties: values drawn from a tiny domain so boundary ties
    // are common — rank must keep MORE than k rows when tied at the
    // boundary; dense_rank keeps the k smallest distinct values
    val tied = Seq.fill(400)((rnd.nextInt(7), rnd.nextInt(5)))
      .zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
    for ((fn, name) <- Seq((rank(), "rank"), (dense_rank(), "dense_rank"));
         k <- Seq(1, 2, 4)) {
      val w = Window.partitionBy("g").orderBy(col("v").asc)
      def run() = tied.toDF("g", "v", "id").repartition(5)
        .withColumn("rk", fn.over(w)).filter(col("rk") <= k)
        .as[(Int, Int, Long, Int)].collect().toSet
      val gotPlan = tied.toDF("g", "v", "id").repartition(5)
        .withColumn("rk", fn.over(w)).filter(col("rk") <= k)
      assert(gotPlan.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        s"$name k=$k did not rewrite")
      val got = run()
      val expected = {
        spark.conf.set("spark.graft.rewrite.topk", "false")
        try run()
        finally spark.conf.set("spark.graft.rewrite.topk", "true")
      }
      assert(got == expected, s"$name k=$k mismatch")
    }
  }

  test("graded q_top_orders_per_cust runs on the custom operator") {
    val df = SparkEntry.queries("q_top_orders_per_cust")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(df.count() > 0)
  }

  test("graded q_top_qty_lines runs the dense_rank tie path on the operator") {
    val df = SparkEntry.queries("q_top_qty_lines")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // ties are the point: more rows than 2-per-group, all at rank 1 or 2
    val rows = df.select("l_returnflag", "qty_rank")
      .as[(String, Int)].collect()
    assert(rows.length > 2 * rows.map(_._1).distinct.length)
    assert(rows.forall(r => r._2 == 1 || r._2 == 2))
  }

  test("partial-pass row budget: pass-through fallback stays exact") {
    // budget of 10 retained rows with 13 groups × k=3 forces every
    // partial task over budget mid-stream — remaining rows ship
    // unreduced and the sort-streaming final pass must still be exact
    spark.conf.set("spark.graft.topk.taskRowBudget", "10")
    try {
      val got = topkDf(3).as[(Int, Int, Long, Int)].collect().toSet
      val expected = {
        spark.conf.set("spark.graft.rewrite.topk", "false")
        try topkDf(3).as[(Int, Int, Long, Int)].collect().toSet
        finally spark.conf.set("spark.graft.rewrite.topk", "true")
      }
      assert(got == expected)
    } finally spark.conf.unset("spark.graft.topk.taskRowBudget")
  }

  test("final pass rides a spillable sort, not a heap map") {
    // the final exec declares a (group, order) requiredChildOrdering:
    // EnsureRequirements must plan Spark's spillable SortExec between
    // the exchange and the final TopKPerGroup
    val plan = topkDf(3).queryExecution.executedPlan.toString
    assert(plan.contains("Sort "), s"no sort below the final pass:\n$plan")
  }

  test("multi-expression windows and global windows are left alone") {
    val w = Window.partitionBy("g").orderBy(col("v").asc)
    val df = Seq((1, 5), (1, 9)).toDF("g", "v")
    val multi = df.withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w)).filter(col("rn") <= 1)
    assert(!multi.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val g = Window.orderBy(col("v").asc)
    val global = df.withColumn("rn", row_number().over(g)).filter(col("rn") <= 1)
    assert(!global.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }
}
