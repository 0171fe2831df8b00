package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.dedup.NearDup

class AsOfAndExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("AsOfJoin.lastPrior attaches latest right value at or before left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L))
      .toDF("k", "ts", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 7L),
      (1L, ts("2024-01-01 11:00:00"), 8L),
      (2L, ts("2024-01-01 09:30:00"), 9L)) // after the only left row
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.lastPrior(left, right, "k", "ts", "rid", "prior_rid")
      .orderBy("left_id")
      .select("left_id", "prior_rid").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq((100L, Some(7L)), (101L, Some(8L)), (102L, None)))
  }

  test("AsOfJoin: equal timestamps count as visible (<=)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L)).toDF("k", "ts", "left_id")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("k", "ts", "rid")
    val out = AsOfJoin.lastPrior(left, right, "k", "ts", "rid", "prior_rid")
    assert(out.select("prior_rid").as[Option[Long]].head() === Some(7L))
  }

  test("GraftFunctions.register exposes SQL functions matching the Column API") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d e"), (2L, "x")).toDF("id", "t")
    df.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_simhash(t) AS h, graft_minhash_sig(t) AS sig FROM gf_docs ORDER BY id")
      .collect()
    val viaApi = df
      .select(col("id"), NearDup.simHash(col("t")).as("h"),
        NearDup.minHashSignature(col("t")).as("sig"))
      .orderBy("id").collect()
    assert(viaSql.toSeq.toString === viaApi.toSeq.toString)

    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(d === 11.0)

    val sh = spark.sql("SELECT graft_shingles('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    val shd = spark.sql("SELECT graft_shingles('a b a b a b', 2, true) AS s")
      .as[Seq[String]].head()
    assert(shd === Seq("a b", "b a"))
  }

  test("guardrail check rule rejects partition-less windows when enabled") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val df = Seq((1L, 2.0), (2L, 1.0)).toDF("id", "v")
    val global = df.withColumn("r",
      row_number().over(Window.orderBy("v"))).queryExecution.analyzed
    val partitioned = df.withColumn("r",
      row_number().over(Window.partitionBy("id").orderBy("v")))
      .queryExecution.analyzed
    val guard = GraftGuardrails.check(spark)
    // off by default: both pass
    guard(global); guard(partitioned)
    spark.conf.set("spark.graft.failOnGlobalWindow", "true")
    try {
      val e = intercept[org.apache.spark.sql.AnalysisException](guard(global))
      assert(e.getMessage.contains("partition-less window"))
      guard(partitioned) // partitioned windows stay legal
    } finally spark.conf.unset("spark.graft.failOnGlobalWindow")
  }
}
