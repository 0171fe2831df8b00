package graft

import java.nio.file.Files

import graft.sources.IcebergTable

/** Storage-partitioned joins (Spark v2 bucketing over the
  * graft-iceberg scan's KeyGroupedPartitioning): two tables laid out
  * with the same bucket/identity transform join with NO shuffle on
  * either side — the single biggest cost a co-designed layout deletes
  * at 100 TB. Bucket transforms resolve through [[GraftCatalog]]'s
  * FunctionCatalog leg (the spec murmur3); identity resolves without
  * a catalog. Keyed planning is double-opt-in
  * (`spark.sql.sources.v2.bucketing.enabled` +
  * `spark.sql.graft.preserveDataGrouping`) so ordinary scans keep
  * byte-split parallelism. */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("spj").toString

  private def withSpj[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.graft.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket-co-partitioned catalog tables join with no shuffle, exact rows") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.graft_spj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_spj.root", root)
    val left = (0 until 200).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 200 by 2).map(i => (i.toLong, i * 3)).toDF("k", "rv")
    IcebergTable.write(spark, left, s"$root/ns/a",
      partitionBy = Seq("bucket(4, k)"))
    IcebergTable.write(spark, right, s"$root/ns/b",
      partitionBy = Seq("bucket(4, k)"))
    withSpj {
      val j = spark.table("graft_spj.ns.a")
        .join(spark.table("graft_spj.ns.b"), "k")
      val rows = j.collect()
      assert(rows.length === 100)
      assert(rows.forall(r => r.getAs[Int]("rv") === r.getAs[Long]("k") * 3))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free storage-partitioned join:\n$plan")
    }
  }

  test("identity-partitioned aggregation needs no shuffle either") {
    val t = tmp() + "/t"
    val df = (0 until 300).map(i => (s"p${i % 5}", i.toLong)).toDF("p", "v")
    IcebergTable.write(spark, df, t, partitionBy = Seq("p"))
    withSpj {
      val agg = spark.read.format("graft-iceberg").load(t)
        .groupBy("p").sum("v")
      val expect = df.groupBy("p").sum("v").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free aggregation over identity partitions:\n$plan")
    }
  }

  test("without the graft opt-in the scan keeps split planning") {
    val t = tmp() + "/t"
    IcebergTable.write(spark,
      (0 until 50).map(i => (i.toLong, s"p${i % 2}")).toDF("k", "p"), t,
      partitionBy = Seq("p"))
    val table = new graft.sources.GraftIcebergTable(spark, t)
    val scan = table.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val part = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportPartitioning]
      .outputPartitioning()
    assert(part.isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning])
  }

  test("runtime (DPP) filters keep every key group so the reported partitioning stays valid") {
    val t = tmp() + "/t"
    IcebergTable.write(spark,
      (0 until 100).map(i => (i.toLong, s"p${i % 4}")).toDF("k", "p"), t,
      partitionBy = Seq("p"))
    withSpj {
      val table = new graft.sources.GraftIcebergTable(spark, t)
      val scan = table.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
      val full = scan.toBatch.planInputPartitions()
      assert(full.length === 4)
      assert(full.forall(
        _.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]))
      scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
        .filter(Array(new org.apache.spark.sql.connector.expressions.filter.Predicate(
          "IN", Array[org.apache.spark.sql.connector.expressions.Expression](
            org.apache.spark.sql.connector.expressions.Expressions.column("p"),
            org.apache.spark.sql.connector.expressions.Expressions.literal("p1")))))
      val filtered = scan.toBatch.planInputPartitions()
      // same GROUPS (the reported partitioning must stay valid), but
      // pruned groups are now empty
      assert(filtered.length === 4)
      val files = filtered.map {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.length
        case _ => -1
      }
      assert(files.count(_ == 0) === 3, s"expected 3 pruned groups: ${files.toSeq}")
    }
  }
}
