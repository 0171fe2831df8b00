package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Expressions}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{DeltaLog, GraftDeltaTable, GraftIcebergTable, IcebergTable}

/** DSv2 runtime filtering (dynamic partition pruning) on the
  * graft-delta and graft-iceberg scans: join-time `IN` predicates
  * delivered through `SupportsRuntimeV2Filtering` must shrink
  * `planInputPartitions` — at 100 TB this is the difference between
  * scanning one dim-selected day and scanning the whole fact table —
  * and must never change results. */
class RuntimeFilteringSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def inPredicate(col: String, values: Any*): V2Predicate =
    new V2Predicate("IN",
      (Expressions.column(col) +: values.map(v =>
        Expressions.literal(v).asInstanceOf[V2Expr])).toArray)

  /** Total FILES across the planned input partitions (splitFiles
    * packs small files together, so partition count alone can't see
    * pruning). */
  private def plannedFiles(scan: org.apache.spark.sql.connector.read.Scan): Int =
    scan.toBatch.planInputPartitions().map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.length
      case _ => 1
    }.sum

  /** A dim that plans as a real file scan — a filter over a
    * LocalRelation constant-folds away and DPP (correctly) sees no
    * selective filter to reuse. */
  private def parquetDim(rows: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val p = tmp("rf_dim")
    rows.toDF("day", "tag").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def buildScan(t: GraftDeltaTable) =
    t.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
  private def buildScan(t: GraftIcebergTable) =
    t.newScanBuilder(CaseInsensitiveStringMap.empty()).build()

  test("delta scan prunes files on a runtime IN over the partition column") {
    val path = tmp("rf_delta")
    val df = (0 until 400).map(i => (i.toLong, s"p${i % 4}", i * 2L))
      .toDF("id", "p", "v").repartition(4, $"p")
    DeltaLog.write(spark, df, path, partitionBy = Seq("p"))

    val table = new GraftDeltaTable(spark, path)
    val scan = buildScan(table)
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rf.filterAttributes().map(_.fieldNames().mkString) === Array("p"))

    val full = plannedFiles(scan)
    assert(full >= 4, s"expected >=4 files, got $full")
    rf.filter(Array(inPredicate("p", "p1")))
    val pruned = plannedFiles(scan)
    assert(pruned < full, s"runtime IN did not prune: $pruned vs $full")

    // empty IN (join side matched nothing) prunes to zero files
    val scan2 = buildScan(table)
    scan2.asInstanceOf[SupportsRuntimeV2Filtering]
      .filter(Array(new V2Predicate("IN",
        Array[V2Expr](Expressions.column("p")))))
    assert(scan2.toBatch.planInputPartitions().isEmpty)
  }

  test("delta DPP fires end-to-end on a star join and keeps results exact") {
    val path = tmp("rf_delta_e2e")
    val fact = (0 until 2000).map(i => (i.toLong, s"d${i % 10}", i % 97))
      .toDF("id", "day", "v").repartition(10, $"day")
    DeltaLog.write(spark, fact, path, partitionBy = Seq("day"))

    val dim = parquetDim((0 until 10).map(i =>
      (s"d$i", if (i == 3) "pick" else "skip")))
    val factDf = spark.read.format("graft-delta").load(path)
    val joined = factDf.join(dim, "day").where($"tag" === "pick")
    val rows = joined.collect()
    assert(rows.length === 200)
    assert(rows.forall(_.getAs[String]("day") == "d3"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the v2 scan:\n$plan")
  }

  test("iceberg scan prunes identity partitions on a runtime IN") {
    val path = tmp("rf_ice")
    val df = (0 until 400).map(i => (i.toLong, s"p${i % 4}", i * 3L))
      .toDF("id", "p", "v").repartition(4, $"p")
    IcebergTable.write(spark, df, path, partitionBy = Seq("p"))

    val table = new GraftIcebergTable(spark, path)
    val scan = buildScan(table)
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rf.filterAttributes().map(_.fieldNames().mkString) === Array("p"))

    val full = plannedFiles(scan)
    assert(full >= 4, s"expected >=4 files, got $full")
    rf.filter(Array(inPredicate("p", "p2")))
    assert(plannedFiles(scan) < full)
  }

  test("iceberg runtime IN prunes through a HIDDEN bucket transform") {
    val path = tmp("rf_ice_bucket")
    val df = (0 until 400).map(i => (i.toLong, s"k${i % 16}", i * 5L))
      .toDF("id", "k", "v").repartition(8)
    IcebergTable.write(spark, df, path, partitionBy = Seq("bucket(4, k)"))

    val table = new GraftIcebergTable(spark, path)
    val scan = buildScan(table)
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    // hidden partitioning advertises the SOURCE column
    assert(rf.filterAttributes().map(_.fieldNames().mkString) === Array("k"))

    val full = plannedFiles(scan)
    rf.filter(Array(inPredicate("k", "k7")))
    val pruned = plannedFiles(scan)
    assert(pruned < full,
      s"bucket-transform runtime pruning did not shrink the plan: $pruned vs $full")
  }

  test("iceberg DPP fires end-to-end and keeps results exact") {
    val path = tmp("rf_ice_e2e")
    val fact = (0 until 2000).map(i => (i.toLong, s"d${i % 10}", i % 89))
      .toDF("id", "day", "v").repartition(10, $"day")
    IcebergTable.write(spark, fact, path, partitionBy = Seq("day"))

    val dim = parquetDim((0 until 10).map(i =>
      (s"d$i", if (i == 6) "pick" else "skip")))
    val factDf = spark.read.format("graft-iceberg").load(path)
    val joined = factDf.join(dim, "day").where($"tag" === "pick")
    val rows = joined.collect()
    assert(rows.length === 200)
    assert(rows.forall(_.getAs[String]("day") == "d6"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the v2 scan:\n$plan")
  }
}
