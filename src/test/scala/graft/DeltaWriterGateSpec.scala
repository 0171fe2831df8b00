package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DeltaLog

/** The WRITER-side protocol gates (PROTOCOL.md §Writer Features):
  * "to write a table, writers must implement and respect ALL features
  * listed in writerFeatures" — so a commit into a foreign table
  * declaring a feature this writer doesn't implement must refuse
  * (reads stay unaffected), `delta.appendOnly=true` forbids data
  * removal, and legacy `delta.invariants` column expressions veto
  * violating commits. */
class DeltaWriterGateSpec extends SparkSpec {
  import spark.implicits._

  private def writeDataFile(table: String, rel: String,
                            df: org.apache.spark.sql.DataFrame): Long = {
    val t = Files.createTempDirectory("graft-wg-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(table, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toFile.length()
  }

  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def commit(table: String, v: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"$v%020d.json"),
      lines.mkString("\n") + "\n")
  }

  private def metaLine(schemaJson: String,
                       conf: Map[String, String] = Map.empty): String = {
    val cfg = conf.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${ujson(k)}:${ujson(v)}" }
      .mkString("{", ",", "}")
    s"""{"metaData":{"id":"t-wg","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":[],"configuration":$cfg,"createdTime":1}}"""
  }

  test("a foreign table declaring an unimplemented writer feature refuses every commit shape but reads fine") {
    val t = Files.createTempDirectory("graft-wg-f").toString
    val sz = writeDataFile(t, "f1.parquet",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["someFutureFeature"]}}""",
      metaLine(schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":5,"dataChange":true}}"""))
    // reads are writer-feature-blind
    assert(DeltaLog.read(spark, t).count() === 2L)
    def refuses(f: => Any): Unit = {
      val e = intercept[UnsupportedOperationException](f)
      assert(e.getMessage.contains("someFutureFeature"), e.getMessage)
    }
    refuses(DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t))
    refuses(DeltaLog.delete(spark, t, col("k") === 1L))
    refuses(DeltaLog.update(spark, t, col("k") === 1L,
      Map("v" -> lit("x"))))
    refuses(DeltaLog.merge(spark, t, Seq((1L, "z")).toDF("k", "v"),
      keyCols = Seq("k")))
    refuses(DeltaLog.optimize(spark, t))
    refuses(DeltaLog.restore(spark, t, versionAsOf = Some(0L)))
    refuses(DeltaLog.addColumns(spark, t,
      Seq(StructField("w", LongType, nullable = true))))
    refuses(DeltaLog.setTableProperties(spark, t, Map("owner" -> "x")))
    // a table on a SUPPORTED feature set commits fine (clusteredTable
    // included: OPTIMIZE lays out by the clustering domain)
    val t2 = Files.createTempDirectory("graft-wg-ok").toString
    val sz2 = writeDataFile(t2, "f1.parquet", Seq((1L, "a")).toDF("k", "v"))
    commit(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","clusteredTable","domainMetadata"]}}""",
      metaLine(schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz2,"modificationTime":5,"dataChange":true}}"""))
    DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), t2)
    assert(DeltaLog.read(spark, t2).count() === 2L)
  }

  test("delta.appendOnly=true: appends land, data removal refuses, OPTIMIZE still compacts, unset lifts the gate") {
    val t = Files.createTempDirectory("graft-wg-ao").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    DeltaLog.setTableProperties(spark, t, Map("delta.appendOnly" -> "true"))
    DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), t)
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    assert(DeltaLog.read(spark, t).count() === 3L)
    def refuses(f: => Any): Unit = {
      val e = intercept[UnsupportedOperationException](f)
      assert(e.getMessage.contains("APPEND-ONLY"), e.getMessage)
    }
    refuses(DeltaLog.delete(spark, t, col("k") === 1L))
    refuses(DeltaLog.update(spark, t, col("k") === 1L, Map("v" -> lit("x"))))
    refuses(DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t,
      overwrite = true))
    refuses(DeltaLog.restore(spark, t, versionAsOf = Some(0L)))
    // OPTIMIZE rearranges bytes without removing rows — legal
    DeltaLog.optimize(spark, t)
    assert(DeltaLog.read(spark, t).count() === 3L)
    // lifting the property restores DML
    DeltaLog.unsetTableProperties(spark, t, Seq("delta.appendOnly"))
    DeltaLog.delete(spark, t, col("k") === 1L)
    assert(DeltaLog.read(spark, t).count() === 2L)
  }

  test("legacy delta.invariants column expressions veto violating commits") {
    val t = Files.createTempDirectory("graft-wg-inv").toString
    val sz = writeDataFile(t, "f1.parquet", Seq((5L, "a")).toDF("k", "v"))
    val inv = new MetadataBuilder().putString("delta.invariants",
      """{"expression":{"expression":"k > 3"}}""").build()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true, inv),
      StructField("v", StringType)))
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["invariants"]}}""",
      metaLine(schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":5,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((2L, "bad")).toDF("k", "v"), t)
    }
    assert(e.getMessage.contains("INVARIANT"), e.getMessage)
    // conforming rows commit
    DeltaLog.write(spark, Seq((7L, "ok")).toDF("k", "v"), t)
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((5L, "a"), (7L, "ok")))
  }
}
