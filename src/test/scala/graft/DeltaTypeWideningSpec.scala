package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DeltaLog

/** Delta TYPE WIDENING (PROTOCOL.md §Type Widening, reader+writer
  * feature `typeWidening`): a data file written before a widening
  * keeps its NARROW physical type; reads up-cast along the sanctioned
  * promotion matrix. Covers the graft DDL
  * ([[DeltaLog.widenColumnType]] + `ALTER COLUMN ... TYPE` SQL),
  * FOREIGN-shaped logs (hand-committed protocol + `delta.typeChanges`
  * metadata), refusal of non-sanctioned recorded changes, and the
  * behavioral no-op reader features `vacuumProtocolCheck` /
  * `checkpointProtection`. */
class DeltaTypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-widen").toString + "/t"

  private def writeDataFile(table: String, rel: String,
                            df: org.apache.spark.sql.DataFrame): Long = {
    val t = Files.createTempDirectory("graft-widen-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(table, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toFile.length()
  }

  private def commit(table: String, v: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"$v%020d.json"),
      lines.mkString("\n") + "\n")
  }

  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def metaLine(schemaJson: String): String =
    s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":[],"configuration":{"delta.enableTypeWidening":"true"},"createdTime":1}}"""

  private def addLine(rel: String, size: Long): String =
    s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,"modificationTime":5,"dataChange":true}}"""

  private def typeChanged(from: String, to: String): Metadata =
    new MetadataBuilder().putMetadataArray("delta.typeChanges",
      Array(new MetadataBuilder().putString("fromType", from)
        .putString("toType", to).build())).build()

  test("widenColumnType int->long: narrow files up-cast at read, appends carry the wide type, protocol + typeChanges recorded") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a"), (2, "b")).toDF("i", "s"), t)
    DeltaLog.widenColumnType(spark, t, "i", LongType)
    val snap = DeltaLog.snapshot(spark, t)
    // schema widened; the change is in the column's metadata
    assert(snap.schema("i").dataType === LongType)
    val tc = snap.schema("i").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length === 1 && tc.head.getString("fromType") === "integer"
      && tc.head.getString("toType") === "long")
    // protocol: (3,7) with typeWidening in BOTH lists
    val (mrv, mwv, rf, wf) = snap.protocol
    assert(mrv === 3 && mwv === 7)
    assert(rf.contains("typeWidening") && wf.contains("typeWidening"))
    // the PRE-widening file still has physical int32; the read
    // up-casts — and a post-widening append writes real longs
    DeltaLog.write(spark, Seq((5000000000L, "c")).toDF("i", "s"), t)
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (5000000000L, "c")))
    // stats-pruned read path serves the same rows
    assert(DeltaLog.readWhere(spark, t, col("i") > 1L)
      .as[(Long, String)].collect().toSet
      === Set((2L, "b"), (5000000000L, "c")))
  }

  test("full sanctioned matrix: float->double, date->timestamp_ntz, decimal growth, byte chain, int->decimal") {
    val t = tmp()
    val df = Seq((1, 1.5f, "2024-01-02", BigDecimal("123.4"), 3))
      .toDF("i", "f", "d", "dec", "b")
      .select(col("i"), col("f"), col("d").cast("date").as("d"),
        col("dec").cast("decimal(5,1)").as("dec"),
        col("b").cast("tinyint").as("b"))
    DeltaLog.write(spark, df, t)
    DeltaLog.widenColumnType(spark, t, "f", DoubleType)
    DeltaLog.widenColumnType(spark, t, "d", TimestampNTZType)
    DeltaLog.widenColumnType(spark, t, "dec", DecimalType(12, 3))
    DeltaLog.widenColumnType(spark, t, "b", ShortType)
    DeltaLog.widenColumnType(spark, t, "b", LongType) // second hop
    DeltaLog.widenColumnType(spark, t, "i", DecimalType(14, 2))
    val r = DeltaLog.read(spark, t)
      .select("i", "f", "d", "dec", "b").collect().head
    assert(r.getDecimal(0) === new java.math.BigDecimal("1.00"))
    assert(r.getDouble(1) === 1.5d)
    assert(r.getAs[java.time.LocalDateTime](2)
      === java.time.LocalDateTime.of(2024, 1, 2, 0, 0))
    assert(r.getDecimal(3) === new java.math.BigDecimal("123.400"))
    assert(r.getLong(4) === 3L)
    // b carries its TWO recorded hops
    val hops = DeltaLog.snapshot(spark, t).schema("b").metadata
      .getMetadataArray("delta.typeChanges")
      .map(m => (m.getString("fromType"), m.getString("toType"))).toSeq
    assert(hops === Seq(("byte", "short"), ("short", "long")))
  }

  test("non-sanctioned promotions refuse at the DDL") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1L, "a", 1.0d)).toDF("l", "s", "dbl"), t)
    def refuse(c: String, to: DataType): Unit = {
      val e = intercept[UnsupportedOperationException] {
        DeltaLog.widenColumnType(spark, t, c, to)
      }
      assert(e.getMessage.contains("not a sanctioned"), e.getMessage)
    }
    refuse("l", IntegerType) // narrowing
    refuse("l", StringType) // cross-family
    refuse("dbl", FloatType) // narrowing
    refuse("s", LongType) // cross-family
    refuse("l", DecimalType(19, 0)) // too narrow for long (needs p-s>=20)
  }

  test("FOREIGN-shaped widened log reads correctly; vacuumProtocolCheck + checkpointProtection honored") {
    val t = Files.createTempDirectory("graft-widen-f").toString
    // data file with NARROW physical types (int32, float, date)
    val narrow = Seq((7, 2.5f)).toDF("i", "f")
      .withColumn("d", lit("2024-03-04").cast("date"))
    val sz = writeDataFile(t, "f1.parquet", narrow)
    // table schema post-widening, typeChanges recorded per column
    val widened = StructType(Seq(
      StructField("i", LongType, nullable = true,
        typeChanged("integer", "long")),
      StructField("f", DoubleType, nullable = true,
        typeChanged("float", "double")),
      StructField("d", TimestampNTZType, nullable = true,
        typeChanged("date", "timestamp_ntz"))))
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening","vacuumProtocolCheck","checkpointProtection"],"writerFeatures":["typeWidening","vacuumProtocolCheck","checkpointProtection"]}}""",
      metaLine(widened.json), addLine("f1.parquet", sz)))
    val got = DeltaLog.read(spark, t).collect().head
    assert(got.getLong(0) === 7L)
    assert(got.getDouble(1) === 2.5d)
    assert(got.getAs[java.time.LocalDateTime](2)
      === java.time.LocalDateTime.of(2024, 3, 4, 0, 0))
    // DML over the narrow file copy-on-writes through the wide schema
    DeltaLog.delete(spark, t, col("i") === 999L)
    assert(DeltaLog.read(spark, t).count() === 1L)
  }

  test("a foreign log recording a NON-sanctioned type change refuses at snapshot resolution") {
    val t = Files.createTempDirectory("graft-widen-bad").toString
    val sz = writeDataFile(t, "f1.parquet", Seq(Tuple1(7L)).toDF("l"))
    val bad = StructType(Seq(
      StructField("l", IntegerType, nullable = true,
        typeChanged("long", "integer")))) // narrowing
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      metaLine(bad.json), addLine("f1.parquet", sz)))
    val e = intercept[UnsupportedOperationException] {
      DeltaLog.snapshot(spark, t)
    }
    assert(e.getMessage.contains("non-sanctioned"), e.getMessage)
    // preview flavor of the feature is honored too
    val t2 = Files.createTempDirectory("graft-widen-p").toString
    val sz2 = writeDataFile(t2, "f1.parquet", Seq(Tuple1(7)).toDF("i"))
    val ok = StructType(Seq(
      StructField("i", LongType, nullable = true,
        typeChanged("integer", "long"))))
    commit(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening-preview"],"writerFeatures":["typeWidening-preview"]}}""",
      metaLine(ok.json), addLine("f1.parquet", sz2)))
    assert(DeltaLog.read(spark, t2).as[Long].collect().toSeq === Seq(7L))
  }

  test("SQL surface: ALTER TABLE ... ALTER COLUMN c TYPE BIGINT routes to widenColumnType") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("i", "s"), t)
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN i TYPE BIGINT").collect()
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema("i").dataType === LongType)
    assert(snap.protocol._3.contains("typeWidening"))
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSeq
      === Seq((1L, "a")))
    // decimal target parses through the same SQL path
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN i TYPE DECIMAL(22, 1)")
      .collect()
    assert(DeltaLog.snapshot(spark, t).schema("i").dataType
      === DecimalType(22, 1))
  }
}
