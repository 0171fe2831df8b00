package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DeltaLog

/** Delta VARIANT columns (PROTOCOL.md §Variant Data Type,
  * reader+writer feature `variantType`): schemaString `variant` maps
  * to Spark's VariantType — the same parquet Variant binary encoding
  * — so unshredded variant tables read natively, writes stamp the
  * feature from birth, DML composes, and SHREDDED variant files
  * (`variantShredding[-preview]`) re-assemble through Spark 4's
  * shredded-variant parquet converter. */
class DeltaVariantSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dvar").toString + "/t"

  test("variant column round-trips: CREATE stamps (3,7)+variantType, variant_get works, appends and DML compose") {
    val t = tmp()
    val df = Seq(
      (1L, """{"a": 10, "tags": ["x", "y"]}"""),
      (2L, """{"a": 20, "nested": {"b": true}}"""),
      (3L, """{"a": null}""")
    ).toDF("k", "js").select(col("k"), parse_json(col("js")).as("props"))
    DeltaLog.write(spark, df, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema("props").dataType === VariantType)
    val (mrv, mwv, rf, wf) = snap.protocol
    assert(mrv === 3 && mwv === 7)
    assert(rf.contains("variantType") && wf.contains("variantType"))

    val got = DeltaLog.read(spark, t)
      .select(col("k"), expr("variant_get(props, '$.a', 'bigint')").as("a"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> Some(20L), 3L -> None))

    // append + copy-on-write DELETE both rewrite variant faithfully
    DeltaLog.write(spark,
      Seq((4L, """{"a": 40}""")).toDF("k", "js")
        .select(col("k"), parse_json(col("js")).as("props")), t)
    DeltaLog.delete(spark, t, col("k") === 2L)
    val after = DeltaLog.read(spark, t)
      .select(col("k"), expr("variant_get(props, '$.a', 'bigint')").as("a"))
      .as[(Long, Option[Long])].collect().toMap
    assert(after === Map(1L -> Some(10L), 3L -> None, 4L -> Some(40L)))
  }

  test("FOREIGN-shaped log with a variant column reads; SHREDDED variant files re-assemble") {
    val t = Files.createTempDirectory("graft-dvar-f").toString
    // author the data file with Spark's native variant parquet writer
    val part = Files.createTempDirectory("graft-dvar-part").toString
    spark.sql("""SELECT 7 AS k, parse_json('{"x": 42}') AS v""")
      .coalesce(1).write.mode("overwrite").parquet(part)
    val src = new java.io.File(part).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(src.toPath, Paths.get(t, "f1.parquet"))
    val sz = src.length()
    val schemaJson = StructType(Seq(
      StructField("k", IntegerType),
      StructField("v", VariantType))).json
    def ujson(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def commit(dir: String, lines: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(dir, "_delta_log"))
      Files.writeString(Paths.get(dir, "_delta_log", f"${0L}%020d.json"),
        lines.mkString("\n") + "\n")
    }
    commit(t, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType"],"writerFeatures":["variantType"]}}""",
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":5,"dataChange":true}}"""))
    val got = DeltaLog.read(spark, t)
      .select(col("k"), expr("variant_get(v, '$.x', 'bigint')").as("x"))
      .as[(Int, Long)].collect().toSeq
    assert(got === Seq((7, 42L)))

    // the preview flavor reads too
    val t2 = Files.createTempDirectory("graft-dvar-p").toString
    Files.copy(src.toPath, Paths.get(t2, "f1.parquet"))
    commit(t2, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType-preview"],"writerFeatures":["variantType-preview"]}}""",
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":5,"dataChange":true}}"""))
    assert(DeltaLog.read(spark, t2).count() === 1L)

    // SHREDDED variant (PROTOCOL.md §Variant Shredding): the data
    // file decomposes fields into typed_value subcolumns next to
    // value/metadata; Spark 4's re-assembling parquet converter
    // rebuilds the binary form, so the feature is honored
    val t3 = Files.createTempDirectory("graft-dvar-s").toString
    val shredPart = Files.createTempDirectory("graft-dvar-shred").toString
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    try {
      spark.sql(
        """SELECT k, parse_json(js) AS v FROM VALUES
          | (1, '{"x": 42, "tag": "a"}'),
          | (2, '{"x": 7}'),
          | (3, '{"deep": {"y": true}}') AS t(k, js)""".stripMargin)
        .coalesce(1).write.mode("overwrite").parquet(shredPart)
    } finally {
      spark.conf.unset("spark.sql.variant.writeShredding.enabled")
      spark.conf.unset("spark.sql.variant.inferShreddingSchema")
    }
    val shredSrc = new java.io.File(shredPart).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    // prove the fixture IS shredded: the parquet footer must carry a
    // typed_value group (otherwise this test proves nothing)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(shredSrc.toString))
    assert(footer.getFileMetaData.getSchema.toString.contains("typed_value"),
      s"fixture not shredded:\n${footer.getFileMetaData.getSchema}")
    Files.copy(shredSrc.toPath, Paths.get(t3, "f1.parquet"))
    val schemaJson3 = StructType(Seq(
      StructField("k", IntegerType),
      StructField("v", VariantType))).json
    commit(t3, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType","variantShredding-preview"],"writerFeatures":["variantType","variantShredding-preview"]}}""",
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson3)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":${shredSrc.length()},"modificationTime":5,"dataChange":true}}"""))
    val shredded = DeltaLog.read(spark, t3)
      .select(col("k"),
        expr("variant_get(v, '$.x', 'bigint')").as("x"),
        expr("variant_get(v, '$.tag', 'string')").as("tag"),
        expr("variant_get(v, '$.deep.y', 'boolean')").as("y"))
      .as[(Int, Option[Long], Option[String], Option[Boolean])]
      .collect().toSet
    assert(shredded === Set(
      (1, Some(42L), Some("a"), None),
      (2, Some(7L), None, None),
      (3, None, None, Some(true))))
    // whole-variant reads rebuild the binary form too
    assert(DeltaLog.read(spark, t3)
      .selectExpr("to_json(v)").as[String].collect().toSet
      .exists(_.contains("42")))
  }

  test("ADD COLUMN / schema-evolving append introducing variant upgrades the protocol in the same commit") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "s"), t)
    assert(DeltaLog.snapshot(spark, t).protocol._1 === 1)
    DeltaLog.addColumns(spark, t,
      Seq(StructField("p", VariantType, nullable = true)))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol._1 === 3
      && snap.protocol._3.contains("variantType")
      && snap.protocol._4.contains("variantType"))
    val rows = DeltaLog.read(spark, t).select("k", "p").collect()
    assert(rows.length === 1 && rows.head.isNullAt(1))

    // mergeSchema append on a fresh table introduces the column +
    // the feature atomically
    val t2 = tmp()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "s"), t2)
    DeltaLog.write(spark,
      Seq((2L, "b", """{"q": 9}""")).toDF("k", "s", "js")
        .select(col("k"), col("s"), parse_json(col("js")).as("p")),
      t2, mergeSchema = true)
    val s2 = DeltaLog.snapshot(spark, t2)
    assert(s2.protocol._3.contains("variantType"))
    val m = DeltaLog.read(spark, t2)
      .select(col("k"), expr("variant_get(p, '$.q', 'bigint')").as("q"))
      .as[(Long, Option[Long])].collect().toMap
    assert(m === Map(1L -> None, 2L -> Some(9L)))
  }
}
