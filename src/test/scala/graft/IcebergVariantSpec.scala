package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.IcebergTable

/** Iceberg v3 VARIANT type (spec v3 §Semi-structured types): the
  * schema JSON's `variant` primitive maps to Spark's VariantType —
  * the same Parquet Variant binary encoding — so variant-bearing v3
  * tables read natively, `variant_get` path extraction works over
  * them, writes round-trip, and the type stays refused below v3. */
class IcebergVariantSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("icevariant").toString + "/t"

  test("variant column round-trips: CREATE births a v3 table, reads serve variant_get paths") {
    val t = tmp()
    val df = Seq(
      (1L, """{"a": 10, "tags": ["x", "y"]}"""),
      (2L, """{"a": 20, "nested": {"b": true}}"""),
      (3L, """{"a": null}""")
    ).toDF("k", "js").select(col("k"), parse_json(col("js")).as("props"))
    IcebergTable.write(spark, df, t)

    // CREATE with a variant column births format-version 3 (the spec
    // gates the type on v3) with row lineage active
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        IcebergTable.snapshot(spark, t).tablePath.stripPrefix("file:") +
          "/metadata/v1.metadata.json")), "UTF-8")
    assert(meta.contains("\"format-version\" : 3") ||
      meta.contains("\"format-version\":3"))
    assert(meta.contains("variant"))
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.rowLineage)
    assert(snap.schema("props").dataType ===
      org.apache.spark.sql.types.VariantType)

    // read + typed path extraction
    val got = IcebergTable.read(spark, t)
      .select(col("k"),
        expr("variant_get(props, '$.a', 'bigint')").as("a"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> Some(20L), 3L -> None))

    // appends keep working; DSv2 catalog-path scan serves it too
    IcebergTable.write(spark,
      Seq((4L, """{"a": 40}""")).toDF("k", "js")
        .select(col("k"), parse_json(col("js")).as("props")), t)
    val viaDsv2 = spark.read.format("graft-iceberg").load(t)
      .select(col("k"), expr("variant_get(props, '$.a', 'bigint')").as("a"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaDsv2(4L) === Some(40L) && viaDsv2(1L) === Some(10L))
  }

  test("foreign-shaped v3 metadata declaring `variant` reads; MOR DELETE over a variant table serves survivors") {
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, """{"n": 1}"""), (2L, """{"n": 2}"""), (3L, """{"n": 3}"""))
        .toDF("k", "js")
        .select(col("k"), parse_json(col("js")).as("v")), t)
    // row-level DML composes with the variant read path (DV commit)
    IcebergTable.delete(spark, t, col("k") === 2L)
    val got = IcebergTable.read(spark, t)
      .select(col("k"), expr("variant_get(v, '$.n', 'int')").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 3L -> 3))
  }

  test("SHREDDED variant data files re-assemble through both read paths (spec v3 §Variant shredding)") {
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, """{"x": 42, "tag": "a"}"""))
        .toDF("k", "js").select(col("k"), parse_json(col("js")).as("v")), t)
    // append a SHREDDED file the way an ecosystem writer would: the
    // parquet carries per-field typed_value subcolumns
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    try IcebergTable.write(spark,
      Seq((2L, """{"x": 7}"""), (3L, """{"deep": {"y": true}}"""))
        .toDF("k", "js").select(col("k"), parse_json(col("js")).as("v")), t)
    finally {
      spark.conf.unset("spark.sql.variant.writeShredding.enabled")
      spark.conf.unset("spark.sql.variant.inferShreddingSchema")
    }
    // prove at least one data file IS shredded (typed_value group)
    val snap = IcebergTable.snapshot(spark, t)
    val shredded = snap.files.exists { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        spark.sparkContext.hadoopConfiguration,
        new org.apache.hadoop.fs.Path(f.path))
      footer.getFileMetaData.getSchema.toString.contains("typed_value")
    }
    assert(shredded, "no shredded data file in the fixture")
    val want = Map(1L -> Some(42L), 2L -> Some(7L), 3L -> None)
    assert(IcebergTable.read(spark, t)
      .select(col("k"), expr("variant_get(v, '$.x', 'bigint')").as("x"))
      .as[(Long, Option[Long])].collect().toMap === want)
    assert(spark.read.format("graft-iceberg").load(t)
      .select(col("k"), expr("variant_get(v, '$.x', 'bigint')").as("x"))
      .as[(Long, Option[Long])].collect().toMap === want)
  }

  test("variant refuses below v3: ADD COLUMN on a v2 table is loud; unknown types still refuse") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "s"), t)
    val ex = intercept[IllegalArgumentException] {
      IcebergTable.addColumns(spark, t, Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.VariantType, nullable = true)))
    }
    assert(ex.getMessage.contains("format-version 3"))
    // after the upgrade the add works and reads null-filled
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.addColumns(spark, t, Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.VariantType, nullable = true)))
    val rows = IcebergTable.read(spark, t).select("k", "p").collect()
    assert(rows.length === 1 && rows.head.isNullAt(1))
  }
}
