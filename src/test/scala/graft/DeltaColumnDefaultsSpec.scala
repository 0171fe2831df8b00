package graft

import java.nio.file.Files

import graft.sources.DeltaLog

/** Delta COLUMN DEFAULTS (PROTOCOL.md "Column Defaults", writer table
  * feature `allowColumnDefaults`): CREATE TABLE … DEFAULT binds the
  * value in column metadata + protocol, ALTER COLUMN SET/DROP DEFAULT
  * edits it, and appends OMITTING the column write the default —
  * write-time semantics (existing rows never change). */
class DeltaColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("ddefault").toString

  test("CREATE TABLE DEFAULT: omitted column fills; protocol carries the feature") {
    val t = tmp()
    spark.sql(s"CREATE TABLE '$t' (k BIGINT, src STRING DEFAULT 'web', " +
      "score BIGINT DEFAULT 7) USING delta")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol._2 === 7)
    assert(snap.protocol._4.contains("allowColumnDefaults"))

    // append omitting BOTH defaulted columns
    DeltaLog.write(spark, Seq(1L, 2L).toDF("k"), t)
    // append carrying one of them explicitly
    DeltaLog.write(spark, Seq((3L, "api")).toDF("k", "src"), t)
    val got = DeltaLog.read(spark, t)
      .select("k", "src", "score").as[(Long, String, Long)]
      .collect().toSet
    assert(got === Set((1L, "web", 7L), (2L, "web", 7L), (3L, "api", 7L)))
  }

  test("ALTER COLUMN SET DEFAULT applies to later appends only; DROP DEFAULT stops the fill") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1L, "a", 10L)).toDF("k", "v", "n"), t)
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN n SET DEFAULT 99")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol._4.contains("allowColumnDefaults"))
    // existing rows unchanged; a later omitting append fills 99
    DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val got = DeltaLog.read(spark, t)
      .select("k", "n").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 99L))

    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN n DROP DEFAULT")
    // without a default the omitting append refuses (shape gate)
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t)
    }
    // expression defaults evaluate (not just literals)
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN n SET DEFAULT 40 + 2")
    DeltaLog.write(spark, Seq((4L, "d")).toDF("k", "v"), t)
    assert(DeltaLog.read(spark, t).where("k = 4")
      .select("n").as[Long].collect().toSeq === Seq(42L))
  }

  test("defaults refuse on generated/identity columns and non-Delta flavors") {
    val t = tmp()
    spark.sql(s"CREATE TABLE '$t' (k BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2)) USING delta")
    intercept[IllegalArgumentException] {
      DeltaLog.setColumnDefault(spark, t, "twice", Some("5"))
    }
    // DEFAULT + GENERATED in one definition refuses at parse
    val t2 = tmp()
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE '$t2' (k BIGINT, " +
        "b BIGINT GENERATED ALWAYS AS (k) DEFAULT 5) USING delta")
    }
    // non-Delta CREATE with DEFAULT refuses
    val t3 = tmp()
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE '$t3/t' (k BIGINT, s STRING DEFAULT 'x') " +
        "USING iceberg")
    }
  }

  test("DEFAULT before NOT NULL parses both (regression: constraint swallowed into the default text)") {
    val t = tmp()
    spark.sql(s"CREATE TABLE '$t' (k BIGINT, " +
      "s STRING DEFAULT 'web' NOT NULL, n BIGINT NOT NULL DEFAULT 7) " +
      "USING delta")
    val snap = graft.sources.DeltaLog.snapshot(spark, t)
    assert(!snap.schema("s").nullable && !snap.schema("n").nullable)
    assert(snap.schema("s").metadata.getString(
      graft.sources.DeltaLog.ColumnDefaultKey) === "'web'")
    assert(snap.schema("n").metadata.getString(
      graft.sources.DeltaLog.ColumnDefaultKey) === "7")
    DeltaLog.write(spark, Seq(1L).toDF("k"), t)
    assert(DeltaLog.read(spark, t).select("k", "s", "n")
      .as[(Long, String, Long)].collect().toSeq === Seq((1L, "web", 7L)))
  }

  test("foreign NESTED CURRENT_DEFAULT metadata refuses loudly at write (never silently unfilled)") {
    import org.apache.spark.sql.functions.{col, struct}
    val t = tmp()
    DeltaLog.write(spark, Seq((1L, 10L)).toDF("k", "g1")
      .select(col("k"), struct(col("g1")).as("s")), t)
    // splice a nested default the way an out-of-spec foreign writer
    // might: CURRENT_DEFAULT on the struct's INNER field
    val snap = DeltaLog.snapshot(spark, t)
    val sInner = org.apache.spark.sql.types.StructField("g2",
      org.apache.spark.sql.types.LongType, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString(graft.sources.DeltaLog.ColumnDefaultKey, "5").build())
    val newSchema = org.apache.spark.sql.types.StructType(Seq(
      snap.schema("k"),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StructType(
          snap.schema("s").dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType]
            .fields :+ sInner))))
    // commit the evolved schema the foreign way: a metaData-only
    // version-1 JSON carrying the out-of-spec nested default
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val v0 = java.nio.file.Paths.get(t, "_delta_log",
      "00000000000000000000.json")
    val md = new String(java.nio.file.Files.readAllBytes(v0), "UTF-8")
      .split("\n").map(M.readTree).find(_.has("metaData")).get
      .get("metaData")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    md.put("schemaString", newSchema.json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", "00000000000000000001.json"),
      (s"""{"metaData":${md.toString}}""" + "\n").getBytes("UTF-8"))
    val ex = intercept[UnsupportedOperationException] {
      DeltaLog.write(spark,
        Seq((2L, 20L, 5L)).toDF("k", "g1", "g2")
          .select(col("k"), struct(col("g1"), col("g2")).as("s")), t)
    }
    assert(ex.getMessage.contains("NESTED"))
  }
}
