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
}
