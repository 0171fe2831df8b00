package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production-lifecycle SQL surface: `SHOW CREATE TABLE` reverse-DDL
  * that ROUND-TRIPS through the CREATE TABLE grammar for all three
  * flavors, `DESCRIBE EXTENDED`, and `mergeSchema` appends (the
  * option-driven Delta schema evolution most users actually use). */
class LifecycleSqlSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-lifecycle").toString + "/t"

  private def showCreate(t: String): String =
    spark.sql(s"SHOW CREATE TABLE '$t'").head.getString(0)

  test("SHOW CREATE TABLE round-trips a partitioned, property-bearing, generated-column Delta table") {
    val t = tmp()
    spark.sql(s"""CREATE TABLE '$t' (
      |  id BIGINT NOT NULL,
      |  ds STRING,
      |  amount DOUBLE,
      |  amount2 DOUBLE GENERATED ALWAYS AS (amount * 2)
      |) USING delta PARTITIONED BY (ds)
      |TBLPROPERTIES ('owner' = 'graft', 'delta.appendOnly' = 'false')
      |""".stripMargin).collect()
    val stmt = showCreate(t)
    assert(stmt.contains("USING delta"))
    assert(stmt.contains("PARTITIONED BY (ds)"))
    assert(stmt.contains("GENERATED ALWAYS AS (amount * 2)"))
    assert(stmt.contains("'owner' = 'graft'"))
    assert(stmt.contains("NOT NULL"))
    // ROUND TRIP: the emitted DDL re-creates an equivalent table
    val t2 = tmp()
    spark.sql(stmt.replace(s"'$t'", s"'$t2'")).collect()
    val a = DeltaLog.snapshot(spark, t)
    val b = DeltaLog.snapshot(spark, t2)
    assert(a.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      b.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
    assert(a.partitionColumns === b.partitionColumns)
    assert(b.configuration.get("owner") === Some("graft"))
    assert(b.schema("amount2").metadata
      .getString(DeltaLog.GenerationExprKey) === "amount * 2")
  }

  test("SHOW CREATE TABLE round-trips a hidden-partitioned Iceberg table") {
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1, java.sql.Date.valueOf("2024-03-01"), "x"))
        .toDF("id", "d", "s"), t,
      partitionBy = Seq("bucket(4, id)", "days(d)"))
    IcebergTable.setProperties(spark, t, Map("owner" -> "graft"))
    val stmt = showCreate(t)
    assert(stmt.contains("USING iceberg"))
    assert(stmt.toLowerCase.contains("bucket(4, id)"))
    assert(stmt.contains("'owner' = 'graft'"))
    val t2 = tmp()
    spark.sql(stmt.replace(s"'$t'", s"'$t2'")).collect()
    val snap2 = IcebergTable.snapshot(spark, t2)
    assert(snap2.schema.fieldNames.toSeq === Seq("id", "d", "s"))
    assert(IcebergTable.properties(spark, t2).get("owner") === Some("graft"))
    // the created table takes hidden-partitioned appends under the
    // SAME spec the DDL declared
    IcebergTable.write(spark,
      Seq((2, java.sql.Date.valueOf("2024-03-02"), "y"))
        .toDF("id", "d", "s"), t2,
      partitionBy = IcebergTable.defaultSpecNames(spark, t2))
    assert(IcebergTable.read(spark, t2).count() === 1L)
  }

  test("SHOW CREATE TABLE round-trips a versioned table") {
    val t = tmp()
    VersionedTable.write(Seq((1, "a")).toDF("id", "s"), t)
    val stmt = showCreate(t)
    assert(stmt.contains("USING versioned"))
    val t2 = tmp()
    spark.sql(stmt.replace(s"'$t'", s"'$t2'")).collect()
    assert(VersionedTable.readVersion(spark, t2,
      VersionedTable.currentVersion(spark, t2)).schema.fieldNames.toSeq ===
      Seq("id", "s"))
  }

  test("DESCRIBE EXTENDED lists columns plus the detailed section (constraints visible)") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    DeltaLog.addCheckConstraint(spark, t, "pos_id", "id > 0")
    val rows = spark.sql(s"DESCRIBE EXTENDED '$t'").collect()
    val byName = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("id") === "int")
    assert(byName("s") === "string")
    assert(byName("Format") === "delta")
    assert(byName("Num Rows") === "1")
    assert(byName("Properties").contains("delta.constraints.pos_id=id > 0"))
  }

  test("mergeSchema append widens the table; plain append still refuses") {
    val t = tmp()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    // plain append of a wider frame refuses
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((2, "b", 9.5)).toDF("id", "s", "score"), t)
    }
    // the evolving append lands data + widened metaData in ONE commit
    val v = DeltaLog.write(spark,
      Seq((2, "b", 9.5)).toDF("id", "s", "score"), t, mergeSchema = true)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "s", "score"))
    assert(snap.schema("score").nullable, "new columns are nullable")
    val got = DeltaLog.read(spark, t)
      .as[(Int, String, Option[Double])].collect().toSet
    assert(got === Set((1, "a", None), (2, "b", Some(9.5))))
    // time travel serves the PRE-evolution schema
    assert(DeltaLog.snapshot(spark, t, versionAsOf = Some(v - 1))
      .schema.fieldNames.toSeq === Seq("id", "s"))
    // a frame OMITTING existing columns appends under mergeSchema too
    DeltaLog.write(spark, Seq((3, 1.5)).toDF("id", "score"), t,
      mergeSchema = true)
    val got2 = DeltaLog.read(spark, t)
      .select("id", "s", "score").where(col("id") === 3)
      .as[(Int, Option[String], Option[Double])].collect().toSet
    assert(got2 === Set((3, None, Some(1.5))))
    // type conflicts refuse
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((4, 7)).toDF("id", "score"), t,
        mergeSchema = true) // score int vs double
    }
  }

  test("OPTIMIZE purges deletion vectors: rows drop physically, old versions still DV-served") {
    val t = tmp()
    DeltaLog.write(spark,
      (1 to 100).map(i => (i, s"r$i")).toDF("id", "s"), t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    val dvV =
      try DeltaLog.delete(spark, t, col("id") % 10 === 0)
      finally spark.conf.unset("spark.graft.dv.enabled")
    val withDv = DeltaLog.snapshot(spark, t)
    assert(withDv.files.exists(_.dv.exists(_.cardinality > 0L)),
      "the delete landed as a deletion vector")
    val expect = DeltaLog.read(spark, t).count()
    val ov = DeltaLog.optimize(spark, t)
    val after = DeltaLog.snapshot(spark, t)
    // real OPTIMIZE semantics: no DV descriptors survive, row set same
    assert(after.files.forall(_.dv.forall(_.cardinality == 0L)))
    assert(DeltaLog.read(spark, t).count() === expect)
    // the pre-OPTIMIZE version still serves through its DV
    assert(DeltaLog.readSnapshot(spark,
      DeltaLog.snapshot(spark, t, versionAsOf = Some(ov - 1))).count()
      === expect)
  }

  test("RESTORE Iceberg TIMESTAMP AS OF resolves through the snapshot log") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    val ts1 = IcebergTable.snapshot(spark, t).timestampMs
    Thread.sleep(20)
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    val v = spark.sql(s"RESTORE TABLE '$t' TO TIMESTAMP AS OF '" +
      fmt.format(new java.util.Date(ts1)) + "'").collect()
    assert(IcebergTable.read(spark, t).count() === 1L)
  }

  test("CALL graft.system.* procedures drive the maintenance surface") {
    val t = tmp()
    IcebergTable.write(spark, (1 to 50).map(i => (i, s"r$i")).toDF("id", "s"), t)
    IcebergTable.write(spark, (51 to 100).map(i => (i, s"r$i")).toDF("id", "s"), t)
    IcebergTable.delete(spark, t, col("id") % 9 === 0)
    IcebergTable.delete(spark, t, col("id") % 11 === 0)
    val expect = IcebergTable.read(spark, t).count()
    // delete-file compaction via CALL
    spark.sql(s"CALL graft.system.rewrite_position_delete_files('$t')")
      .collect()
    assert(IcebergTable.snapshot(spark, t).deletes.size === 1)
    assert(IcebergTable.read(spark, t).count() === expect)
    // tag + rollback via CALL
    val cur = IcebergTable.snapshot(spark, t).snapshotId
    spark.sql(s"CALL graft.system.create_tag('$t', 'before-opt', $cur)")
      .collect()
    spark.sql(s"CALL graft.system.rewrite_data_files('$t')").collect()
    assert(IcebergTable.snapshot(spark, t).deletes.isEmpty)
    spark.sql(s"CALL graft.system.rollback_to_snapshot('$t', $cur)").collect()
    assert(IcebergTable.snapshot(spark, t).snapshotId === cur)
    assert(IcebergTable.refs(spark, t)("before-opt")._1 === cur)
    // expire via CALL honors the tag
    spark.sql(s"CALL graft.system.expire_snapshots('$t', 1)").collect()
    assert(IcebergTable.snapshotIds(spark, t).contains(cur))
    // unknown procedures stay loud
    intercept[UnsupportedOperationException] {
      spark.sql(s"CALL graft.system.nonsense('$t')").collect()
    }
  }
}
