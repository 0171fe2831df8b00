package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLog

/** Column-mapping WRITE side: the `SET TBLPROPERTIES
  * ('delta.columnMapping.mode'='name')` upgrade (ids + physicalNames
  * + protocol bump), metadata-only `RENAME COLUMN` / `DROP COLUMN`,
  * and appends/overwrites that stage parquet under the PHYSICAL
  * names so pre- and post-rename files agree on the layout. */
class ColumnMappingDdlSpec extends SparkSpec {
  import spark.implicits._

  test("name-mode upgrade assigns ids + physicalNames with the (2,5) protocol bump") {
    val t = Files.createTempDirectory("graft-cmw-up").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    spark.sql("ALTER TABLE '" + t + "' SET TBLPROPERTIES " +
      "('delta.columnMapping.mode' = 'name')").collect()
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.configuration("delta.columnMapping.mode") === "name")
    assert(snap.configuration("delta.columnMapping.maxColumnId") === "2")
    assert((snap.protocol._1, snap.protocol._2) === (2, 5))
    snap.schema.fields.zipWithIndex.foreach { case (f, i) =>
      assert(f.metadata.getLong("delta.columnMapping.id") === i + 1L)
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        === f.name)
    }
    // reads unchanged; a second upgrade refuses
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException] {
      DeltaLog.enableColumnMapping(spark, t)
    }
    // id mode is read-only — the property path refuses the flip
    intercept[UnsupportedOperationException] {
      DeltaLog.setTableProperties(spark, t,
        Map("delta.columnMapping.mode" -> "id"))
    }
  }

  test("RENAME COLUMN is metadata-only; appends stage PHYSICAL names; time travel keeps old names") {
    val t = Files.createTempDirectory("graft-cmw-rn").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1), t)                                           // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.columnMapping.mode" -> "name"))                 // v1
    val filesBefore = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    spark.sql("ALTER TABLE '" + t + "' RENAME COLUMN v TO label")
      .collect()                                                 // v2
    // no data file moved — the rename is one metaData line
    assert(DeltaLog.snapshot(spark, t).files.map(_.path).toSet
      === filesBefore)
    assert(DeltaLog.read(spark, t).columns.toSeq === Seq("k", "label"))
    assert(DeltaLog.read(spark, t).select("label").as[String]
      .collect().toSet === Set("a", "b"))
    // time travel reads the pre-rename version with ITS name
    assert(DeltaLog.read(spark, t, versionAsOf = Some(1L))
      .columns.toSeq === Seq("k", "v"))
    // an append under the NEW logical name stages parquet under the
    // PHYSICAL name, so both file generations serve the same column
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "label")
      .coalesce(1), t)                                           // v3
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    val newFile = DeltaLog.snapshot(spark, t).files
      .map(_.path).filterNot(filesBefore).head
    assert(spark.read.parquet(newFile).columns.toSeq === Seq("k", "v"),
      "the staged parquet must carry the physical name")
    // an overwrite with the logical schema keeps the mapping intact
    DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "label")
      .coalesce(1), t, overwrite = true)                         // v4
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((9L, "z")))
    assert(DeltaLog.snapshot(spark, t)
      .configuration("delta.columnMapping.mode") === "name")
    // schema-changing writes refuse toward the DDL path
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((1L, 2L)).toDF("k", "n"), t,
        overwrite = true)
    }
  }

  test("partitioned mapped table: physical partition dirs and partitionValues keys") {
    val t = Files.createTempDirectory("graft-cmw-part").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("k", "v", "p"), t,
      partitionBy = Seq("p"))
    DeltaLog.setTableProperties(spark, t,
      Map("delta.columnMapping.mode" -> "name"))
    spark.sql("ALTER TABLE '" + t + "' RENAME COLUMN p TO part").collect()
    assert(DeltaLog.snapshot(spark, t).partitionColumns === Seq("part"))
    DeltaLog.write(spark, Seq((3L, "z", "p1")).toDF("k", "v", "part"), t)
    // the append's partitionValues keys stay PHYSICAL ("p"), like the
    // pre-rename files — one resolution rule for every generation
    val added = DeltaLog.snapshot(spark, t).files
      .filter(_.path.contains("p=p1"))
    assert(added.forall(_.partitionValues.keySet === Set("p")))
    assert(DeltaLog.read(spark, t).as[(Long, String, String)]
      .collect().toSet
      === Set((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")))
  }

  test("DROP COLUMN excludes current reads, old versions still serve; guards fire") {
    val t = Files.createTempDirectory("graft-cmw-drop").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "x"), t) // v0
    DeltaLog.setTableProperties(spark, t,
      Map("delta.columnMapping.mode" -> "name"))                    // v1
    spark.sql("ALTER TABLE '" + t + "' DROP COLUMN x").collect()    // v2
    assert(DeltaLog.read(spark, t).columns.toSeq === Seq("k", "v"))
    assert(DeltaLog.read(spark, t, versionAsOf = Some(1L))
      .columns.toSeq === Seq("k", "v", "x"))
    // appends under the narrowed schema work
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t)         // v3
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // guards: unknown / duplicate / unmapped / constraint-referenced
    intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, t, "nope", "w")
    }
    intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, t, "k", "v")
    }
    val plain = Files.createTempDirectory("graft-cmw-plain").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), plain)
    intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, plain, "v", "w")
    }
    DeltaLog.addCheckConstraint(spark, t, "kpos", "k > 0")
    val e = intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, t, "k", "key")
    }
    assert(e.getMessage.contains("kpos"), e.getMessage)
    intercept[IllegalArgumentException] { DeltaLog.dropColumn(spark, t, "k") }
    DeltaLog.dropCheckConstraint(spark, t, "kpos")
    // ADD COLUMNS on the mapped table mints id + physicalName and
    // advances maxColumnId — a mapping-less field would be
    // protocol-invalid under mode=name
    DeltaLog.addColumns(spark, t, Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val widened = DeltaLog.snapshot(spark, t)
    val wf = widened.schema("w")
    assert(wf.metadata.getLong("delta.columnMapping.id") === 4L)
    assert(wf.metadata.getString("delta.columnMapping.physicalName") === "w")
    assert(widened.configuration("delta.columnMapping.maxColumnId") === "4")
    assert(DeltaLog.read(spark, t).columns.toSeq === Seq("k", "v", "w"))

    // partition columns refuse DROP
    val tp = Files.createTempDirectory("graft-cmw-pd").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a", "p1")).toDF("k", "v", "p"), tp,
      partitionBy = Seq("p"))
    DeltaLog.setTableProperties(spark, tp,
      Map("delta.columnMapping.mode" -> "name"))
    intercept[IllegalArgumentException] { DeltaLog.dropColumn(spark, tp, "p") }
    // row-level DML on mapped tables stays a loud gate
    intercept[UnsupportedOperationException] {
      DeltaLog.delete(spark, t, col("k") === 1L)
    }
  }
}
