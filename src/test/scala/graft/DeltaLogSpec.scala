package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLog, VersionedTable}

/** Native `_delta_log` reader against HAND-COMMITTED minimal Delta
  * tables (protocol/metaData/add/remove JSON actions written
  * directly, per the public transaction-log spec) — no Delta jars
  * involved on either side. */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as exactly one parquet file named `rel` under
    * `table`, returning its size in bytes. */
  private def writeDataFile(table: String, rel: String,
                            df: org.apache.spark.sql.DataFrame): Long = {
    val tmp = Files.createTempDirectory("graft-delta-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(table, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toFile.length()
  }

  private def commit(table: String, v: Long, lines: Seq[String],
                     mtime: Long = 0L): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    val f = dir.resolve(f"$v%020d.json")
    Files.writeString(f, lines.mkString("\n") + "\n")
    if (mtime > 0) f.toFile.setLastModified(mtime)
  }

  private val protoLine =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def metaLine(schemaJson: String, partCols: Seq[String] = Nil): String = {
    val pc = partCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":$pc,"configuration":{},"createdTime":1}}"""
  }

  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def addLine(rel: String, size: Long,
                      pv: Map[String, String] = Map.empty): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    s"""{"add":{"path":"$rel","partitionValues":$pvs,"size":$size,"modificationTime":5,"dataChange":true}}"""
  }

  private def removeLine(rel: String): String =
    s"""{"remove":{"path":"$rel","deletionTimestamp":9,"dataChange":true}}"""

  test("snapshot replay: adds, removes, version + timestamp travel") {
    val t = Files.createTempDirectory("graft-delta").toString
    val schema = Seq((1L, "a")).toDF("id", "s").schema
    val s1 = writeDataFile(t, "f1.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val s2 = writeDataFile(t, "f2.parquet", Seq((3L, "c")).toDF("id", "s"))
    val s3 = writeDataFile(t, "f3.parquet", Seq((4L, "d")).toDF("id", "s"))
    // v0: f1+f2 · v1: remove f2, add f3
    commit(t, 0, Seq(protoLine, metaLine(schema.json),
      addLine("f1.parquet", s1), addLine("f2.parquet", s2)), mtime = 1000000L)
    commit(t, 1, Seq(removeLine("f2.parquet"), addLine("f3.parquet", s3)),
      mtime = 2000000L)

    val latest = DeltaLog.read(spark, t)
    assert(latest.as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (4L, "d")))
    assert(DeltaLog.snapshot(spark, t).version === 1L)

    val v0 = DeltaLog.read(spark, t, versionAsOf = Some(0L))
    assert(v0.as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // timestamp travel: between the two commit mtimes → v0
    val ts = DeltaLog.read(spark, t, timestampAsOf = Some(1500000L))
    assert(ts.as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, t, timestampAsOf = Some(999L))
    }
    assert(DeltaLog.history(spark, t).as[(Long, Long)].collect().toMap
      === Map(0L -> 1000000L, 1L -> 2000000L))
  }

  test("partition values come from the log, typed per the schema") {
    val t = Files.createTempDirectory("graft-delta-part").toString
    // partition column `p` (int) is NOT in the data files — Delta
    // stores it only in add.partitionValues
    val full = Seq((1L, 10), (2L, 20)).toDF("id", "p")
    val s1 = writeDataFile(t, "p=10/f1.parquet", Seq(Tuple1(1L)).toDF("id"))
    val s2 = writeDataFile(t, "p=20/f2.parquet", Seq(Tuple1(2L)).toDF("id"))
    commit(t, 0, Seq(protoLine, metaLine(full.schema.json, Seq("p")),
      addLine("p=10/f1.parquet", s1, Map("p" -> "10")),
      addLine("p=20/f2.parquet", s2, Map("p" -> "20"))))
    val got = DeltaLog.read(spark, t)
    assert(got.schema("p").dataType === org.apache.spark.sql.types.IntegerType)
    assert(got.as[(Long, Int)].collect().toSet === Set((1L, 10), (2L, 20)))
  }

  test("checkpoint parquet is the replay base; json tail overrides") {
    val t = Files.createTempDirectory("graft-delta-ckpt").toString
    val schema = Seq(Tuple1(1L)).toDF("id").schema
    val s1 = writeDataFile(t, "f1.parquet", Seq(Tuple1(1L)).toDF("id"))
    val s2 = writeDataFile(t, "f2.parquet", Seq(Tuple1(2L)).toDF("id"))
    val s3 = writeDataFile(t, "f3.parquet", Seq(Tuple1(3L)).toDF("id"))
    commit(t, 0, Seq(protoLine, metaLine(schema.json), addLine("f1.parquet", s1)))
    commit(t, 1, Seq(addLine("f2.parquet", s2)))
    // checkpoint at v1 consolidates protocol/metaData/f1/f2
    val ckpt = spark.sql(
      s"""SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2) AS protocol,
         |  CAST(NULL AS STRUCT<id: STRING, schemaString: STRING,
         |    partitionColumns: ARRAY<STRING>,
         |    configuration: MAP<STRING, STRING>>) AS metaData,
         |  CAST(NULL AS STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>,
         |    size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN>) AS add,
         |  CAST(NULL AS STRUCT<path: STRING, deletionTimestamp: BIGINT,
         |    dataChange: BOOLEAN>) AS remove
         |""".stripMargin.replace("SELECT", "SELECT") )
    // build the 4 checkpoint rows with a union of typed literals
    val rows = spark.sql(
      s"""SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2) AS protocol, NULL AS metaData, NULL AS add, NULL AS remove
         |UNION ALL SELECT NULL, named_struct('id', 't-1', 'schemaString', '${schema.json.replace("'", "''")}', 'partitionColumns', array(), 'configuration', map()), NULL, NULL
         |UNION ALL SELECT NULL, NULL, named_struct('path', 'f1.parquet', 'partitionValues', map(), 'size', ${s1}L, 'modificationTime', 5L, 'dataChange', true), NULL
         |UNION ALL SELECT NULL, NULL, named_struct('path', 'f2.parquet', 'partitionValues', map(), 'size', ${s2}L, 'modificationTime', 5L, 'dataChange', true), NULL
         |""".stripMargin)
    val tmp = Files.createTempDirectory("graft-ckpt-out").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath,
      Paths.get(t, "_delta_log", f"${1L}%020d.checkpoint.parquet"))
    // v2 after the checkpoint: remove f1, add f3
    commit(t, 2, Seq(removeLine("f1.parquet"), addLine("f3.parquet", s3)))
    val got = DeltaLog.read(spark, t)
    assert(got.as[Long].collect().toSet === Set(2L, 3L))
    // earlier-than-checkpoint version still replays from json
    assert(DeltaLog.read(spark, t, versionAsOf = Some(0L))
      .as[Long].collect().toSet === Set(1L))
    assert(ckpt.columns.length === 4) // silence unused warning
  }

  test("unsupported features fail loudly, never read wrong") {
    val t = Files.createTempDirectory("graft-delta-bad").toString
    val schema = Seq(Tuple1(1L)).toDF("id").schema
    val s1 = writeDataFile(t, "f1.parquet", Seq(Tuple1(1L)).toDF("id"))
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      metaLine(schema.json), addLine("f1.parquet", s1)))
    val e = intercept[UnsupportedOperationException] {
      DeltaLog.snapshot(spark, t)
    }
    assert(e.getMessage.contains("deletionVectors"))
    // column mapping mode other than none
    val t2 = Files.createTempDirectory("graft-delta-bad2").toString
    writeDataFile(t2, "f1.parquet", Seq(Tuple1(1L)).toDF("id"))
    commit(t2, 0, Seq(protoLine,
      s"""{"metaData":{"id":"t-2","format":{"provider":"parquet"},"schemaString":${ujson(schema.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
      addLine("f1.parquet", s1)))
    intercept[UnsupportedOperationException] { DeltaLog.snapshot(spark, t2) }
    // not a delta table at all
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, Files.createTempDirectory("graft-nodelta").toString)
    }
  }

  test("direct writer: create, append, overwrite, schema gate, CAS") {
    val t = Files.createTempDirectory("graft-delta-w").toString + "/t"
    // commit 0 creates the table (protocol + metaData)
    assert(DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t) === 0L)
    // commit 1 appends
    assert(DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), t) === 1L)
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
    assert(DeltaLog.read(spark, t, versionAsOf = Some(0L))
      .as[(Long, String)].collect().toSet === Set((1L, "a")))
    // appending a different schema fails loudly
    val e = intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((3L, 9L)).toDF("k", "n"), t)
    }
    assert(e.getMessage.contains("schema"))
    // overwrite replaces the live set (old files removed in the log)
    assert(DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t,
      overwrite = true) === 2L)
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((9L, "z")))
    // ...but history is intact
    assert(DeltaLog.read(spark, t, versionAsOf = Some(1L))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // overwrite may change the schema (new metaData action)
    DeltaLog.write(spark, Seq((7L, 7L)).toDF("k", "n"), t, overwrite = true)
    assert(DeltaLog.snapshot(spark, t).schema.fieldNames.toSeq === Seq("k", "n"))
    // (concurrent-writer safety rides on fs.create's exclusive-create
    // semantics — the same contract VersionedTable's CAS documents)
  }

  test("direct writer: schema gate message and exclusive commit file") {
    val t = Files.createTempDirectory("graft-delta-w2").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    // simulate a racing writer that claimed version 1 between our
    // version listing and commit: exclusive create must throw
    val claimed = Paths.get(t, "_delta_log", f"${1L}%020d.json")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(claimed.toString), false)
    out.close()
    intercept[java.io.IOException] {
      val again = fs.create(new org.apache.hadoop.fs.Path(claimed.toString), false)
      again.close()
    }
  }

  test("streaming foreachBatch sink writes real Delta commits") {
    val dir = Files.createTempDirectory("graft-delta-stream").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    Files.writeString(Paths.get(s"$dir/in/b1.json"),
      """[{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]""")
    Files.writeString(Paths.get(s"$dir/in/b2.json"),
      """[{"k": 3, "v": "c"}]""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val delta = s"$dir/delta"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("multiLine", "true")
      .json(s"$dir/in")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        DeltaLog.write(spark, batch, delta); ()
      }.start()
    q.awaitTermination(120000)
    // one Delta commit per micro-batch, all rows live
    assert(DeltaLog.read(spark, delta).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(DeltaLog.history(spark, delta).count() === 2L)
  }

  test("VersionedTable export round-trips through the Delta reader") {
    val t = Files.createTempDirectory("graft-vt-delta").toString + "/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    VersionedTable.write(Seq((1L, "a"), (3L, "c")).toDF("k", "v"), t,
      overwrite = true)
    val out = Files.createTempDirectory("graft-vt-delta-out").toString + "/d"
    val top = DeltaLog.exportFromVersioned(spark, t, out)
    assert(top === 1L)
    assert(DeltaLog.read(spark, out).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (3L, "c")))
    assert(DeltaLog.read(spark, out, versionAsOf = Some(0L))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // the same Snapshot abstraction serves VersionedTable directly
    // (graft versions are 1-based, unlike Delta's 0-based)
    val snap = DeltaLog.snapshotFromVersioned(spark, t, Some(1L))
    assert(DeltaLog.readSnapshot(spark, snap)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }
}
