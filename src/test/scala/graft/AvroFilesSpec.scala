package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.sources.AvroFiles

/** Distributed Avro ingest/egress on avro-core alone — round trips
  * plus a hand-written foreign file (the reader must not depend on
  * its own writer's conventions). */
class AvroFilesSpec extends SparkSpec {
  import spark.implicits._

  test("round trip: primitives, nulls, nested struct, array, map, date, ts") {
    val dir = Files.createTempDirectory("graft-avro-rt").toString
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, 'a', 1.5D, CAST(NULL AS STRING), named_struct('x', 1, 'y', 'u'),
        |  array(1L, 2L), map('k1', 10L), DATE'2024-03-01',
        |  TIMESTAMP'2024-03-01 12:34:56.789123', CAST('ab' AS BINARY)),
        | (2L, 'b', -0.25D, 'ok', named_struct('x', 2, 'y', 'v'),
        |  array(3L), map('k2', 20L), DATE'1999-12-31',
        |  TIMESTAMP'1970-01-02 00:00:00', CAST('c' AS BINARY))
        | AS t(id, s, d, opt, st, arr, m, dt, ts, b)""".stripMargin)
    val n = AvroFiles.write(df, dir)
    assert(n >= 1)
    val back = AvroFiles.read(spark, dir)
    assert(back.schema("opt").nullable)
    // render binary as hex — Row.toString prints array identity
    def rendered(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("b", hex(col("b"))).orderBy("id")
        .collect().map(_.toString).toSeq
    assert(rendered(df) === rendered(back))
  }

  test("reads a foreign avro file written directly with avro-core") {
    val dir = Files.createTempDirectory("graft-avro-foreign").toString
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"ev","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tag","type":["null","string"],"default":null},
        |{"name":"kind","type":{"type":"enum","name":"k","symbols":["A","B"]}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}
        |]}""".stripMargin)
    val f = new java.io.File(dir, "x.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    def rec(id: Long, tag: String, kind: String, ms: Long): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("tag", tag)
      r.put("kind", new GenericData.EnumSymbol(
        schema.getField("kind").schema(), kind))
      r.put("ts", ms)
      r
    }
    try { w.append(rec(1L, "x", "A", 86400000L)); w.append(rec(2L, null, "B", 0L)) }
    finally w.close()
    val back = AvroFiles.read(spark, dir)
    assert(back.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val got = back.orderBy("id")
      .select(col("id"), col("tag"), col("kind"),
        unix_millis(col("ts")).as("ms"))
      .as[(Long, Option[String], String, Long)].collect().toSeq
    assert(got === Seq((1L, Some("x"), "A", 86400000L),
      (2L, None, "B", 0L)))
  }

  test("multi-branch unions are rejected loudly") {
    val dir = Files.createTempDirectory("graft-avro-bad").toString
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"u","fields":[
        |{"name":"v","type":["int","string"]}]}""".stripMargin)
    val f = new java.io.File(dir, "x.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val r = new GenericData.Record(schema)
    r.put("v", Integer.valueOf(1))
    try w.append(r) finally w.close()
    intercept[UnsupportedOperationException] {
      AvroFiles.read(spark, dir)
    }
  }
}
