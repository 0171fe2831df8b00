package graft

import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.sources.{DeletionVectors, IcebergTable}

/** FOREIGN-WRITTEN Iceberg table end-to-end: one v3 metadata tree
  * whose BYTES are authored here directly (metadata.json, avro
  * manifest lists, avro manifests with the v3 DV reference fields,
  * a hand-framed Puffin file) — never graft's writer — COMPOSING the
  * features an ecosystem writer ships together:
  *
  *  - a SCHEMA HISTORY with a renamed column (field-id resolution
  *    must serve the pre-rename file under the current name),
  *  - a column added with an `initial-default` (the pre-evolution
  *    file owes the default, the post-evolution file carries values),
  *  - a v3 DELETION VECTOR (`deletion-vector-v1` Puffin blob,
  *    manifest fields 143/144/145) over the oldest file.
  *
  * Single-feature specs prove each leg; this proves the composition
  * — "interops with the ecosystem", not "interops with itself".
  * Layouts per the public Iceberg table spec + Puffin spec. */
class ForeignIcebergSpec extends SparkSpec {
  import spark.implicits._

  private def writeAvro(path: String, schema: Schema,
                        records: Seq[GenericRecord]): Long = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try records.foreach(w.append) finally w.close()
    f.length()
  }

  /** v1-shape DATA manifest entry (seq inherited from the list). */
  private val DataEntry: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  /** v3-shape DELETE manifest entry with the deletion-vector
    * reference fields (spec ids 143/144/145). */
  private val DeleteEntry: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"referenced_data_file","type":["null","string"],"default":null},
      |{"name":"content_offset","type":["null","long"],"default":null},
      |{"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}""".stripMargin)

  private val V2List: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"min_sequence_number","type":"long"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private def dataEntry(snapId: Long, path: String, nrec: Long,
                        size: Long): GenericRecord = {
    val e = new GenericData.Record(DataEntry)
    e.put("status", 1)
    e.put("snapshot_id", snapId)
    val d = new GenericData.Record(DataEntry.getField("data_file").schema())
    d.put("file_path", path)
    d.put("file_format", "PARQUET")
    d.put("partition", new GenericData.Record(
      d.getSchema.getField("partition").schema()))
    d.put("record_count", nrec)
    d.put("file_size_in_bytes", size)
    e.put("data_file", d)
    e
  }

  private def listEntry(path: String, len: Long, content: Int, seq: Long,
                        snapId: Long): GenericRecord = {
    val r = new GenericData.Record(V2List)
    r.put("manifest_path", path)
    r.put("manifest_length", len)
    r.put("partition_spec_id", 0)
    r.put("content", content)
    r.put("sequence_number", seq)
    r.put("min_sequence_number", seq)
    r.put("added_snapshot_id", snapId)
    r
  }

  private def writeDataFile(dir: String, name: String,
                            df: org.apache.spark.sql.DataFrame): String = {
    val tmp = Files.createTempDirectory("graft-fice-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(dir, name)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toString
  }

  /** Hand-frame a one-blob Puffin file per the public Puffin spec:
    * Magic | blob | Magic | footer JSON | size (int4 LE) | flags |
    * Magic. Returns (blob offset, blob length). */
  private def writePuffin(path: String, blob: Array[Byte],
                          snapId: Long, seq: Long): (Long, Long) = {
    val magic = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(magic)
    val off = bos.size().toLong
    bos.write(blob)
    val footer =
      (s"""{"blobs":[{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapId,"sequence-number":$seq,""" +
        s""""offset":$off,"length":${blob.length},"properties":{}}],""" +
        s""""properties":{"created-by":"someone-else"}}""").getBytes("UTF-8")
    bos.write(magic)
    bos.write(footer)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(footer.length).putInt(0)
    bos.write(tail.array())
    bos.write(magic)
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val out = new java.io.FileOutputStream(f)
    try out.write(bos.toByteArray) finally out.close()
    (off, blob.length.toLong)
  }

  test("hand-authored v3 tree composing rename history + initial-default + deletion vector reads correctly end-to-end") {
    val t = Files.createTempDirectory("graft-fice").toString
    // f1 under schema 0: columns (id, s) — snapshot 1
    val f1 = writeDataFile(t, "data/f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    // f2 under schema 1: columns (id, name, cat) — snapshot 2
    val f2 = writeDataFile(t, "data/f2.parquet",
      Seq((10L, "X", "real")).toDF("id", "name", "cat"))
    def len(p: String) = new java.io.File(p).length()

    val m1 = s"$t/metadata/m1.avro"
    val l1 = writeAvro(m1, DataEntry, Seq(dataEntry(1L, f1, 3L, len(f1))))
    val m2 = s"$t/metadata/m2.avro"
    val l2 = writeAvro(m2, DataEntry, Seq(dataEntry(2L, f2, 1L, len(f2))))

    // snapshot 3: a deletion vector killing f1's physical row 0
    val puffin = s"$t/data/dv1.puffin"
    val (dvOff, dvLen) = writePuffin(puffin,
      DeletionVectors.dvBlobBytes(Seq(0L)), snapId = 3L, seq = 3L)
    val m3 = s"$t/metadata/m3.avro"
    val de = new GenericData.Record(DeleteEntry)
    de.put("status", 1)
    de.put("snapshot_id", 3L)
    de.put("sequence_number", 3L)
    val dd = new GenericData.Record(DeleteEntry.getField("data_file").schema())
    dd.put("content", 1)
    dd.put("file_path", puffin)
    dd.put("file_format", "PUFFIN")
    dd.put("partition", new GenericData.Record(
      dd.getSchema.getField("partition").schema()))
    dd.put("record_count", 1L)
    dd.put("file_size_in_bytes", len(puffin))
    dd.put("referenced_data_file", f1)
    dd.put("content_offset", dvOff)
    dd.put("content_size_in_bytes", dvLen)
    de.put("data_file", dd)
    val l3 = writeAvro(m3, DeleteEntry, Seq(de))

    // per-snapshot manifest lists (data seqs 1 and 2, DV at seq 3)
    val sl1 = s"$t/metadata/sl1.avro"
    writeAvro(sl1, V2List, Seq(listEntry(m1, l1, 0, 1L, 1L)))
    val sl2 = s"$t/metadata/sl2.avro"
    writeAvro(sl2, V2List, Seq(
      listEntry(m1, l1, 0, 1L, 1L), listEntry(m2, l2, 0, 2L, 2L)))
    val sl3 = s"$t/metadata/sl3.avro"
    writeAvro(sl3, V2List, Seq(
      listEntry(m1, l1, 0, 1L, 1L), listEntry(m2, l2, 0, 2L, 2L),
      listEntry(m3, l3, 1, 3L, 3L)))

    // schema history: field 2 RENAMED s -> name at schema 1, field 3
    // (cat) added with an initial-default
    val schema0 =
      """{"schema-id":0,"type":"struct","fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"s","required":false,"type":"string"}]}""".stripMargin
    val schema1 =
      """{"schema-id":1,"type":"struct","fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"name","required":false,"type":"string"},
        |{"id":3,"name":"cat","required":false,"type":"string",
        |"initial-default":"x","write-default":"x"}]}""".stripMargin
    def snapJson(id: Long, seq: Long, schemaId: Int, list: String) =
      s"""{"snapshot-id":$id,"timestamp-ms":${1000 * id},"sequence-number":$seq,"schema-id":$schemaId,"manifest-list":"$list","summary":{"operation":"${if (id == 3) "delete" else "append"}"}}"""
    val meta =
      s"""{"format-version":3,"table-uuid":"22222222-3333-4444-5555-666666666666",
         |"location":"$t","last-updated-ms":99,"last-column-id":3,
         |"last-sequence-number":3,
         |"current-schema-id":1,"schemas":[$schema0,$schema1],
         |"partition-spec":[],"default-spec-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],
         |"current-snapshot-id":3,
         |"snapshots":[${snapJson(1, 1, 0, sl1)},${snapJson(2, 2, 1, sl2)},${snapJson(3, 3, 1, sl3)}]}""".stripMargin
    val mdir = Paths.get(t, "metadata")
    Files.createDirectories(mdir)
    Files.writeString(mdir.resolve("v1.metadata.json"), meta)

    // resolved state: DV entry with the 143/144/145 triple
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.deletes.size === 1 && snap.deletes.head.isDv)
    assert(snap.deletes.head.referencedDataFile === Some(f1))

    // the COMPOSED read: f1's survivors under the RENAMED column name
    // with the defaulted `cat` filled; f2 as written
    val got = IcebergTable.read(spark, t)
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((2L, "b", "x"), (3L, "c", "x"), (10L, "X", "real")))

    // time travel BEHIND the DV: row (1,a) is back, default still owed
    val pre = IcebergTable.read(spark, t, snapshotIdAsOf = Some(2L))
      .as[(Long, String, String)].collect().toSet
    assert(pre === Set((1L, "a", "x"), (2L, "b", "x"),
      (3L, "c", "x"), (10L, "X", "real")))

    // time travel BEHIND the evolution: schema-0 column names serve
    val first = IcebergTable.read(spark, t, snapshotIdAsOf = Some(1L))
    assert(first.columns.toSeq === Seq("id", "s"))
    assert(first.as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // the change feed composes over the same foreign tree: the DV
    // commit emits exactly the newly-dead row (under current names)
    val ch = IcebergTable.changes(spark, t, 2L, 3L)
      .select("id", "name", "cat", "_change_type")
      .as[(Long, String, String, String)].collect().toSet
    assert(ch === Set((1L, "a", "x", "delete")))

    // DML lands ON the foreign tree: a MOR delete over the adopted
    // state keeps composing (rename + default + both delete shapes)
    IcebergTable.delete(spark, t,
      org.apache.spark.sql.functions.col("id") === 10L)
    assert(IcebergTable.read(spark, t)
      .as[(Long, String, String)].collect().toSet
      === Set((2L, "b", "x"), (3L, "c", "x")))
  }
}
