package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.sources.WarcFiles

/** WARC/WET ingestion: record framing (plain + per-record gzip
  * members), HTTP envelope stripping, type filtering, text
  * extraction, and the oversized-record guard. */
class WarcFilesSpec extends SparkSpec {

  private def warcRecord(headers: Seq[(String, String)],
                         payload: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n") +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def httpResponse(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body)
      .getBytes("UTF-8")

  private def sampleRecords(big: Boolean = false): Seq[Array[Byte]] = Seq(
    warcRecord(Seq("WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:aaa>",
      "WARC-Date" -> "2024-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-test\r\n".getBytes("UTF-8")),
    warcRecord(Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:bbb>",
      "WARC-Target-URI" -> "https://example.com/a",
      "WARC-Date" -> "2024-01-01T00:00:01Z",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("<html>hello web corpus</html>")),
    warcRecord(Seq("WARC-Type" -> "conversion",
      "WARC-Record-ID" -> "<urn:uuid:ccc>",
      "WARC-Target-URI" -> "https://example.com/a",
      "WARC-Date" -> "2024-01-01T00:00:02Z",
      "Content-Type" -> "text/plain"),
      "hello web corpus".getBytes("UTF-8"))) ++
    (if (big) Seq(warcRecord(Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:ddd>",
      "WARC-Target-URI" -> "https://example.com/huge",
      "WARC-Date" -> "2024-01-01T00:00:03Z",
      "Content-Type" -> "application/http; msgtype=response"),
      Array.fill[Byte](3000)('x'))) else Nil)

  test("plain .warc and per-record-gzip .warc.gz parse identically") {
    val dir = Files.createTempDirectory("warc").toString
    Files.write(Paths.get(dir, "seg-0.warc"),
      sampleRecords().reduce(_ ++ _))
    Files.write(Paths.get(dir, "seg-1.warc.gz"),
      sampleRecords().map(gz).reduce(_ ++ _))

    val df = WarcFiles.read(spark, s"$dir/*")
    assert(df.count() === 6)
    val types = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("warcinfo" -> 2L, "response" -> 2L,
      "conversion" -> 2L))
    // the HTTP envelope strips; status + content-type survive
    val resp = df.where(org.apache.spark.sql.functions
      .col("warc_type") === "response").collect()
    assert(resp.forall(_.getAs[Int]("http_status") === 200))
    assert(resp.forall(r => new String(r.getAs[Array[Byte]]("body"), "UTF-8")
      === "<html>hello web corpus</html>"))
  }

  test("readText yields the curation-pipeline shape; type filter prunes early") {
    val dir = Files.createTempDirectory("warc2").toString
    Files.write(Paths.get(dir, "seg.warc.gz"),
      sampleRecords().map(gz).reduce(_ ++ _))
    val txt = WarcFiles.readText(spark, s"$dir/*").collect()
    assert(txt.length === 2) // response + conversion
    assert(txt.forall(_.getAs[String]("uri") === "https://example.com/a"))
    assert(txt.exists(_.getAs[String]("text") === "hello web corpus"))
    val onlyConv = WarcFiles.read(spark, s"$dir/*",
      types = Seq("conversion"))
    assert(onlyConv.count() === 1)
  }

  test("graft_warc / graft_warc_text TVFs serve the parse through SQL") {
    val dir = Files.createTempDirectory("warc4").toString
    Files.write(Paths.get(dir, "seg.warc.gz"),
      sampleRecords().map(gz).reduce(_ ++ _))
    assert(spark.sql(s"SELECT * FROM graft_warc('$dir/*')").count() === 3)
    assert(spark.sql(
      s"SELECT * FROM graft_warc('$dir/*', 'response')").count() === 1)
    val t = spark.sql(
      s"SELECT uri, text FROM graft_warc_text('$dir/*') ORDER BY text")
      .collect()
    assert(t.length === 2)
  }

  test("records over the byte cap skip as truncated instead of buffering") {
    val dir = Files.createTempDirectory("warc3").toString
    Files.write(Paths.get(dir, "seg.warc"),
      sampleRecords(big = true).reduce(_ ++ _))
    val df = WarcFiles.read(spark, s"$dir/*", maxRecordBytes = 1024)
    assert(df.count() === 4)
    val trunc = df.where(org.apache.spark.sql.functions.col("truncated"))
      .collect()
    assert(trunc.length === 1)
    assert(trunc.head.getAs[String]("target_uri") === "https://example.com/huge")
    assert(trunc.head.getAs[Long]("content_length") === 3000L)
    // the record AFTER the skipped one still parses (framing intact)
    assert(df.where(org.apache.spark.sql.functions
      .col("warc_type") === "conversion").count() === 1)
  }
}
