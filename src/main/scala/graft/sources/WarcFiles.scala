package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion (ISO 28500; the Common Crawl container — the
  * literal entry point of a web-scale training-data pipeline):
  * `WarcFiles.read` parses `*.warc` / `*.warc.gz` / `*.wet.gz` into
  * one row per record with the headers a curation pipeline filters on
  * (type, target URI, date, content type, HTTP status) plus the raw
  * payload and, for response/conversion records, the extracted body
  * text.
  *
  * Scale shape: WARC.gz is a CONCATENATION of per-record gzip members
  * — unsplittable without a member index — so the unit of parallelism
  * is the FILE, exactly how production crawls are laid out (millions
  * of ~1 GB segment files; Common Crawl publishes ~64k files per
  * crawl). The file list distributes over executors and each task
  * STREAMS its file (bounded memory per record, one pass, no
  * whole-file buffering); nothing row-sized touches the driver.
  * Records larger than `maxRecordBytes` (default 8 MiB) are skipped
  * with their length, never buffered — a single pathological record
  * must not OOM an executor.
  */
object WarcFiles {

  /** Live input-stream count — instrumentation the leak spec asserts
    * on (local mode shares the JVM, so the executor-side opens are
    * visible here). */
  private[sources] val openStreams =
    new java.util.concurrent.atomic.AtomicInteger(0)

  final case class WarcRecord(file: String, warc_type: String,
                              target_uri: String, warc_date: String,
                              record_id: String, content_type: String,
                              content_length: Long, http_status: Int,
                              http_content_type: String, body: Array[Byte],
                              truncated: Boolean)

  /** All WARC records of the files under `pathGlob` (non-recursive
    * glob, like `spark.read`). `types` filters record types early
    * (`response`, `conversion`, …; empty = all). */
  def read(spark: SparkSession, pathGlob: String,
           types: Seq[String] = Seq.empty,
           maxRecordBytes: Int = 8 << 20): DataFrame = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] = {
      val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      val expanded = matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      expanded.filterNot(_.isDirectory).map(_.getPath.toString)
        .filter(n => n.endsWith(".warc") || n.endsWith(".warc.gz") ||
          n.endsWith(".wet") || n.endsWith(".wet.gz") || n.endsWith(".arc"))
        .sorted
    }
    require(files.nonEmpty, s"no WARC/WET files under $pathGlob")
    val wanted = types.map(_.toLowerCase).toSet
    val ds = spark.createDataset(files)
      .repartition(math.min(files.size, 2048))
      .flatMap { f =>
        val it = recordsOf(conf.value, f, maxRecordBytes)
        if (wanted.isEmpty) it
        else it.filter(r => wanted(r.warc_type.toLowerCase))
      }
    ds.toDF()
  }

  /** Response/conversion records as (uri, date, text) — the shape the
    * curation/dedup pipeline consumes. HTTP headers are stripped from
    * response payloads; bytes decode as UTF-8 with replacement. */
  def readText(spark: SparkSession, pathGlob: String): DataFrame =
    read(spark, pathGlob, types = Seq("response", "conversion"))
      .where(!col("truncated"))
      .select(col("target_uri").as("uri"), col("warc_date").as("date"),
        decode(col("body"), "UTF-8").as("text"),
        col("http_status"), col("file"))

  /** Stream one file's records (plain or per-record-gzipped). */
  private[sources] def recordsOf(conf: org.apache.hadoop.conf.Configuration,
                                 file: String,
                                 maxRecordBytes: Int): Iterator[WarcRecord] = {
    val p = new Path(file)
    val raw = p.getFileSystem(conf).open(p)
    val in: InputStream =
      if (file.endsWith(".gz"))
        // GZIPInputStream consumes CONCATENATED members natively —
        // exactly the warc.gz layout (one member per record)
        new GZIPInputStream(new BufferedInputStream(raw, 1 << 16), 1 << 16)
      else new BufferedInputStream(raw, 1 << 16)
    val din = new DataInputStream(in)
    openStreams.incrementAndGet()
    // CAS, not check-then-set: the task-completion listener and the
    // iterator's EOF path can race; a double pass-through would
    // double-close the stream and double-decrement the leak counter
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit = if (closed.compareAndSet(false, true)) {
      openStreams.decrementAndGet()
      try din.close() catch { case _: Exception => () }
    }
    // a consumer that stops early (limit/take) or a task that fails
    // mid-record never reaches EOF — the task-completion listener is
    // what releases the handle then (at millions-of-files scale a
    // leaked stream per partially-read file exhausts executor FDs)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def readLine(): String = {
        // WARC lines are CRLF-terminated ASCII/UTF-8
        val buf = new java.io.ByteArrayOutputStream(128)
        var b = din.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') { buf.write(b); b = din.read() }
        val s = new String(buf.toByteArray, "UTF-8")
        if (s.endsWith("\r")) s.dropRight(1) else s
      }

      private def advance(): Unit = {
        nextRec = null
        try {
          // seek the version line (skips inter-record blank lines)
          var line = readLine()
          while (line != null && !line.startsWith("WARC/")) line = readLine()
          if (line == null) { done = true; closeOnce(); return }
          // headers until the empty line
          val headers = scala.collection.mutable.Map[String, String]()
          var h = readLine()
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) headers(h.substring(0, i).trim.toLowerCase) =
              h.substring(i + 1).trim
            h = readLine()
          }
          val len = headers.getOrElse("content-length", "0").toLong
          val tooBig = len > maxRecordBytes
          val payload: Array[Byte] =
            if (tooBig) { skipFully(din, len); Array.empty }
            else { val b = new Array[Byte](len.toInt); din.readFully(b); b }
          val wtype = headers.getOrElse("warc-type", "")
          // response payloads are HTTP messages: status line + headers
          // + body — strip the envelope, keep the status
          val (status, httpCt, body) =
            if (!tooBig && wtype.equalsIgnoreCase("response") &&
              headers.getOrElse("content-type", "")
                .toLowerCase.startsWith("application/http"))
              parseHttp(payload)
            else (-1, "", payload)
          nextRec = WarcRecord(file, wtype,
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("warc-record-id", ""),
            headers.getOrElse("content-type", ""),
            len, status, httpCt, body, truncated = tooBig)
        } catch {
          case _: EOFException => done = true; closeOnce()
          case e: Throwable => done = true; closeOnce(); throw e
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  private def skipFully(in: DataInputStream, n: Long): Unit = {
    var left = n
    val buf = new Array[Byte](1 << 16)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) throw new EOFException()
      left -= r
    }
  }

  /** (status, content-type, body) out of an HTTP/1.x response. */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    // header/body split at the first CRLFCRLF (or LFLF)
    var i = 0
    var split = -1
    while (split < 0 && i < payload.length - 1) {
      if (payload(i) == '\n' &&
        (i + 1 < payload.length && payload(i + 1) == '\n')) split = i + 2
      else if (payload(i) == '\n' && i + 2 < payload.length &&
        payload(i + 1) == '\r' && payload(i + 2) == '\n') split = i + 3
      i += 1
    }
    if (split < 0) return (-1, "", payload)
    val head = new String(payload, 0, split, "UTF-8")
    val lines = head.split("\r?\n")
    val status = lines.headOption
      .flatMap(l => "HTTP/\\d\\.\\d (\\d{3})".r.findFirstMatchIn(l))
      .map(_.group(1).toInt).getOrElse(-1)
    val ct = lines.drop(1).find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim).getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(payload, split, payload.length))
  }
}
