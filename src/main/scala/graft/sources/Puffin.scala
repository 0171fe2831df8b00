package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** PUFFIN file format (the Apache Iceberg statistics container,
  * per the public Puffin spec): a magic-framed blob file with a
  * JSON footer describing each blob —
  *
  * {{{
  *   Magic │ Blob₁ … Blobₙ │ Magic │ FooterPayload (JSON)
  *         │ FooterPayloadSize (int4 LE) │ Flags (int4) │ Magic
  * }}}
  *
  * Magic is `0x50 0x46 0x41 0x31` ("PFA1"). The footer payload lists
  * `blobs` (type, fields, snapshot-id, sequence-number, offset,
  * length, properties) and file `properties`. Readers that do not
  * understand a blob's `type` skip it and read what they need from
  * the blob METADATA — exactly how engines consume the `ndv`
  * property that [[IcebergTable.analyzeTable]] records (the same
  * contract as `apache-datasketches-theta-v1` stats written by
  * Spark-Iceberg and read by Trino). Footer compression is not
  * written (Flags = 0) and compressed footers are refused loudly. */
private[sources] object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  final case class Blob(blobType: String, fields: Seq[Int],
                        snapshotId: Long, sequenceNumber: Long,
                        bytes: Array[Byte],
                        properties: Map[String, String])

  final case class BlobMeta(blobType: String, fields: Seq[Int],
                            snapshotId: Long, sequenceNumber: Long,
                            offset: Long, length: Long,
                            properties: Map[String, String])

  private def jsEsc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write a Puffin file; returns (fileSize, footerSize, blobMetas) —
    * the triple the table metadata's `statistics` entry records. */
  def write(fs: FileSystem, path: Path, blobs: Seq[Blob],
            fileProperties: Map[String, String]): (Long, Int, Seq[BlobMeta]) = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Magic)
    val metas = blobs.map { b =>
      val off = bos.size().toLong
      bos.write(b.bytes)
      BlobMeta(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
        off, b.bytes.length.toLong, b.properties)
    }
    def blobJson(m: BlobMeta): String = {
      val props = m.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsEsc(k)}:${jsEsc(v)}" }
        .mkString("{", ",", "}")
      s"""{"type":${jsEsc(m.blobType)},"fields":${m.fields.mkString("[", ",", "]")},"snapshot-id":${m.snapshotId},"sequence-number":${m.sequenceNumber},"offset":${m.offset},"length":${m.length},"properties":$props}"""
    }
    val fileProps = fileProperties.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsEsc(k)}:${jsEsc(v)}" }
      .mkString("{", ",", "}")
    val payload = (s"""{"blobs":${metas.map(blobJson).mkString("[", ",", "]")},"properties":$fileProps}""").getBytes("UTF-8")
    bos.write(Magic) // footer opens with its own magic
    bos.write(payload)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).putInt(0) // Flags: uncompressed footer
    bos.write(tail.array())
    bos.write(Magic)
    val bytes = bos.toByteArray
    val out = fs.create(path, false)
    try out.write(bytes) finally out.close()
    // footer size = trailing magic + tail + payload + opening magic
    (bytes.length.toLong, payload.length + Magic.length * 2 + 8, metas)
  }

  /** Parse the footer: (blob metas, file properties). */
  def readFooter(fs: FileSystem, path: Path): (Seq[BlobMeta], Map[String, String]) = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      def readAt(pos: Long, n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        in.readFully(pos, b)
        b
      }
      require(readAt(0, 4).sameElements(Magic) &&
        readAt(len - 4, 4).sameElements(Magic),
        s"not a Puffin file: $path")
      val tail = java.nio.ByteBuffer.wrap(readAt(len - 12, 8))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tail.getInt()
      val flags = tail.getInt()
      require((flags & 1) == 0,
        s"compressed Puffin footer payloads are not supported: $path")
      val payload = new String(
        readAt(len - 12 - payloadSize, payloadSize), "UTF-8")
      val M = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = M.readTree(payload)
      import scala.jdk.CollectionConverters._
      def propsOf(n: com.fasterxml.jackson.databind.JsonNode) =
        Option(n.get("properties")).toSeq
          .flatMap(_.fields().asScala.map(e => e.getKey -> e.getValue.asText()))
          .toMap
      val blobs = Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala).map { b =>
          BlobMeta(b.get("type").asText(),
            Option(b.get("fields")).toSeq
              .flatMap(_.elements().asScala.map(_.asInt())).toSeq,
            Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(0L),
            Option(b.get("sequence-number")).map(_.asLong()).getOrElse(0L),
            b.get("offset").asLong(), b.get("length").asLong(),
            propsOf(b))
        }.toSeq
      (blobs, propsOf(root))
    } finally in.close()
  }

  def readBlob(fs: FileSystem, path: Path, m: BlobMeta): Array[Byte] = {
    val in = fs.open(path)
    try {
      val b = new Array[Byte](m.length.toInt)
      in.readFully(m.offset, b)
      b
    } finally in.close()
  }

  /** Distinct-count estimate from an `apache-datasketches-theta-v1`
    * blob BODY — the Apache DataSketches Theta COMPACT sketch
    * serialization (serial version 3, family 3, little-endian
    * preamble): `estimate = retained / (thetaLong / 2⁶³-1)`. Handles
    * the empty (flags bit 2), single-item (1 preamble long),
    * exact (2) and estimation (3, explicit theta) layouts. Returns
    * None on any other shape — stats are advisory, never guessed. */
  def thetaEstimate(bytes: Array[Byte]): Option[Long] = {
    if (bytes.length < 8) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val preLongs = bytes(0) & 0x3F
    val serVer = bytes(1) & 0xFF
    val family = bytes(2) & 0xFF
    val flags = bytes(5) & 0xFF
    if (serVer != 3 || family != 3) return None // compact theta only
    if ((flags & 0x04) != 0) return Some(0L) // EMPTY flag
    if (preLongs == 1) return Some(1L) // single-item layout
    if (preLongs != 2 && preLongs != 3) return None
    if (bytes.length < preLongs * 8) return None
    val retained = bb.getInt(8).toLong
    val theta = if (preLongs >= 3) bb.getLong(16) else Long.MaxValue
    if (theta <= 0L) return None
    if (theta == Long.MaxValue) Some(retained) // exact mode
    else Some(math.round(
      retained.toDouble * Long.MaxValue.toDouble / theta.toDouble))
  }
}

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * distinct 64-bit hashes of a column's values (unsigned order).
  * With m < k observed the count is EXACT (= m); otherwise the
  * classic estimator `(k-1) / fraction(kth smallest)`. Deterministic
  * (XXH64, no seeds), mergeable (union + re-truncate), and ~8 KiB at
  * k=1024 — the blob [[IcebergTable.analyzeTable]] stores per column
  * under blob type `graft-kmv-v1` with the standard `ndv` property
  * carrying the estimate. */
private[sources] object KmvSketch {
  val DefaultK = 1024

  /** Unsigned fraction of a 64-bit hash in [0, 1). */
  private def frac(h: Long): Double =
    (h ^ Long.MinValue).toDouble / 1.8446744073709552e19 + 0.5

  def estimate(k: Int, minHashes: Seq[Long]): Long =
    if (minHashes.size < k) minHashes.size.toLong
    else {
      val kth = frac(minHashes.last)
      math.round((k - 1).toDouble / (if (kth <= 0d) 1e-18 else kth))
    }

  def serialize(k: Int, minHashes: Seq[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * minHashes.size)
    bb.putInt(k).putInt(minHashes.size).putInt(0)
    minHashes.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Seq[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt(); val n = bb.getInt(); bb.getInt()
    (k, (0 until n).map(_ => bb.getLong()))
  }
}
