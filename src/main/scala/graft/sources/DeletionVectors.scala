package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Delta Lake DELETION VECTOR sidecars, per the public PROTOCOL.md:
  * an add action may carry a `deletionVector` descriptor marking
  * row positions of the data file as logically deleted (merge-on-read
  * deletes — modern writers enable them by default, which is why a
  * reader without DV support cannot open many real-world tables).
  *
  * Storage forms:
  *  - `u`: relative file — `pathOrInlineDv` is `[<prefix>]<z-base85
  *    UUID>` naming `deletion_vector_<uuid>.bin` under the table root
  *    (inside `<prefix>/` when present), bitmap at `offset`.
  *  - `p`: absolute path to such a file.
  *  - `i`: inline — `pathOrInlineDv` IS the z-base85 of the
  *    serialized bitmap data.
  *
  * The DV FILE layout: 1 version byte (0x01), then per stored vector
  * at its offset: `[dataSize: int BE][data][crc32(data): int BE]`
  * where `data` = `[magic 1681511377: int LE][RoaringBitmapArray
  * "portable" serialization]`. The portable format: `[number of
  * NON-EMPTY 32-bit bitmaps: long LE]` then each bitmap as `[key:
  * int LE]` (its high 32 bits; keys ascending, empty bitmaps
  * skipped) followed by the standard RoaringFormatSpec layout
  * (cookie, per-container keys + cardinalities, optional offsets,
  * then array / bitmap / run containers, all little-endian). A
  * 64-bit deleted position = `key << 32 | 32-bit member`.
  *
  * Scale shape: descriptors record `sizeInBytes`/`cardinality`, so
  * the reader can budget; bytes are fetched once per file (KB–MB
  * sidecars) and EXPANDED ON EXECUTORS — the driver never holds the
  * position lists, only the compressed bitmaps. */
object DeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- z-base85 (RFC 1924 alphabet — what Delta's Base85Codec uses)

  private val Alphabet: Array[Char] =
    ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  private val Reverse: Array[Int] = {
    val r = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** Decode base85 text to bytes (input length must be 5k, output 4k
    * — Delta always encodes padded groups). */
  def base85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 length ${s.length} not a multiple of 5")
    val out = ByteBuffer.allocate(s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val v = if (c < 128) Reverse(c.toInt) else -1
        require(v >= 0, s"invalid base85 char '$c'")
        acc = acc * 85 + v
      }
      out.putInt((acc & 0xFFFFFFFFL).toInt)
      i += 5
    }
    out.array()
  }

  def base85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"base85 input length ${b.length} not a multiple of 4")
    val sb = new StringBuilder
    val buf = ByteBuffer.wrap(b)
    while (buf.hasRemaining) {
      var acc = buf.getInt.toLong & 0xFFFFFFFFL
      val group = new Array[Char](5)
      (4 to 0 by -1).foreach { j => group(j) = Alphabet((acc % 85).toInt); acc /= 85 }
      sb.appendAll(group)
    }
    sb.toString
  }

  // ---- descriptor → bitmap data bytes (magic + portable bitmap)

  private val Magic = 1681511377

  /** Resolve the on-disk DV file for a `u`/`p` descriptor. */
  def dvFilePath(tablePath: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"bad u-form DV id: $enc")
      val (prefix, uuidEnc) = enc.splitAt(enc.length - 20)
      val bytes = base85Decode(uuidEnc)
      val bb = ByteBuffer.wrap(bytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tablePath, name)
      else new Path(new Path(tablePath, prefix), name)
    case other => throw new UnsupportedOperationException(
      s"DV storage type '$other' is not a file form")
  }

  /** Fetch the serialized bitmap DATA (magic verified) for any
    * descriptor form. Bounded by `sizeInBytes` — sidecars are KB–MB. */
  def loadData(conf: Configuration, tablePath: String, d: Descriptor): Array[Byte] = {
    val data: Array[Byte] = d.storageType match {
      case "i" => base85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case _ =>
        val p = dvFilePath(tablePath, d)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          val version = in.readByte()
          require(version == 1, s"unsupported DV file version $version at $p")
          in.seek(d.offset.getOrElse(1).toLong)
          val size = in.readInt() // big-endian per the format
          require(size == d.sizeInBytes,
            s"DV size mismatch at $p: stored $size, descriptor ${d.sizeInBytes}")
          val buf = new Array[Byte](size)
          in.readFully(buf)
          val crc = in.readInt()
          val c = new CRC32(); c.update(buf)
          require(crc == c.getValue.toInt,
            s"DV checksum mismatch at $p — corrupt sidecar")
          buf
        } finally in.close()
    }
    val magic = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(magic == Magic, s"bad DV magic $magic (expected $Magic)")
    data
  }

  // ---- Iceberg v3 deletion-vector-v1 blobs (Puffin-framed) ----
  // The v3 spec chose DELTA's representation verbatim: one blob =
  // [length of magic+vector, 4B big-endian][magic + portable 64-bit
  // roaring vector — exactly `serializeData`'s output][CRC-32 of
  // magic+vector, 4B big-endian]. Delta's 1-byte sidecar version is
  // absent — Puffin's own framing replaces it.

  /** Serialize positions as one `deletion-vector-v1` blob. */
  def dvBlobBytes(positions: Seq[Long]): Array[Byte] = {
    val data = serializeData(positions)
    val c = new CRC32(); c.update(data)
    val bb = ByteBuffer.allocate(data.length + 8) // big-endian default
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt(c.getValue.toInt)
    bb.array()
  }

  /** Decode one blob (CRC + magic verified) to ascending positions. */
  def dvBlobPositions(blob: Array[Byte]): Array[Long] = {
    require(blob.length >= 8, s"DV blob too short: ${blob.length}")
    val n = ByteBuffer.wrap(blob, 0, 4).getInt
    require(n >= 4 && n <= blob.length - 8, s"bad DV blob length $n")
    val data = java.util.Arrays.copyOfRange(blob, 4, 4 + n)
    val c = new CRC32(); c.update(data)
    require(ByteBuffer.wrap(blob, 4 + n, 4).getInt == c.getValue.toInt,
      "DV blob CRC mismatch")
    deletedRows(data)
  }

  /** Ranged read of one blob out of a Puffin file (executor-side:
    * `content_size_in_bytes` bytes at `content_offset` — never the
    * whole file). */
  def readIcebergDvBlob(conf: Configuration, path: String,
                        offset: Long, size: Long): Array[Long] = {
    require(size > 0 && size <= Int.MaxValue, s"bad DV blob size $size")
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val buf = new Array[Byte](size.toInt)
    try { in.seek(offset); in.readFully(buf) } finally in.close()
    dvBlobPositions(buf)
  }

  // ---- RoaringBitmapArray portable (de)serialization

  /** All deleted row positions in ascending order. Runs on executors
    * (pure bytes in, longs out). */
  def deletedRows(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == Magic, "bad DV magic")
    // RoaringFormatSpec portable layout: bitmap COUNT (8B LE), then
    // each NON-EMPTY 32-bit bitmap prefixed by its 4B LE key (the
    // high 32 bits) — keys ascending, empty bitmaps skipped. (The
    // keyless dense layout is the NATIVE format, magic 1681511376 —
    // a different magic; real Delta/Iceberg writers emit this one.)
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var prevKey = -1L
    (0L until nBitmaps).foreach { _ =>
      val key = bb.getInt & 0xFFFFFFFFL
      require(key > prevKey, s"DV bitmap keys not ascending at $key")
      prevKey = key
      val high = key << 32
      readRoaring32(bb).foreach(v => out += (high | (v & 0xFFFFFFFFL)))
    }
    out.result()
  }

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** One standard 32-bit roaring bitmap, positions ascending. */
  private def readRoaring32(bb: ByteBuffer): Array[Int] = {
    val cookie = bb.getInt
    val (size, runBitmap) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val rb = new Array[Byte]((n + 7) / 8)
        bb.get(rb)
        (n, rb)
      } else if (cookie == SerialCookieNoRun) {
        (bb.getInt, null)
      } else throw new IllegalArgumentException(
        s"unknown roaring cookie $cookie")
    def isRun(i: Int): Boolean =
      runBitmap != null && (runBitmap(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    (0 until size).foreach { i =>
      keys(i) = bb.getShort & 0xFFFF
      cards(i) = (bb.getShort & 0xFFFF) + 1
    }
    // the offset header exists for the no-run cookie and for run
    // cookies with >= NoOffsetThreshold containers; containers are
    // laid out in order, so we skip it and read sequentially
    if (runBitmap == null || size >= NoOffsetThreshold)
      (0 until size).foreach(_ => bb.getInt)
    val out = Array.newBuilder[Int]
    (0 until size).foreach { i =>
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xFFFF
        (0 until nRuns).foreach { _ =>
          val start = bb.getShort & 0xFFFF
          val len = bb.getShort & 0xFFFF
          (start to start + len).foreach(v => out += (base | v))
        }
      } else if (cards(i) > 4096) { // bitmap container: 1024 longs
        (0 until 1024).foreach { w =>
          var word = bb.getLong
          var bit = 0
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            out += (base | (w * 64 + t))
            word &= word - 1
            bit += 1
          }
        }
      } else (0 until cards(i)).foreach { _ =>
        out += (base | (bb.getShort & 0xFFFF))
      }
    }
    out.result()
  }

  /** Serialize positions as magic + portable RoaringBitmapArray
    * (array containers — the writer side, used by specs and any
    * future DV-authoring DELETE). */
  def serializeData(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative row position")
    // portable layout (see [[deletedRows]]): only NON-EMPTY bitmaps,
    // ascending key order, each prefixed by its 4-byte LE key
    val byBitmap = positions.sorted.distinct
      .groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val chunks = byBitmap.map { case (key, ps) =>
      (key, serializeRoaring32(ps.map(p => (p & 0xFFFFFFFFL).toInt)))
    }
    val total = 4 + 8 + chunks.map(c => 4 + c._2.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(chunks.size.toLong)
    chunks.foreach { case (key, bytes) => bb.putInt(key); bb.put(bytes) }
    bb.array()
  }

  private def serializeRoaring32(members: Seq[Int]): Array[Byte] = {
    val byKey = members.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    byKey.foreach { case (_, vs) => require(vs.size <= 4096,
      "spec serializer only writes array containers (<= 4096 per key)") }
    val size = byKey.size
    val bb = ByteBuffer.allocate(4 + 4 + size * 4 + size * 4 +
      members.size * 2).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(size)
    byKey.foreach { case (k, vs) =>
      bb.putShort(k.toShort); bb.putShort((vs.size - 1).toShort)
    }
    // offsets: container i starts after headers
    var off = 4 + 4 + size * 4 + size * 4
    byKey.foreach { case (_, vs) => bb.putInt(off); off += vs.size * 2 }
    byKey.foreach { case (_, vs) =>
      vs.sorted.foreach(v => bb.putShort((v & 0xFFFF).toShort)) }
    bb.array()
  }

  /** Author a `u`-form DV FILE for `positions` under `tablePath`,
    * returning the descriptor to embed in an add action — the
    * test-side twin of [[loadData]] (also the building block for a
    * future merge-on-read DELETE writer). */
  def writeDvFile(conf: Configuration, tablePath: String,
                  positions: Seq[Long]): Descriptor = {
    val data = serializeData(positions)
    val uuid = java.util.UUID.randomUUID()
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val enc = base85Encode(ub.array())
    val p = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try {
      out.writeByte(1) // format version
      val offset = 1
      out.writeInt(data.length) // big-endian
      out.write(data)
      val c = new CRC32(); c.update(data)
      out.writeInt(c.getValue.toInt)
      Descriptor("u", enc, Some(offset), data.length, positions.distinct.size.toLong)
    } finally out.close()
  }
}
