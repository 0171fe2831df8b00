package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{DeletionVectors, DeltaLog}

/** Deletion-vector READ support against hand-committed Delta logs —
  * the public PROTOCOL.md sidecar format (z-base85 ids, versioned
  * `.bin` files with size/crc framing, magic + portable
  * RoaringBitmapArray): rows marked deleted are filtered at scan,
  * counts match, non-DV files are untouched, the DSv2 batch scan and
  * the catalog serve DV tables identically to DeltaLog.read, the
  * cardinality-gated DELETE arm authors sidecars, and the change feed
  * expresses DV deletes as position diffs (only the file-granular
  * STREAMING source still gates loudly on DV commits). */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def writeDataFile(table: String, rel: String,
                            df: org.apache.spark.sql.DataFrame): Long = {
    val tmp = Files.createTempDirectory("graft-dv-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = Paths.get(table, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(part.toPath, dst)
    dst.toFile.length()
  }

  private def commit(table: String, v: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"$v%020d.json"), lines.mkString("\n") + "\n")
  }

  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val dvProto =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  private def metaLine(schemaJson: String, partCols: Seq[String] = Nil): String = {
    val pc = partCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metaData":{"id":"t-dv","format":{"provider":"parquet","options":{}},"schemaString":${ujson(schemaJson)},"partitionColumns":$pc,"configuration":{},"createdTime":1}}"""
  }

  private def dvJson(d: DeletionVectors.Descriptor): String = {
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"$off,"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }

  test("roaring codec round-trips across keys and bitmaps; base85 round-trips") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(1L, 3L, 7L),
      Seq(65535L, 65536L, 131071L), // across 16-bit keys
      (0L until 5000L by 3L).toSeq, // many values, several... one key
      Seq(1L, (1L << 32) + 5L, (3L << 32) + 9L)) // across 32-bit bitmaps
    cases.foreach { ps =>
      val got = DeletionVectors.deletedRows(DeletionVectors.serializeData(ps))
      assert(got.toSeq === ps.sorted.distinct, s"case $ps")
    }
    val bytes = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    assert(DeletionVectors.base85Decode(
      DeletionVectors.base85Encode(bytes)).toSeq === bytes.toSeq)

    // hand-built BITMAP container (cardinality > 4096) and RUN
    // container, which the array-only serializer never emits
    def bitmapContainer(): Array[Byte] = {
      val members = (0 until 5000).map(_ * 2) // even values < 10000
      val bb = ByteBuffer.allocate(4 + 8 + 4 + 4 + 4 + 4 + 4 + 8192)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377); bb.putLong(1L) // magic, one bitmap
      bb.putInt(0) // portable layout: the bitmap's 4-byte key
      bb.putInt(12346); bb.putInt(1) // no-run cookie, 1 container
      bb.putShort(0.toShort); bb.putShort((members.size - 1).toShort)
      bb.putInt(4 + 4 + 4 + 4) // offset header
      val words = new Array[Long](1024)
      members.foreach(v => words(v / 64) |= (1L << (v % 64)))
      words.foreach(bb.putLong)
      bb.array()
    }
    assert(DeletionVectors.deletedRows(bitmapContainer()).toSeq
      === (0 until 5000).map(v => (v * 2).toLong))
    def runContainer(): Array[Byte] = {
      // run cookie, 1 container, runs [10..14] and [100..100]
      val bb = ByteBuffer.allocate(4 + 8 + 4 + 4 + 1 + 4 + 2 + 4 + 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377); bb.putLong(1L)
      bb.putInt(0) // portable layout: the bitmap's 4-byte key
      bb.putInt(12347 | (0 << 16)) // run cookie, size-1=0
      bb.put(1.toByte) // run bitset: container 0 is a run container
      bb.putShort(0.toShort); bb.putShort(5.toShort) // key 0, card 6
      // < 4 containers -> no offset header
      bb.putShort(2.toShort) // 2 runs
      bb.putShort(10.toShort); bb.putShort(4.toShort)
      bb.putShort(100.toShort); bb.putShort(0.toShort)
      bb.array()
    }
    assert(DeletionVectors.deletedRows(runContainer()).toSeq
      === Seq(10L, 11L, 12L, 13L, 14L, 100L))

    // SPARSE portable layout: bitmaps keyed 2 and 5 only — empty
    // bitmaps are SKIPPED and each serialized bitmap is prefixed by
    // its 4-byte LE key (RoaringFormatSpec portable layout; the
    // count is the number of NON-EMPTY bitmaps, not max key + 1) —
    // the exact byte shape real Delta/Iceberg DV writers emit
    def sparseKeys(): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 + (4 + 18) * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377); bb.putLong(2L)
      Seq(2, 5).foreach { key =>
        bb.putInt(key) // the bitmap's key (its high 32 bits)
        bb.putInt(12346); bb.putInt(1) // no-run cookie, 1 container
        bb.putShort(0.toShort); bb.putShort(0.toShort) // ckey 0, card 1
        bb.putInt(4 + 4 + 4 + 4) // offset header
        bb.putShort(key.toShort) // single member (= key, arbitrary)
      }
      bb.array()
    }
    assert(DeletionVectors.deletedRows(sparseKeys()).toSeq
      === Seq((2L << 32) | 2L, (5L << 32) | 5L))
    // and the serializer emits the identical sparse layout back
    assert(DeletionVectors.serializeData(
      Seq((2L << 32) | 2L, (5L << 32) | 5L)).toSeq === sparseKeys().toSeq)
  }

  test("DV table read filters deleted rows; non-DV files untouched; DSv2 scan applies the vector") {
    val t = Files.createTempDirectory("graft-dv").toString + "/t"
    val df1 = Seq((0L, "r0"), (1L, "r1"), (2L, "r2"), (3L, "r3"), (4L, "r4"))
      .toDF("k", "v")
    val df2 = Seq((10L, "s0"), (11L, "s1")).toDF("k", "v")
    val s1 = writeDataFile(t, "f1.parquet", df1)
    val s2 = writeDataFile(t, "f2.parquet", df2)
    // physical rows 1 and 3 of f1 are deleted via a u-form DV file
    val d = DeletionVectors.writeDvFile(
      spark.sparkContext.hadoopConfiguration, t, Seq(1L, 3L))
    commit(t, 0, Seq(dvProto, metaLine(df1.schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":5,"dataChange":true,"deletionVector":${dvJson(d)}}}""",
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":$s2,"modificationTime":5,"dataChange":true}}"""))
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got === Set((0L, "r0"), (2L, "r2"), (4L, "r4"),
      (10L, "s0"), (11L, "s1")))
    assert(DeltaLog.read(spark, t).count() === 5L)
    // the snapshot surfaces the descriptor
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.flatMap(_.dv).map(_.cardinality) === Seq(2L))
    // CDC over the creating DV commit: a brand-new file streams its
    // LIVE rows only (its own vector applied)
    assert(DeltaLog.changes(spark, t, -1L, 0L)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
      === Set((0L, "insert"), (2L, "insert"), (4L, "insert"),
        (10L, "insert"), (11L, "insert")))
    // the DSv2 batch scan applies the vector — catalog/format users
    // read DV tables identically to DeltaLog.read
    assert(spark.read.format("graft-delta").load(t).as[(Long, String)]
      .collect().toSet === got)
    // residual filters still apply over the wrapped row-based reader
    assert(spark.read.format("graft-delta").load(t)
      .where(col("k") >= 2L).as[(Long, String)].collect().toSet
      === Set((2L, "r2"), (4L, "r4"), (10L, "s0"), (11L, "s1")))
  }

  test("cardinality-gated DV DELETE commits a sidecar, not a rewrite; large deletes fall back to copy-on-write") {
    val t = Files.createTempDirectory("graft-dv-del").toString + "/t"
    DeltaLog.write(spark,
      spark.range(100).select(col("id").as("k"), (col("id") % 5).as("g"))
        .repartition(2), t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      val before = DeltaLog.snapshot(spark, t)
      val v = DeltaLog.delete(spark, t, col("k") === 7L || col("k") === 42L)
      assert(v === 1L)
      val after = DeltaLog.snapshot(spark, t)
      // SAME physical files — no rewrite, just descriptors
      assert(after.files.map(_.path).toSet === before.files.map(_.path).toSet)
      assert(after.files.flatMap(_.dv).map(_.cardinality).sum === 2L)
      val live = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
      assert(live.size === 98 && !live(7L) && !live(42L))
      // time travel still reads the deleted rows
      assert(DeltaLog.read(spark, t, versionAsOf = Some(0L)).count() === 100L)
      // a second DV delete MERGES positions (never loses the old DV)
      DeltaLog.delete(spark, t, col("k") === 8L)
      assert(DeltaLog.snapshot(spark, t).files.flatMap(_.dv)
        .map(_.cardinality).sum === 3L)
      assert(DeltaLog.read(spark, t).count() === 97L)
      // DSv2 scan agrees, with a residual filter
      assert(spark.read.format("graft-delta").load(t).count() === 97L)
      assert(spark.read.format("graft-delta").load(t)
        .where(col("g") === 2L).select("k").as[Long].collect().toSet
        === (0L until 100L).filter(k => k % 5 == 2 && k != 7L && k != 42L).toSet)
      // DVs survive checkpoint consolidation
      DeltaLog.checkpoint(spark, t, 2L)
      assert(DeltaLog.read(spark, t).count() === 97L)
      // the change feed expresses DV deletes as the POSITION DIFF —
      // exactly the newly-deleted rows, never whole-file churn
      assert(DeltaLog.changes(spark, t, 0L, 1L)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
        === Set((7L, "delete"), (42L, "delete")))
      assert(DeltaLog.changes(spark, t, 1L, 2L)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
        === Set((8L, "delete")))
      // a full-history poll composes inserts + the two DV diffs
      val all = DeltaLog.changes(spark, t, -1L, 2L)
        .groupBy("_change_type").count()
        .as[(String, Long)].collect().toMap
      assert(all === Map("insert" -> 100L, "delete" -> 3L))
      // OPTIMIZE applies the vectors during compaction: deleted rows
      // must NOT resurrect, the compacted files carry no DV, and the
      // dataChange=false swap is invisible to the change feed
      val vOpt = DeltaLog.optimize(spark, t, targetFileBytes = Long.MaxValue)
      assert(DeltaLog.read(spark, t).count() === 97L)
      assert(DeltaLog.snapshot(spark, t).files.flatMap(_.dv).isEmpty)
      assert(DeltaLog.changes(spark, t, 2L, vOpt).count() === 0L)
      // a DV delete on the compacted file: liveness tracked the
      // dataChange=false move, so the feed emits ONLY the diff (not
      // the whole compacted file as inserts)
      val vD = DeltaLog.delete(spark, t, col("k") === 11L)
      assert(DeltaLog.read(spark, t).count() === 96L)
      assert(DeltaLog.changes(spark, t, 2L, vD)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
        === Set((11L, "delete")))
      // over the gate -> copy-on-write, which APPLIES existing DVs
      // (rewritten survivors must not resurrect 7/8/42)
      spark.conf.set("spark.graft.dv.maxDeleteRows", "0")
      val v2 = DeltaLog.delete(spark, t, col("g") === 0L)
      val live2 = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
      assert(live2.size === 76 && !live2(7L) && !live2(8L) && !live2(42L) &&
        !live2(11L) && !live2(0L) && !live2(5L))
      // the COW rewrite dropped the vectors with the files
      assert(DeltaLog.snapshot(spark, t).files.flatMap(_.dv).isEmpty)
      assert(v2 === 5L)
    } finally {
      spark.conf.unset("spark.graft.dv.enabled")
      spark.conf.unset("spark.graft.dv.maxDeleteRows")
    }
  }

  test("DV UPDATE: matched positions delete via DV, transformed rows append fresh — one commit, no rewrite") {
    val t = Files.createTempDirectory("graft-dv-upd").toString + "/t"
    DeltaLog.write(spark, spark.range(30)
      .select(col("id").as("k"), (col("id") % 3).as("g")).coalesce(1), t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      val before = DeltaLog.snapshot(spark, t)
      val v = DeltaLog.update(spark, t,
        col("k") === 5L || col("k") === 7L, Map("g" -> lit(99L)))
      assert(v === 1L)
      val after = DeltaLog.snapshot(spark, t)
      // original file KEPT (now DV'd); exactly one fresh file appended
      assert(before.files.map(_.path).toSet
        .subsetOf(after.files.map(_.path).toSet))
      assert(after.files.flatMap(_.dv).map(_.cardinality).sum === 2L)
      assert(after.files.size === before.files.size + 1)
      val rows = DeltaLog.read(spark, t).as[(Long, Long)].collect().toSet
      assert(rows.size === 30 && rows((5L, 99L)) && rows((7L, 99L)) &&
        !rows((5L, 2L)) && !rows((7L, 1L)))
      // the change feed shows exactly the position diff + the fresh rows
      val ch = DeltaLog.changes(spark, t, 0L, v)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
      assert(ch === Set((5L, "delete"), (7L, "delete"),
        (5L, "insert"), (7L, "insert")))
      // simultaneous semantics hold through the DV arm too
      DeltaLog.update(spark, t, col("k") === 3L,
        Map("k" -> col("g"), "g" -> col("k")))
      val rows2 = DeltaLog.read(spark, t).as[(Long, Long)].collect().toSeq
      assert(rows2.size === 30 && rows2.contains((0L, 3L)) &&
        !rows2.contains((3L, 0L)))
      // time travel + the DSv2 scan agree
      assert(DeltaLog.read(spark, t, versionAsOf = Some(0L)).count() === 30L)
      assert(spark.read.format("graft-delta").load(t).count() === 30L)
    } finally spark.conf.unset("spark.graft.dv.enabled")
  }

  test("SQL DELETE through the catalog takes the DV arm when enabled") {
    val root = Files.createTempDirectory("graft-dv-cat").toString
    spark.conf.set("spark.sql.catalog.graft_dv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dv.root", root)
    val t = s"$root/ns/t"
    DeltaLog.write(spark,
      spark.range(50).select(col("id").as("k"), (col("id") % 3).as("g")), t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      val before = DeltaLog.snapshot(spark, t)
      spark.sql("DELETE FROM graft_dv.ns.t WHERE k = 13")
      val after = DeltaLog.snapshot(spark, t)
      assert(after.files.map(_.path).toSet === before.files.map(_.path).toSet)
      assert(after.files.flatMap(_.dv).map(_.cardinality).sum === 1L)
      // catalog SELECT serves the DV table, matching DeltaLog.read
      assert(spark.sql("SELECT k FROM graft_dv.ns.t").as[Long]
        .collect().toSet
        === DeltaLog.read(spark, t).select("k").as[Long].collect().toSet)
      assert(spark.sql("SELECT count(*) FROM graft_dv.ns.t")
        .as[Long].head() === 49L)
    } finally spark.conf.unset("spark.graft.dv.enabled")
  }

  test("DSv2 scan ships DESCRIPTORS, not positions: large external DVs decode on executors") {
    // an EXTERNAL-shape table whose DV cardinality is far above the
    // write gates — the scan must plan it without expanding a single
    // position on the driver
    val t = Files.createTempDirectory("graft-dv-big").toString + "/t"
    val n = 120000
    val df = (0 until n).map(i => (i.toLong, i % 7)).toDF("k", "g")
    val sz = writeDataFile(t, "f1.parquet", df.sort("k"))
    val deleted = (0L until n.toLong by 16L) // 7500 positions
    val d = DeletionVectors.writeDvFile(
      spark.sparkContext.hadoopConfiguration, t, deleted)
    commit(t, 0, Seq(dvProto, metaLine(df.schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":5,"dataChange":true,"deletionVector":${dvJson(d)}}}"""))
    // plan shape: the DV partition carries the descriptor only
    val tbl = new graft.sources.GraftDeltaTable(spark, t)
    val parts = tbl.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    val dvParts = parts.collect { case p: graft.sources.DeltaDvPartition => p }
    assert(dvParts.length === 1)
    assert(dvParts.head.dvA.exists(_.cardinality === deleted.size.toLong))
    assert(!dvParts.head.select && dvParts.head.dvB.isEmpty)
    // rows: executors decode and skip exactly the vector's positions
    val got = spark.read.format("graft-delta").load(t)
    assert(got.count() === (n - deleted.size).toLong)
    assert(got.where(col("k") % 16 === 0).count() === 0L)
    assert(got.where(col("k") === 1L).count() === 1L)
  }

  test("inline DVs and partitioned DV tables filter correctly") {
    // inline: the descriptor carries the base85 of the bitmap data
    val t = Files.createTempDirectory("graft-dv-i").toString + "/t"
    val df1 = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val s1 = writeDataFile(t, "f1.parquet", df1)
    val data = DeletionVectors.serializeData(Seq(0L, 2L))
    val padded = data ++ Array.fill[Byte]((4 - data.length % 4) % 4)(0)
    val inline = DeletionVectors.Descriptor("i",
      DeletionVectors.base85Encode(padded), None, data.length, 2L)
    commit(t, 0, Seq(dvProto, metaLine(df1.schema.json),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":5,"dataChange":true,"deletionVector":${dvJson(inline)}}}"""))
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "b")))

    // partitioned: DV on one partition's file, pv re-attach intact
    val tp = Files.createTempDirectory("graft-dv-p").toString + "/t"
    val full = Seq((0L, "x"), (1L, "x"), (9L, "y")).toDF("k", "p")
    val sx = writeDataFile(tp, "p=x/f1.parquet",
      Seq(Tuple1(0L), Tuple1(1L)).toDF("k"))
    val sy = writeDataFile(tp, "p=y/f2.parquet", Seq(Tuple1(9L)).toDF("k"))
    val dp = DeletionVectors.writeDvFile(
      spark.sparkContext.hadoopConfiguration, tp, Seq(0L))
    commit(tp, 0, Seq(dvProto, metaLine(full.schema.json, Seq("p")),
      s"""{"add":{"path":"p=x/f1.parquet","partitionValues":{"p":"x"},"size":$sx,"modificationTime":5,"dataChange":true,"deletionVector":${dvJson(dp)}}}""",
      s"""{"add":{"path":"p=y/f2.parquet","partitionValues":{"p":"y"},"size":$sy,"modificationTime":5,"dataChange":true}}"""))
    assert(DeltaLog.read(spark, tp).as[(Long, String)].collect().toSet
      === Set((1L, "x"), (9L, "y")))
    // partition pruning composes with the DV filter
    assert(DeltaLog.readWhere(spark, tp, col("p") === "x")
      .as[(Long, String)].collect().toSet === Set((1L, "x")))
  }
}
