package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** ANALYZE TABLE → Puffin statistics files: container format
  * round-trip, KMV NDV quality, metadata binding, lifecycle
  * integration (expire prunes entries, orphan cleanup spares the
  * files), and the SQL surfaces. */
class IcebergStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-stats").toString + "/t"

  private def sortedU(hs: Seq[Long]): Seq[Long] =
    hs.distinct.sortBy(_ ^ Long.MinValue)

  test("Puffin write/read round-trip: magic framing, footer JSON, blob bytes") {
    val dir = Files.createTempDirectory("graft-puffin").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir, "s.stats")
    val b1 = Puffin.Blob("graft-kmv-v1", Seq(1), 42L, 7L,
      Array[Byte](1, 2, 3, 4), Map("ndv" -> "123"))
    val b2 = Puffin.Blob("graft-kmv-v1", Seq(2), 42L, 7L,
      Array[Byte](9, 9), Map("ndv" -> "5"))
    val (size, footerSize, metas) = Puffin.write(fs, p, Seq(b1, b2),
      Map("created-by" -> "graft"))
    assert(size === fs.getFileStatus(p).getLen && footerSize > 0)
    val (back, props) = Puffin.readFooter(fs, p)
    assert(props("created-by") === "graft")
    assert(back.map(_.blobType) === Seq("graft-kmv-v1", "graft-kmv-v1"))
    assert(back.map(_.fields) === Seq(Seq(1), Seq(2)))
    assert(back.head.properties("ndv") === "123")
    assert(Puffin.readBlob(fs, p, back.head).toSeq === Seq[Byte](1, 2, 3, 4))
    assert(Puffin.readBlob(fs, p, back(1)).toSeq === Seq[Byte](9, 9))
    assert(metas.map(_.offset) === back.map(_.offset))
  }

  test("KMV sketch: exact below k, within 5% above k, serde round-trip") {
    val all = (1 to 50000).map(i => s"v$i").toDF("s")
      .select(xxhash64(col("s"))).as[Long].collect().toSeq
    // exact: fewer distincts than k
    assert(KmvSketch.estimate(1024, sortedU(all.take(100))) === 100L)
    // estimate: 50k distincts through a k=1024 sketch
    val mins = sortedU(all).take(1024)
    val est = KmvSketch.estimate(1024, mins)
    assert(math.abs(est - 50000L) < 2500L, s"estimate $est vs 50000")
    val (k, hs) = KmvSketch.deserialize(KmvSketch.serialize(1024, mins))
    assert(k === 1024 && hs === mins)
  }

  test("analyzeTable publishes per-column ndv; DESCRIBE EXTENDED shows it") {
    val t = tmp()
    IcebergTable.write(spark,
      (1 to 2000).map(i => (i.toLong, i % 17, s"s${i % 300}"))
        .toDF("id", "k", "s"), t)
    IcebergTable.analyzeTable(spark, t)
    val stats = IcebergTable.columnStats(spark, t)
    assert(stats("k") === 17L) // below the sketch's k -> exact
    assert(stats("s") === 300L)
    assert(math.abs(stats("id") - 2000L) <= 200L, // 2000 > k -> estimate
      s"id ndv ${stats("id")}")
    val meta = spark.sql(s"DESCRIBE EXTENDED '$t'")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(meta.contains(("k", "ndv 17")))
    // CALL surface + column subset replaces the snapshot's entry
    spark.sql(s"CALL graft.system.analyze_table('$t', 'k')").collect()
    assert(IcebergTable.columnStats(spark, t) === Map("k" -> 17L))
  }

  test("stats survive appends (carried), expire prunes dead entries, orphans spare the file") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("id", "s"), t)
    IcebergTable.analyzeTable(spark, t)
    val analyzedSnap = IcebergTable.snapshot(spark, t).snapshotId
    // a rebuilt-root append must CARRY the statistics list
    IcebergTable.write(spark, Seq((2L, "b")).toDF("id", "s"), t)
    val carried = IcebergTable.columnStats(spark, t)
    assert(carried("id") === 1L)
    val fs = new Path(t).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val statsFile =
      fs.globStatus(new Path(t, "metadata/*.stats")).head.getPath
    // orphan cleanup with a future cutoff must not reap the
    // referenced statistics file
    IcebergTable.removeOrphanFiles(spark, t,
      olderThanMs = System.currentTimeMillis() + 3600000L)
    assert(fs.exists(statsFile))
    // expiring the analyzed snapshot drops its statistics entry
    IcebergTable.expireSnapshots(spark, t, keepSnapshots = 1)
    assert(IcebergTable.columnStats(spark, t).isEmpty,
      "expired snapshot's statistics entry must drop")
    assert(IcebergTable.snapshot(spark, t).snapshotId !== analyzedSnap)
  }

  test("ANALYZE NDVs feed the DSv2 scan's CBO column statistics") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("cbo").toString + "/t"
    IcebergTable.write(spark,
      (0 until 300).map(i => (i.toLong, s"g${i % 7}")).toDF("k", "g"), t)
    IcebergTable.analyzeTable(spark, t, Seq("k", "g"))

    def colStats = {
      val table = new graft.sources.GraftIcebergTable(spark, t)
      table.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics().columnStats()
    }
    // CBO off (default): no metadata lookup, no stats served
    assert(colStats.isEmpty)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val cs = colStats
      assert(!cs.isEmpty, "analyzed NDVs must surface under CBO")
      val byName = {
        val it = cs.entrySet().iterator()
        val b = Map.newBuilder[String, Long]
        while (it.hasNext) { val e = it.next()
          b += e.getKey.fieldNames()(0) -> e.getValue.distinctCount().getAsLong }
        b.result()
      }
      assert(byName("g") === 7L)
      assert(math.abs(byName("k") - 300L) <= 9L) // KMV exact below k=1024
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("FOREIGN stats: an apache-datasketches-theta-v1 blob's ndv is served from the Puffin footer") {
    // a table ANALYZEd by ANOTHER engine: the statistics entry's
    // blob-metadata carries NO properties (some writers only record
    // `ndv` in the Puffin footer), the blob type is the theta sketch
    // — the `ndv` blob property, not the sketch bytes, is the spec's
    // cross-engine contract and must still reach columnStats
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    val snap = IcebergTable.snapshot(spark, t)
    val idOf: Map[String, Int] = snap.fieldNames.map(_.swap)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsPath = new Path(new Path(t, "metadata"), "foreign.stats")
    Puffin.write(fs, statsPath, Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(idOf("id")),
        snap.snapshotId, 1L, Array[Byte](1, 2, 3),
        Map("ndv" -> "77")),
      Puffin.Blob("apache-datasketches-theta-v1", Seq(idOf("s")),
        snap.snapshotId, 1L, Array[Byte](4, 5),
        Map("ndv" -> "9"))),
      Map("created-by" -> "trino"))
    // splice the statistics entry the foreign way: blob-metadata
    // WITHOUT properties
    val top = IcebergTable.latestMetadataFile(spark, t)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = {
      val in = fs.open(top)
      try M.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    val e = root.putArray("statistics").addObject()
    e.put("snapshot-id", snap.snapshotId)
    e.put("statistics-path", fs.makeQualified(statsPath).toString)
    e.put("file-size-in-bytes", fs.getFileStatus(statsPath).getLen)
    val bms = e.putArray("blob-metadata")
    Seq("id" -> idOf("id"), "s" -> idOf("s")).foreach { case (_, fid) =>
      val b = bms.addObject()
      b.put("type", "apache-datasketches-theta-v1")
      b.putArray("fields").add(fid)
      b.put("snapshot-id", snap.snapshotId)
      b.put("sequence-number", 1L)
      // NO properties object — the footer is the only ndv source
    }
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()

    assert(IcebergTable.columnStats(spark, t) === Map("id" -> 77L, "s" -> 9L))
    // graft-authored metadata-mirrored values still win over footer
    IcebergTable.analyzeTable(spark, t, Seq("id"))
    assert(IcebergTable.columnStats(spark, t) === Map("id" -> 2L))
  }

  /** Synthetic Apache DataSketches Theta COMPACT sketch bytes
    * (serialization v3, family 3, little-endian preamble) — the
    * public wire format other engines' ANALYZE writes. */
  private def thetaBytes(preLongs: Int, flags: Int, curCount: Int,
                         theta: Long, hashes: Seq[Long] = Nil): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(preLongs * 8 + hashes.size * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(preLongs.toByte).put(3.toByte).put(3.toByte) // serVer, family
      .put(12.toByte).put(5.toByte).put(flags.toByte)
      .putShort(0x93CC.toShort) // seed hash (irrelevant to decode)
    if (preLongs >= 2) bb.putInt(curCount).putFloat(1.0f)
    if (preLongs >= 3) bb.putLong(theta)
    hashes.foreach(bb.putLong)
    bb.array()
  }

  test("FOREIGN theta sketch BODY decodes to the estimate when the ndv property is absent everywhere") {
    // unit shapes first: estimation, exact, empty, single-item, junk
    val est = Puffin.thetaEstimate(
      thetaBytes(3, 0x1A, 500, Long.MaxValue / 2, Seq(11L, 22L)))
    assert(est === Some(1000L), s"estimation mode: $est")
    assert(Puffin.thetaEstimate(
      thetaBytes(2, 0x1A, 42, 0L)) === Some(42L)) // exact: theta = MAX
    assert(Puffin.thetaEstimate(
      thetaBytes(1, 0x04 | 0x1A, 0, 0L)) === Some(0L)) // EMPTY flag
    assert(Puffin.thetaEstimate(
      thetaBytes(1, 0x1A, 0, 0L, Seq(99L))) === Some(1L)) // single item
    assert(Puffin.thetaEstimate(Array[Byte](1, 2, 3)) === None)
    assert(Puffin.thetaEstimate(
      Array[Byte](3, 2, 3, 0, 0, 0, 0, 0)) === None) // wrong serVer

    // integration: a foreign stats file whose theta blobs carry NO
    // ndv property anywhere still feeds columnStats via the body
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    val snap = IcebergTable.snapshot(spark, t)
    val idOf: Map[String, Int] = snap.fieldNames.map(_.swap)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsPath = new Path(new Path(t, "metadata"), "foreign-body.stats")
    Puffin.write(fs, statsPath, Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(idOf("id")),
        snap.snapshotId, 1L,
        thetaBytes(3, 0x1A, 300, Long.MaxValue / 4), Map.empty),
      Puffin.Blob("apache-datasketches-theta-v1", Seq(idOf("s")),
        snap.snapshotId, 1L,
        thetaBytes(2, 0x1A, 17, 0L), Map.empty)),
      Map("created-by" -> "trino"))
    val top = IcebergTable.latestMetadataFile(spark, t)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = {
      val in = fs.open(top)
      try M.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    val e = root.putArray("statistics").addObject()
    e.put("snapshot-id", snap.snapshotId)
    e.put("statistics-path", fs.makeQualified(statsPath).toString)
    e.put("file-size-in-bytes", fs.getFileStatus(statsPath).getLen)
    e.putArray("blob-metadata") // empty: the footer is all there is
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()

    assert(IcebergTable.columnStats(spark, t) ===
      Map("id" -> 1200L, "s" -> 17L))
  }
}
