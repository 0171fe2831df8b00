package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native reader (and minimal writer) for the PUBLIC Delta Lake
  * transaction-log format — the open JSON spec every Delta table on
  * disk follows (delta-io PROTOCOL.md): a `_delta_log/` directory of
  * zero-padded `<version>.json` commit files, each line one action
  * (`protocol`, `metaData`, `add`, `remove`, `commitInfo`), plus
  * optional `<version>.checkpoint.parquet` consolidations referenced
  * from `_last_checkpoint`.
  *
  * The reference pipeline stores every bronze/silver/gold table as
  * Delta (reference gold_transformation.py:57-62 — `.format("delta")
  * .saveAsTable`), so a consumer switching to graft needs to POINT
  * GRAFT AT REAL DELTA TABLES. [[VersionedTable]] is a parquet+CAS
  * *analog* of the same ideas (snapshot isolation, time travel); this
  * object is the *interop* leg:
  *
  *  - [[snapshot]] / [[read]]: replay a real `_delta_log` into the
  *    live add-file set at a version and read it as a DataFrame,
  *    with `versionAsOf` / `timestampAsOf` time travel.
  *  - [[exportFromVersioned]]: emit a real `_delta_log` for an
  *    existing [[VersionedTable]] so any Delta reader can consume
  *    graft output (one Delta commit per graft version).
  *
  * Scale shape: checkpoint parquet (the bulk of a large table's
  * file list — millions of add actions) is read DISTRIBUTED via
  * spark.read.parquet; only the post-checkpoint JSON tail (bounded:
  * Delta checkpoints every ~10 commits) and the 1-row
  * protocol/metaData results are collected. The add/remove replay is
  * a groupBy(path).max(version) — one combinable shuffle over the
  * file list, never over data.
  *
  * Unsupported (checked, explicit error — never silent wrong
  * results): deletion vectors, column-mapping modes other than
  * `none`, protocol minReaderVersion > 3 without readerFeatures we
  * honor. Reader-version-3 tables are readable iff every listed
  * readerFeature is in [[SupportedReaderFeatures]].
  */
object DeltaLog {

  /** Top-level action schema for one commit-log line. Fields we do
    * not interpret (commitInfo, txn, cdc) are omitted — from_json
    * ignores unknown JSON fields by design. */
  private val ActionSchema: StructType = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("format", StructType(Seq(
        StructField("provider", StringType))))))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType))))))

  /** readerFeatures this reader actually honors for protocol v3. */
  val SupportedReaderFeatures: Set[String] =
    Set("timestampNtz", "columnMapping") // columnMapping only in mode none

  /** One live data file of a snapshot. `path` is absolute. */
  final case class AddFile(path: String,
                           partitionValues: Map[String, String],
                           size: Long, modificationTime: Long)

  /** A resolved table state at one version — the common abstraction
    * over real Delta tables ([[snapshot]]) and graft
    * [[VersionedTable]]s ([[snapshotFromVersioned]]). */
  final case class Snapshot(tablePath: String, version: Long,
                            schema: StructType,
                            partitionColumns: Seq[String],
                            files: Seq[AddFile],
                            configuration: Map[String, String])

  private def logDir(tablePath: String) = new Path(tablePath, "_delta_log")

  private def pad20(v: Long): String = f"$v%020d"

  /** List available commit versions (from `<v>.json` file names). */
  def listVersions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"not a Delta table (no _delta_log): $tablePath")
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") =>
        n.stripSuffix(".json").toLong }
      .sorted
  }

  /** Commit-file modification times, for `timestampAsOf` resolution
    * (the same in-commit granularity real Delta uses when no
    * in-commit timestamps are present). */
  private def versionTimes(spark: SparkSession, tablePath: String): Seq[(Long, Long)] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => (st.getPath.getName.stripSuffix(".json").toLong,
        st.getModificationTime))
      .sortBy(_._1)
  }

  /** Latest checkpoint version <= v, if any (single-file classic
    * checkpoints; multi-part checkpoints are rejected explicitly). */
  private def checkpointAt(spark: SparkSession, tablePath: String,
                           v: Long): Option[Long] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    if (names.exists(_.matches("\\d{20}\\.checkpoint\\.\\d+\\.\\d+\\.parquet")))
      throw new UnsupportedOperationException(
        "multi-part Delta checkpoints are not supported by this reader")
    names.collect { case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
      n.stripSuffix(".checkpoint.parquet").toLong }
      .filter(_ <= v).sorted.lastOption
  }

  /** Delta percent-encodes paths in the log (RFC 2396). */
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p, "UTF-8")

  /** Resolve the snapshot at `versionAsOf` (default: latest), or at
    * the greatest version whose commit time is <= `timestampAsOf`
    * (epoch ms). Exactly one of the two selectors may be set. */
  def snapshot(spark: SparkSession, tablePath: String,
               versionAsOf: Option[Long] = None,
               timestampAsOf: Option[Long] = None): Snapshot = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "set at most one of versionAsOf / timestampAsOf")
    val versions = listVersions(spark, tablePath)
    val v: Long = (versionAsOf, timestampAsOf) match {
      case (Some(x), _) =>
        require(versions.contains(x),
          s"version $x not in ${versions.headOption.getOrElse(-1L)}..${versions.lastOption.getOrElse(-1L)}")
        x
      case (_, Some(ts)) =>
        val ok = versionTimes(spark, tablePath).filter(_._2 <= ts)
        require(ok.nonEmpty, s"no commit at or before timestamp $ts")
        ok.map(_._1).max
      case _ => versions.last
    }
    val cp = checkpointAt(spark, tablePath, v)
    val jsonVersions = versions.filter(j => j <= v && cp.forall(j > _))
    val jsonPaths = jsonVersions
      .map(j => new Path(logDir(tablePath), pad20(j) + ".json").toString)

    // JSON tail: distributed text read; the version rides in from
    // the file name so replay order survives the union.
    val jsonActions: Option[DataFrame] =
      if (jsonPaths.isEmpty) None
      else Some(spark.read.text(jsonPaths: _*)
        .select(from_json(col("value"), ActionSchema).as("a"),
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1)
            .cast("long").as("__v"))
        .select(col("a.*"), col("__v")))

    val cpActions: Option[DataFrame] = cp.map { c =>
      val df = spark.read.parquet(
        new Path(logDir(tablePath), pad20(c) + ".checkpoint.parquet").toString)
      def colOrNull(n: String) =
        if (df.columns.contains(n)) col(n) else lit(null).cast(ActionSchema(n).dataType)
      df.select(colOrNull("protocol").as("protocol"),
        colOrNull("metaData").as("metaData"),
        colOrNull("add").as("add"), colOrNull("remove").as("remove"),
        lit(c).as("__v"))
    }

    val actions = (cpActions, jsonActions) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => throw new IllegalStateException("empty delta log")
    }

    // protocol gate — fail loudly rather than read wrong data
    val proto = actions.filter(col("protocol").isNotNull)
      .orderBy(col("__v").desc).select("protocol.*").limit(1).collect()
    proto.headOption.foreach { p =>
      val mrv = p.getAs[Int]("minReaderVersion")
      val feats = Option(p.getAs[scala.collection.Seq[String]]("readerFeatures"))
        .map(_.toSet).getOrElse(Set.empty[String])
      if (mrv > 3 || (mrv == 3 && !feats.subsetOf(SupportedReaderFeatures)))
        throw new UnsupportedOperationException(
          s"unsupported Delta protocol: minReaderVersion=$mrv features=$feats")
    }

    val metaRow = actions.filter(col("metaData").isNotNull)
      .orderBy(col("__v").desc).select("metaData.*").limit(1).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"no metaData action in _delta_log of $tablePath"))
    val conf = Option(metaRow.getAs[scala.collection.Map[String, String]]("configuration"))
      .map(_.toMap).getOrElse(Map.empty[String, String])
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    if (cmMode != "none") throw new UnsupportedOperationException(
      s"delta.columnMapping.mode=$cmMode is not supported")
    val schema = DataType.fromJson(metaRow.getAs[String]("schemaString"))
      .asInstanceOf[StructType]
    val partCols = Option(metaRow.getAs[scala.collection.Seq[String]]("partitionColumns"))
      .map(_.toSeq).getOrElse(Seq.empty)

    // log replay: per path, the action from the highest version wins
    // (within one commit a path appears as add XOR remove). One
    // combinable shuffle over the FILE LIST — data never moves.
    val fileActions = actions.select(
      coalesce(col("add.path"), col("remove.path")).as("path"),
      col("add.path").isNotNull.as("is_add"),
      col("add.partitionValues").as("pv"),
      col("add.size").as("size"),
      col("add.modificationTime").as("mtime"),
      col("add.deletionVector.storageType").as("dv"),
      col("__v"))
      .filter(col("path").isNotNull)
    val live = fileActions
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("path")
          .orderBy(col("__v").desc, col("is_add").asc)))
      .filter(col("__rn") === 1 && col("is_add"))
    val rows = live.select("path", "pv", "size", "mtime", "dv").collect()
    rows.find(_.getAs[String]("dv") != null).foreach { _ =>
      throw new UnsupportedOperationException(
        "Delta deletion vectors are not supported by this reader")
    }
    val files = rows.map { r =>
      AddFile(new Path(tablePath, decodePath(r.getAs[String]("path"))).toString,
        Option(r.getAs[scala.collection.Map[String, String]]("pv"))
          .map(_.toMap).getOrElse(Map.empty),
        Option(r.getAs[java.lang.Long]("size")).map(_.toLong).getOrElse(0L),
        Option(r.getAs[java.lang.Long]("mtime")).map(_.toLong).getOrElse(0L))
    }.toSeq
    Snapshot(tablePath, v, schema, partCols, files, conf)
  }

  /** Read a snapshot as a DataFrame. Partition-column values live in
    * the LOG (add.partitionValues), not in the data files — they are
    * re-attached per file via an `input_file_name()` lookup against a
    * broadcast path→values map (scale-safe: the map is the file
    * list, and data files stream through untouched; no per-partition
    * plan explosion). */
  def read(spark: SparkSession, tablePath: String,
           versionAsOf: Option[Long] = None,
           timestampAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, versionAsOf, timestampAsOf)
    readSnapshot(spark, snap)
  }

  /** Materialize any [[Snapshot]] (real-Delta or VersionedTable). */
  def readSnapshot(spark: SparkSession, snap: Snapshot): DataFrame = {
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val base = spark.read.schema(dataSchema).parquet(snap.files.map(_.path): _*)
    if (snap.partitionColumns.isEmpty) base
    else {
      import spark.implicits._
      // normalize to scheme-less absolute path on both sides
      def norm(p: String) = p.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
      val pvRows = snap.files.map(f =>
        (norm(f.path), snap.partitionColumns.map(c => f.partitionValues.getOrElse(c, null))))
      val pvDf = broadcast(pvRows.toDF("__path", "__pv"))
      val withPath = base.withColumn("__path",
        regexp_replace(input_file_name(), "^[a-zA-Z0-9]+:(//)?", ""))
      val joined = withPath.join(pvDf, Seq("__path"), "left")
      // cast partition strings to their declared types; Delta's
      // partitionValues serialization for primitives is the plain
      // string form, which Spark's cast parses
      val partCols = snap.partitionColumns.zipWithIndex.map { case (c, i) =>
        element_at(col("__pv"), i + 1)
          .cast(snap.schema(c).dataType).as(c)
      }
      joined.select(snap.schema.map(f =>
        if (snap.partitionColumns.contains(f.name))
          partCols(snap.partitionColumns.indexOf(f.name))
        else col(f.name)): _*)
    }
  }

  /** Commit history as a DataFrame (version, timestamp_ms, n file
    * actions) — the `DESCRIBE HISTORY` analog. */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    versionTimes(spark, tablePath).toDF("version", "timestamp_ms")
  }

  // ---------------- direct writer ----------------

  private def jsEscape(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }

  private def metaDataLine(tableId: String, schemaJson: String, now: Long): String =
    s"""{"metaData":{"id":${jsEscape(tableId)},"format":{"provider":"parquet","options":{}},"schemaString":${jsEscape(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":$now}}"""

  /** Write `df` as ONE new commit of a real Delta table at
    * `deltaPath` — append by default, full overwrite with
    * `overwrite = true`; creates the table (commit 0 with
    * protocol/metaData) when the log doesn't exist yet. Appends to an
    * existing table require an identical schema (loud error, never a
    * silently forked log). The commit file is created with
    * exclusive-create semantics, so two racing writers cannot both
    * claim the same version on filesystems honoring atomic create
    * (the same contract VersionedTable's CAS commit documents).
    * Returns the committed Delta version. */
  def write(spark: SparkSession, df: DataFrame, deltaPath: String,
            overwrite: Boolean = false): Long = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    fs.mkdirs(new Path(dst, "_delta_log"))
    val existing =
      if (fs.exists(logDir(deltaPath)))
        fs.listStatus(logDir(deltaPath)).toSeq.map(_.getPath.getName)
          .collect { case n if n.matches("\\d{20}\\.json") =>
            n.stripSuffix(".json").toLong }.sorted
      else Seq.empty
    val v = existing.lastOption.map(_ + 1).getOrElse(0L)
    val now = System.currentTimeMillis()

    if (existing.nonEmpty && !overwrite) {
      val prior = snapshot(spark, deltaPath)
      require(prior.schema == df.schema,
        s"append schema ${df.schema.simpleString} does not match table " +
          s"schema ${prior.schema.simpleString}; use overwrite to replace")
    }

    // stage the data through a scratch dir, then adopt the parts
    // under stable names (never leave half-written files at paths the
    // log references)
    val tmp = new Path(dst, s".tmp-$v-${java.util.UUID.randomUUID()}")
    df.write.parquet(tmp.toString)
    val parts = fs.listStatus(tmp).toSeq
      .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
    val adopted = parts.zipWithIndex.map { case (st, i) =>
      val rel = s"part-$v-$i.parquet"
      if (!fs.rename(st.getPath, new Path(dst, rel)))
        throw new IllegalStateException(s"rename failed for $rel")
      (rel, fs.getFileStatus(new Path(dst, rel)).getLen)
    }
    fs.delete(tmp, true)

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (v == 0L) {
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      lines += metaDataLine(
        java.util.UUID.nameUUIDFromBytes(deltaPath.getBytes("UTF-8")).toString,
        df.schema.json, now)
    } else if (overwrite) {
      val prior = snapshot(spark, deltaPath)
      if (prior.schema != df.schema)
        lines += metaDataLine(
          java.util.UUID.nameUUIDFromBytes(deltaPath.getBytes("UTF-8")).toString,
          df.schema.json, now)
      // snapshot paths are absolute; the log stores table-relative —
      // normalize the scheme off both sides before stripping
      def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
      val root = deScheme(fs.makeQualified(dst).toString)
      prior.files.foreach { f =>
        val rel = deScheme(new Path(f.path).toString)
          .stripPrefix(root).stripPrefix("/")
        lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
      }
    }
    adopted.foreach { case (rel, sz) =>
      lines += s"""{"add":{"path":${jsEscape(rel)},"partitionValues":{},"size":$sz,"modificationTime":$now,"dataChange":true}}"""
    }
    val commit = new Path(logDir(deltaPath), pad20(v) + ".json")
    val out = fs.create(commit, false) // exclusive create = the CAS
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    v
  }

  // ---------------- VersionedTable interop ----------------

  /** A [[VersionedTable]] version as the SAME [[Snapshot]]
    * abstraction the real-Delta reader returns — one code path
    * downstream ([[readSnapshot]]) serves both table formats. */
  def snapshotFromVersioned(spark: SparkSession, table: String,
                            versionAsOf: Option[Long] = None): Snapshot = {
    val v = versionAsOf.getOrElse(VersionedTable.currentVersion(spark, table))
    val df = VersionedTable.readVersion(spark, table, v)
    val files = df.inputFiles.toSeq.map(p =>
      AddFile(new Path(p).toString, Map.empty, 0L, 0L))
    Snapshot(table, v, df.schema, Seq.empty, files, Map.empty)
  }

  /** Export a [[VersionedTable]] as a REAL Delta table: copy each
    * graft version's parquet files and write a `_delta_log` commit
    * per version (protocol/metaData/add/remove actions per the
    * public spec) — any Delta reader can then time-travel graft
    * output. Overwrite semantics per graft version: each commit
    * removes the previous version's files and adds its own
    * (VersionedTable versions are full snapshots). */
  def exportFromVersioned(spark: SparkSession, table: String,
                          deltaPath: String): Long = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    fs.mkdirs(new Path(dst, "_delta_log"))
    val cur = VersionedTable.currentVersion(spark, table)
    require(cur >= 1, s"no versions in $table")
    var prevFiles = Seq.empty[(String, Long)]
    // graft versions are 1-based; Delta versions 0-based
    (1L to cur).foreach { v =>
      val df = VersionedTable.readVersion(spark, table, v)
      val schemaJson = df.schema.json
      // copy this version's files under the delta root
      val copied = df.inputFiles.toSeq.zipWithIndex.map { case (src, i) =>
        val rel = s"v$v-part-$i.parquet"
        val srcP = new Path(new java.net.URI(src))
        org.apache.hadoop.fs.FileUtil.copy(
          srcP.getFileSystem(fsConf), srcP, fs, new Path(dst, rel),
          false, fsConf)
        (rel, fs.getFileStatus(new Path(dst, rel)).getLen)
      }
      val now = System.currentTimeMillis()
      val lines = scala.collection.mutable.ArrayBuffer[String]()
      if (v == 1L) {
        lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
        lines += metaDataLine(
          java.util.UUID.nameUUIDFromBytes(table.getBytes("UTF-8")).toString,
          schemaJson, now)
      }
      prevFiles.foreach { case (rel, _) =>
        lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
      }
      copied.foreach { case (rel, sz) =>
        lines += s"""{"add":{"path":${jsEscape(rel)},"partitionValues":{},"size":$sz,"modificationTime":$now,"dataChange":true}}"""
      }
      val commit = new Path(new Path(dst, "_delta_log"), pad20(v - 1) + ".json")
      val out = fs.create(commit, false)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      prevFiles = copied
    }
    cur - 1 // top Delta version
  }
}
