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
    * not interpret (commitInfo) are omitted — from_json ignores
    * unknown JSON fields by design. */
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
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType)))),
      // row tracking (PROTOCOL.md §Row Tracking): fresh row id of the
      // row at position i in the file = baseRowId + i
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    // PROTOCOL.md §Domain Metadata: system/tooling config scoped to a
    // named domain; replay keeps the latest action per domain, a
    // removed=true tombstone retires it. Clustered tables
    // (`delta.clustering`) and row tracking (`delta.rowTracking`)
    // ride on this action.
    StructField("domainMetadata", StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType)))),
    // LAST on purpose: [[checkpoint]] builds its consolidated rows
    // positionally against this schema, and checkpoints never carry
    // cdc actions (they are per-commit, PROTOCOL.md CDF)
    StructField("cdc", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("dataChange", BooleanType))))))

  /** readerFeatures this reader actually honors for protocol v3. */
  val SupportedReaderFeatures: Set[String] =
    Set("timestampNtz", "columnMapping", // columnMapping only in mode none
      "deletionVectors", // applied as a row filter at scan
      "v2Checkpoint", // classic, multi-part AND v2+sidecar forms read
      // per-file physical type may be NARROWER than the table schema
      // type; the scan up-casts along the sanctioned promotion matrix
      // (validated at snapshot resolution — see validateTypeWidening)
      "typeWidening", "typeWidening-preview",
      // variant columns (PROTOCOL.md §Variant Data Type): the parquet
      // Variant binary encoding Spark's VariantType reads/writes
      // natively — schemaString `variant` parses straight to Spark
      // VariantType. SHREDDED variants (§Variant Shredding: per-field
      // `typed_value` decomposition next to `value`/`metadata`) read
      // through Spark 4's re-assembling parquet converter
      // (spark.sql.variant.allowReadingShredded) — the scan requests
      // VariantType and the converter rebuilds the binary form from
      // the shredded group per file
      "variantType", "variantType-preview",
      "variantShredding", "variantShredding-preview",
      // behavioral no-ops for a correct reader: vacuumProtocolCheck
      // obliges VACUUM implementations to read the protocol first
      // (ours always resolves the snapshot — protocol gate included —
      // before reclaiming anything); checkpointProtection constrains
      // CHECKPOINT WRITERS below requireCheckpointProtectionBefore-
      // Version (we never rewrite history checkpoints)
      "vacuumProtocolCheck", "checkpointProtection")

  /** writerFeatures this writer actually implements for protocol v7.
    * PROTOCOL.md §Writer Features: "to write a table, writers must
    * implement and respect all features listed in writerFeatures" —
    * committing into a table declaring anything else could silently
    * break invariants only that feature's writers know how to
    * maintain, so [[validateWritable]] refuses. */
  val SupportedWriterFeatures: Set[String] =
    Set("appendOnly", // delta.appendOnly=true refuses data removal
      "invariants", // delta.invariants expressions enforced pre-commit
      "checkConstraints", "generatedColumns", "allowColumnDefaults",
      "identityColumns", "changeDataFeed", "columnMapping",
      "deletionVectors", "timestampNtz", "v2Checkpoint",
      "domainMetadata", "rowTracking", "inCommitTimestamp",
      "typeWidening", "typeWidening-preview",
      "variantType", "variantType-preview",
      "variantShredding", "variantShredding-preview",
      // OPTIMIZE lays data out by the delta.clustering domain's
      // clusteringColumns and every commit path carries domains
      // through — the clustered-table writer contract ("clustering"
      // is the delta-spark spelling our own CLUSTER BY stamps;
      // "clusteredTable" the earlier preview spelling)
      "clustering", "clusteredTable",
      "vacuumProtocolCheck", "checkpointProtection")

  /** Refuse commits this writer cannot make faithfully:
    *  - a (x,7) table declaring writerFeatures outside
    *    [[SupportedWriterFeatures]] (the spec's writer rule), or a
    *    minWriterVersion beyond 7;
    *  - `delta.appendOnly=true` vs an operation that REMOVES data
    *    (`removesData`): DELETE/UPDATE/MERGE/overwrite/RESTORE.
    *    dataChange=false rearrangements (OPTIMIZE) stay legal. */
  private[sources] def validateWritable(snap: Snapshot,
                                        removesData: Boolean = false): Unit = {
    val (_, mwv, _, wf) = snap.protocol
    if (mwv > 7) throw new UnsupportedOperationException(
      s"${snap.tablePath} requires minWriterVersion $mwv — this writer " +
        "implements protocol 7")
    if (mwv == 7) {
      val unknown = wf.toSet -- SupportedWriterFeatures
      if (unknown.nonEmpty) throw new UnsupportedOperationException(
        s"${snap.tablePath} declares writer features " +
          s"${unknown.toSeq.sorted.mkString(", ")} this writer does not " +
          "implement — committing could break invariants only those " +
          "features' writers maintain (PROTOCOL.md: writers must " +
          "support every listed writerFeature or fail)")
    }
    if (removesData && snap.configuration.get("delta.appendOnly")
      .exists(_.trim.equalsIgnoreCase("true")))
      throw new UnsupportedOperationException(
        s"${snap.tablePath} is APPEND-ONLY (delta.appendOnly=true) — " +
          "operations that remove or rewrite data are forbidden; unset " +
          "the property first")
  }

  /** The sanctioned `typeWidening` promotions (Delta PROTOCOL.md
    * §Type Widening): a data file written BEFORE a widening stores
    * the narrow physical type; reads up-cast to the table type. Any
    * OTHER recorded change must refuse — Spark's parquet reader could
    * not serve it faithfully anyway. */
  private def widenOk(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
    case (ShortType, IntegerType | LongType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (DateType, TimestampNTZType) => true
    case (ByteType | ShortType | IntegerType, d: DecimalType) =>
      d.precision - d.scale >= 10
    case (LongType, d: DecimalType) => d.precision - d.scale >= 20
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - f.precision >= t.scale - f.scale
    case _ => false
  }

  /** Parse the type-name strings `delta.typeChanges` records
    * (Spark `typeName` forms; a couple of spec aliases tolerated). */
  private def widenTypeOf(s: String): DataType =
    s.trim.toLowerCase match {
      case "timestampntz" => TimestampNTZType
      case "int" => IntegerType
      case other => org.apache.spark.sql.types.DataType.fromDDL(other)
    }

  /** Reader+writer TABLE FEATURES the schema's own types demand
    * (PROTOCOL.md): `variantType` for variant columns, `timestampNtz`
    * for TIMESTAMP WITHOUT TIME ZONE — a log serving these types
    * without declaring the feature would be protocol-invalid to
    * real readers. */
  private def schemaTypeFeatures(schema: StructType): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet[String]()
    def walk(dt: DataType): Unit = dt match {
      case st: StructType => st.fields.foreach(f => walk(f.dataType))
      case at: ArrayType => walk(at.elementType)
      case mt: MapType => walk(mt.keyType); walk(mt.valueType)
      case _: VariantType => out += "variantType"
      case TimestampNTZType => out += "timestampNtz"
      case _ => ()
    }
    walk(schema)
    out.toSeq
  }

  /** A protocol line upgrading to (3,7) with `features` in BOTH
    * lists (legacy-implied features enumerated) — None when the
    * prior protocol already declares them all. */
  private def readerWriterFeatureLine(protocol: Protocol,
                                      features: Seq[String])
  : Option[String] = {
    if (features.isEmpty) return None
    val (mrv, mwv, rf, wf) = protocol
    if (mrv >= 3 && mwv >= 7 &&
        features.forall(f => rf.contains(f) && wf.contains(f))) None
    else {
      val (legacyRf, legacyWf) = legacyImpliedFeatures(mrv, mwv)
      val rfOut = (rf ++ legacyRf ++ features).distinct.sorted
      val wfOut = (wf ++ legacyWf ++ features).distinct.sorted
      Some(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":${rfOut.map(jsEscape).mkString("[", ",", "]")},"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}""")
    }
  }

  /** Refuse non-sanctioned recorded type changes LOUDLY at snapshot
    * resolution (never at some later task failure): walks every
    * struct field (nested included) for `delta.typeChanges` metadata
    * and checks each from→to pair against [[widenOk]]. */
  private[sources] def validateTypeWidening(schema: StructType,
                                            tablePath: String): Unit = {
    def walkField(path: String, f: StructField): Unit = {
      if (f.metadata.contains("delta.typeChanges"))
        f.metadata.getMetadataArray("delta.typeChanges").foreach { tc =>
          val from = widenTypeOf(tc.getString("fromType"))
          val to = widenTypeOf(tc.getString("toType"))
          if (!widenOk(from, to))
            throw new UnsupportedOperationException(
              s"typeWidening: non-sanctioned type change " +
                s"${from.simpleString} -> ${to.simpleString} recorded " +
                s"on column $path of $tablePath — the sanctioned " +
                "promotions are byte/short/int/long chains, " +
                "float->double, date->timestamp_ntz, integer->double, " +
                "integer/long->decimal, and decimal precision(+scale) " +
                "growth")
        }
      walkType(path, f.dataType)
    }
    def walkType(path: String, dt: DataType): Unit = dt match {
      case st: StructType =>
        st.fields.foreach(f => walkField(s"$path.${f.name}", f))
      case at: ArrayType => walkType(s"$path.element", at.elementType)
      case mt: MapType =>
        walkType(s"$path.key", mt.keyType)
        walkType(s"$path.value", mt.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => walkField(f.name, f))
  }

  /** One live data file of a snapshot. `path` is absolute; `stats`
    * is the Delta per-file stats JSON (numRecords/minValues/
    * maxValues/nullCount) when the writer recorded it; `dv` the
    * deletion-vector descriptor when rows of the file are logically
    * deleted (merge-on-read — applied by [[readSnapshot]]). */
  final case class AddFile(path: String,
                           partitionValues: Map[String, String],
                           size: Long, modificationTime: Long,
                           stats: Option[String] = None,
                           dv: Option[DeletionVectors.Descriptor] = None,
                           baseRowId: Option[Long] = None,
                           defaultRowCommitVersion: Option[Long] = None)

  /** A resolved table state at one version — the common abstraction
    * over real Delta tables ([[snapshot]]) and graft
    * [[VersionedTable]]s ([[snapshotFromVersioned]]). `txns` carries
    * the highest committed `txn` action version per appId — the
    * idempotence watermark a streaming sink consults on restart. */
  /** `(minReaderVersion, minWriterVersion, readerFeatures,
    * writerFeatures)` — what the log last declared. */
  type Protocol = (Int, Int, Seq[String], Seq[String])

  final case class Snapshot(tablePath: String, version: Long,
                            schema: StructType,
                            partitionColumns: Seq[String],
                            files: Seq[AddFile],
                            configuration: Map[String, String],
                            txns: Map[String, Long] = Map.empty,
                            protocol: Protocol = (1, 2, Nil, Nil),
                            domains: Map[String, String] = Map.empty)

  private[sources] def logDir(tablePath: String) = new Path(tablePath, "_delta_log")

  private[sources] def pad20(v: Long): String = f"$v%020d"

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

  /** List minor log-compaction files as `(startV, endV, path)`,
    * sorted by range start (PROTOCOL.md §Log Compaction Files:
    * `<x>.<y>.compacted.json`). */
  private[sources] def listCompactions(spark: SparkSession,
                                       tablePath: String): Seq[(Long, Long, String)] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val R = "(\\d{20})\\.(\\d{20})\\.compacted\\.json".r
    fs.listStatus(dir).toSeq.map(_.getPath)
      .flatMap(p => p.getName match {
        case R(a, b) => Some((a.toLong, b.toLong, p.toString))
        case _ => None
      }).sortBy(_._1)
  }

  /** Author a MINOR LOG COMPACTION file for commits `[startV, endV]`
    * (PROTOCOL.md §Log Compaction Files): one
    * `<startV>.<endV>.compacted.json` holding the ACTION
    * RECONCILIATION of the range — per-path latest file action (an
    * add removed within the range collapses to its remove tombstone;
    * a re-add stays an add), latest `txn` per appId, latest
    * `metaData` / `protocol` if any changed in-range, latest
    * `domainMetadata` per domain (removed=true tombstones carried —
    * they retire pre-range state), `commitInfo`/`cdc` dropped (
    * advisory / change-feed-only; CDC readers always read raw
    * commits). Carried actions keep their ORIGINAL JSON text — no
    * re-serialization drift. Raw commit files are left in place:
    * compaction ACCELERATES snapshot replay ([[snapshot]] substitutes
    * the file when the whole range is needed); it deletes nothing.
    *
    * Scale: driver-side over one commit RANGE — bounded by the
    * checkpoint interval in practice (ranges spanning a checkpoint
    * are pointless: the reader never uses them). Idempotent: an
    * existing identical-range file is kept (first writer wins).
    * Returns true when this call created the file. */
  def compactLog(spark: SparkSession, tablePath: String,
                 startV: Long, endV: Long): Boolean = {
    require(startV <= endV, s"bad compaction range [$startV, $endV]")
    val versions = listVersions(spark, tablePath)
    (startV to endV).foreach(v => require(versions.contains(v),
      s"commit $v missing from $tablePath — cannot compact [$startV, $endV]"))
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()

    // (line text, parsed node, version) for every action in range
    final case class Act(line: String, v: Long,
                         node: com.fasterxml.jackson.databind.JsonNode)
    val acts: Seq[Act] = (startV to endV).flatMap { v =>
      val p = new Path(dir, pad20(v) + ".json")
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split('\n').toSeq.filter(_.trim.nonEmpty)
        .map(l => Act(l, v, M.readTree(l)))
    }

    def latestBy(kind: String, key: com.fasterxml.jackson.databind.JsonNode => String): Seq[Act] =
      acts.filter(_.node.has(kind))
        .groupBy(a => key(a.node.get(kind)))
        .values.map(_.maxBy(_.v)).toSeq.sortBy(_.v)

    val protocol = acts.filter(_.node.has("protocol")).lastOption
    val meta = acts.filter(_.node.has("metaData")).lastOption
    val domains = latestBy("domainMetadata", _.get("domain").asText())
    val txns = latestBy("txn", _.get("appId").asText())
    // per-path reconciliation: highest version wins; within one
    // version an add wins over a remove of the same path (the DV
    // re-add shape) — the same rule snapshot replay applies
    val fileActs = acts.filter(a => a.node.has("add") || a.node.has("remove"))
      .groupBy(a => Option(a.node.get("add")).getOrElse(a.node.get("remove"))
        .get("path").asText())
      .values.map(_.maxBy(a => (a.v, a.node.has("add")))).toSeq
      .sortBy(a => (a.v, !a.node.has("add")))

    val lines = (protocol.toSeq ++ meta.toSeq ++ domains ++ txns ++ fileActs)
      .map(_.line)
    val out = new Path(dir, s"${pad20(startV)}.${pad20(endV)}.compacted.json")
    AtomicCas.createExclusive(fs, out,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  /** Author the VERSION CHECKSUM file `<v>.crc` (PROTOCOL.md §Version
    * Checksum File): one JSON object summarizing the table state AT
    * `version` — live-file count/bytes, the metaData and protocol in
    * force, per-appId txn watermarks, live domain metadata, and the
    * deletion-vector tallies — so any reader can cheaply cross-check
    * a log replay against what the writer believed it committed.
    * Exclusive-create idempotent (first writer wins; the content is a
    * pure function of the version). Returns true when created. */
  def writeChecksum(spark: SparkSession, tablePath: String,
                    version: Long): Boolean = {
    val snap = snapshot(spark, tablePath, versionAsOf = Some(version))
    val fs = logDir(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = M.createObjectNode()
    root.put("tableSizeBytes", snap.files.map(_.size).sum)
    root.put("numFiles", snap.files.size.toLong)
    root.put("numMetadata", 1L)
    root.put("numProtocol", 1L)
    root.put("numDeletionVectorsOpt",
      snap.files.count(_.dv.exists(_.cardinality > 0L)).toLong)
    root.put("numDeletedRecordsOpt",
      snap.files.flatMap(_.dv).map(_.cardinality).sum)
    val proto = root.putObject("protocol")
    proto.put("minReaderVersion", snap.protocol._1)
    proto.put("minWriterVersion", snap.protocol._2)
    if (snap.protocol._3.nonEmpty) {
      val rf = proto.putArray("readerFeatures")
      snap.protocol._3.foreach(rf.add)
    }
    if (snap.protocol._4.nonEmpty) {
      val wf = proto.putArray("writerFeatures")
      snap.protocol._4.foreach(wf.add)
    }
    val md = root.putObject("metadata")
    md.put("schemaString", snap.schema.json)
    val pcs = md.putArray("partitionColumns")
    snap.partitionColumns.foreach(pcs.add)
    val conf = md.putObject("configuration")
    snap.configuration.toSeq.sortBy(_._1)
      .foreach { case (k, v) => conf.put(k, v) }
    if (snap.txns.nonEmpty) {
      val txns = root.putArray("setTransactions")
      snap.txns.toSeq.sortBy(_._1).foreach { case (appId, v) =>
        val t = txns.addObject(); t.put("appId", appId); t.put("version", v)
      }
    }
    if (snap.domains.nonEmpty) {
      val doms = root.putArray("domainMetadata")
      snap.domains.toSeq.sortBy(_._1).foreach { case (d, c) =>
        val o = doms.addObject(); o.put("domain", d); o.put("configuration", c)
      }
    }
    AtomicCas.createExclusive(fs,
      new Path(logDir(tablePath), pad20(version) + ".crc"),
      M.writeValueAsBytes(root))
  }

  /** Validate `<version>.crc` against a fresh log replay — the
    * corruption check a reader runs before trusting a foreign log.
    * Returns the list of mismatched fields (empty = verified);
    * refuses when no checksum file exists. */
  def verifyChecksum(spark: SparkSession, tablePath: String,
                     version: Long): Seq[String] = {
    val p = new Path(logDir(tablePath), pad20(version) + ".crc")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no checksum file for version $version")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    val snap = snapshot(spark, tablePath, versionAsOf = Some(version))
    val out = Seq.newBuilder[String]
    def check(field: String, expected: Any, got: Any): Unit =
      if (expected.toString != got.toString)
        out += s"$field: checksum $expected vs replay $got"
    check("tableSizeBytes", n.get("tableSizeBytes").asLong(),
      snap.files.map(_.size).sum)
    check("numFiles", n.get("numFiles").asLong(), snap.files.size.toLong)
    Option(n.get("metadata")).foreach { md =>
      check("metadata.schemaString", md.get("schemaString").asText(),
        snap.schema.json)
    }
    Option(n.get("protocol")).foreach { pr =>
      check("protocol.minWriterVersion",
        pr.get("minWriterVersion").asInt(), snap.protocol._2)
    }
    Option(n.get("numDeletedRecordsOpt")).foreach(v =>
      check("numDeletedRecordsOpt", v.asLong(),
        snap.files.flatMap(_.dv).map(_.cardinality).sum))
    out.result()
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

  /** Commit timestamps for `timestampAsOf` and DESCRIBE HISTORY:
    * the commit's recorded `inCommitTimestamp` when present (ICT
    * tables — PROTOCOL.md §In-Commit Timestamps), else the commit
    * file's modification time — real Delta's resolution order.
    * Mixed logs (ICT enabled mid-history, or later disabled) resolve
    * each commit by its own evidence. One head-line read per commit,
    * the DESCRIBE HISTORY I/O shape. */
  private[sources] def commitTimes(spark: SparkSession,
                                   tablePath: String): Seq[(Long, Long)] = {
    val fs = logDir(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    versionTimes(spark, tablePath).map { case (v, mtime) =>
      val ict = try {
        val in = fs.open(new Path(logDir(tablePath), pad20(v) + ".json"))
        val first = try {
          new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8")).readLine()
        } finally in.close()
        Option(first).flatMap(l => Option(M.readTree(l).get("commitInfo")))
          .flatMap(ci => Option(ci.get("inCommitTimestamp")).map(_.asLong()))
      } catch { case _: Exception => None }
      (v, ict.getOrElse(mtime))
    }
  }

  /** One discovered checkpoint: `format` ∈ classic | multipart |
    * v2parquet | v2json; `paths` the file(s) holding its actions. */
  private final case class CheckpointRef(version: Long, format: String,
                                         paths: Seq[String])

  private val ClassicCpRe = "(\\d{20})\\.checkpoint\\.parquet".r
  private val MultiCpRe = "(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet".r
  private val V2CpRe = "(\\d{20})\\.checkpoint\\.([A-Za-z0-9-]+)\\.(parquet|json)".r

  /** Latest USABLE checkpoint <= v. All three production forms read:
    * classic single-file, MULTI-PART classic (`<v>.checkpoint.<i>.<n>
    * .parquet`, only when every part is present — a torn set is
    * skipped, falling back to an earlier checkpoint + longer JSON
    * tail, exactly like real readers), and V2 (`<v>.checkpoint.<uuid>
    * .parquet|json` with file actions in `_sidecars/`). An
    * unrecognized future `<v>.checkpoint.*` form is a loud error —
    * never a silently-ignored newer snapshot. */
  private def checkpointAt(spark: SparkSession, tablePath: String,
                           v: Long): Option[CheckpointRef] = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    def full(n: String) = new Path(dir, n).toString
    val refs = scala.collection.mutable.ArrayBuffer[CheckpointRef]()
    val multi = scala.collection.mutable.Map[(Long, Int),
      scala.collection.mutable.ArrayBuffer[(Int, String)]]()
    names.foreach {
      case n @ ClassicCpRe(ver) =>
        refs += CheckpointRef(ver.toLong, "classic", Seq(full(n)))
      case n @ MultiCpRe(ver, i, cnt) =>
        multi.getOrElseUpdate((ver.toLong, cnt.toInt),
          scala.collection.mutable.ArrayBuffer()) += ((i.toInt, full(n)))
      case n @ V2CpRe(ver, _, ext) =>
        refs += CheckpointRef(ver.toLong, "v2" + ext, Seq(full(n)))
      case n if n.matches("\\d{20}\\.checkpoint\\..*") =>
        throw new UnsupportedOperationException(
          s"unrecognized Delta checkpoint form: $n — refusing to replay " +
            "a log whose newest snapshot this reader cannot read")
      case _ => ()
    }
    multi.foreach { case ((ver, cnt), parts) =>
      if (parts.map(_._1).toSet == (1 to cnt).toSet)
        refs += CheckpointRef(ver, "multipart", parts.sortBy(_._1).map(_._2).toSeq)
    }
    // prefer the newest version; among same-version forms any complete
    // checkpoint is equivalent — classic first for determinism
    val order = Map("classic" -> 0, "multipart" -> 1, "v2parquet" -> 2,
      "v2json" -> 3)
    refs.filter(_.version <= v).sortBy(r => (r.version, -order(r.format)))
      .lastOption
  }

  /** The normalized action rows of one checkpoint (same columns the
    * JSON tail yields, `__v` = the checkpoint version). V2: sidecar
    * refs resolve against `_delta_log/_sidecars/` and their parquet
    * carries the file actions — read distributed, never collected. */
  private def checkpointActions(spark: SparkSession, tablePath: String,
                                ref: CheckpointRef): DataFrame = {
    def norm(df: DataFrame): DataFrame = {
      // checkpoints written by OTHER writers (or older graft) may
      // lack whole action columns OR subfields inside one (an add
      // struct without baseRowId, written before row tracking
      // existed) — align every action struct to the full schema so
      // replay's subfield selects never fail; absent subfields read
      // null, exactly like from_json over the JSON tail
      def colOrNull(n: String) = {
        if (!df.columns.contains(n)) lit(null).cast(ActionSchema(n).dataType)
        else df.schema(n).dataType match {
          case actual: StructType =>
            val target = ActionSchema(n).dataType.asInstanceOf[StructType]
            if (target.fieldNames.forall(actual.fieldNames.contains)) col(n)
            else {
              val parts = target.fields.map(f =>
                (if (actual.fieldNames.contains(f.name)) col(s"$n.${f.name}")
                 else lit(null).cast(f.dataType)).as(f.name))
              when(col(n).isNotNull, struct(parts.toSeq: _*))
            }
          // an ALL-null action column round-trips as NullType — same
          // as the column being absent
          case _ => lit(null).cast(ActionSchema(n).dataType)
        }
      }
      df.select(colOrNull("protocol").as("protocol"),
        colOrNull("metaData").as("metaData"),
        colOrNull("add").as("add"), colOrNull("remove").as("remove"),
        colOrNull("txn").as("txn"),
        colOrNull("domainMetadata").as("domainMetadata"),
        lit(ref.version).as("__v"))
    }
    ref.format match {
      case "classic" | "multipart" => norm(spark.read.parquet(ref.paths: _*))
      case v2 =>
        val top =
          if (v2 == "v2parquet") spark.read.parquet(ref.paths.head)
          else spark.read.text(ref.paths.head)
            .select(from_json(col("value"), V2CheckpointJsonSchema).as("a"))
            .select("a.*")
        val sidecars: Seq[String] =
          if (!top.columns.contains("sidecar")) Seq.empty
          else top.filter(col("sidecar.path").isNotNull)
            .select("sidecar.path").collect().map(_.getString(0)).toSeq
        val resolved = sidecars.map { p =>
          if (p.contains(":/") || p.startsWith("/")) p
          else new Path(new Path(logDir(tablePath), "_sidecars"), p).toString
        }
        val topNorm = norm(top)
        if (resolved.isEmpty) topNorm
        else topNorm.unionByName(norm(spark.read.parquet(resolved: _*)))
    }
  }

  /** DRIVER-side twin of [[checkpointActions]] for the replay fast
    * path: the checkpoint's action nodes via [[DeltaCheckpointIo]]
    * (classic / multipart / v2 parquet or json top + sidecars).
    * `sidecarBudget` prices the sidecar files (their sizes ride in
    * the top file's refs) against what is left of
    * driverReplayMaxBytes. None ⇒ too big or unconvertible — the
    * caller uses the distributed replay. */
  private def driverCheckpointNodes(spark: SparkSession, tablePath: String,
                                    ref: CheckpointRef, sidecarBudget: Long)
  : Option[Vector[com.fasterxml.jackson.databind.JsonNode]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val top: Option[Vector[com.fasterxml.jackson.databind.JsonNode]] =
      ref.format match {
        case "classic" | "multipart" | "v2parquet" =>
          DeltaCheckpointIo.readActionNodes(conf, M, ref.paths)
        case "v2json" =>
          val fs = new Path(ref.paths.head).getFileSystem(conf)
          val br = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(new Path(ref.paths.head)), "UTF-8"))
          try {
            val buf = Vector.newBuilder[com.fasterxml.jackson.databind.JsonNode]
            var line = br.readLine()
            while (line != null) {
              if (line.trim.nonEmpty) buf += M.readTree(line)
              line = br.readLine()
            }
            Some(buf.result())
          } finally br.close()
        case _ => None
      }
    top.flatMap { nodes =>
      val sidecars = nodes.flatMap(n => Option(n.get("sidecar"))
        .filterNot(_.isNull))
      if (sidecars.isEmpty) Some(nodes)
      else {
        // price the sidecars from the refs; an unknown size refuses
        val sizes = sidecars.map(s => Option(s.get("sizeInBytes"))
          .filterNot(_.isNull).map(_.asLong()).getOrElse(Long.MaxValue / 1024))
        if (sizes.sum > sidecarBudget) None
        else {
          val resolved = sidecars.map { s =>
            val p = s.get("path").asText()
            if (p.contains(":/") || p.startsWith("/")) p
            else new Path(new Path(logDir(tablePath), "_sidecars"), p).toString
          }
          DeltaCheckpointIo.readActionNodes(conf, M, resolved)
            .map(nodes ++ _)
        }
      }
    }
  }

  /** The v2 JSON checkpoint line schema: the action columns plus
    * `sidecar` refs (checkpointMetadata is ignored — version is in
    * the file name). */
  private lazy val V2CheckpointJsonSchema: StructType =
    StructType(ActionSchema.fields :+ StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType)))))

  /** Delta percent-encodes paths in the log (RFC 2396). Percent-decode
    * %XX UTF-8 byte sequences ONLY — URI decoding, not form decoding:
    * a literal '+' in a real Delta writer's path means '+', never
    * space (URLDecoder would eat it). Malformed escapes pass through
    * verbatim rather than failing the whole replay. */
  private[sources] def decodePath(p: String): String = {
    val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '%' && i + 3 <= p.length &&
        p.substring(i + 1, i + 3).forall(h =>
          (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F'))) {
        bytes += Integer.parseInt(p.substring(i + 1, i + 3), 16).toByte
        i += 3
      } else { bytes ++= c.toString.getBytes("UTF-8"); i += 1 }
    }
    new String(bytes.toArray, "UTF-8")
  }

  /** Bounded LRU of replayed snapshots, keyed by the LOG SEGMENT that
    * produced them (resolved version + checkpoint ref + the ordered
    * commit/compaction file list). Commit JSONs, compaction files and
    * checkpoints are IMMUTABLE once named (they land via atomic
    * rename under the commit CAS), so the same segment always replays
    * to the same Snapshot — the key is re-derived from a fresh
    * directory listing on every call, so the cache cannot go stale
    * under concurrent writers, cleanup or time travel. snapshot()
    * runs 2-3× per DML command at the SAME version (gate, commit,
    * post-read): this is real Delta's SnapshotManagement caching, and
    * it removes whole log replays (3+ Spark jobs each on the
    * distributed path) from every command after the first. Entries
    * are metadata-sized (Snapshot case class); 16 tables bound the
    * driver footprint. */
  private val snapshotCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Snapshot](32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Snapshot]): Boolean = size() > 16
      })

  /** Resolve the snapshot at `versionAsOf` (default: latest), or at
    * the greatest version whose commit time is <= `timestampAsOf`
    * (epoch ms). Exactly one of the two selectors may be set. */
  def snapshot(spark: SparkSession, tablePath: String,
               versionAsOf: Option[Long] = None,
               timestampAsOf: Option[Long] = None): Snapshot = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "set at most one of versionAsOf / timestampAsOf")
    // ONE directory listing serves both the commit versions and the
    // minor log-compaction files (snapshot() is on every hot path —
    // a second listStatus per call is measurable across a suite).
    // Compactions extend the reachable head: after retention cleanup
    // a range's raw commits may be gone while the compacted file
    // still serves them.
    val (versions, compactions, sizeByName) = {
      val dir = logDir(tablePath)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) throw new IllegalArgumentException(
        s"not a Delta table (no _delta_log): $tablePath")
      val statuses = fs.listStatus(dir).toSeq
      val names = statuses.map(_.getPath)
      val CompactedR = "(\\d{20})\\.(\\d{20})\\.compacted\\.json".r
      (names.map(_.getName)
        .collect { case n if n.matches("\\d{20}\\.json") =>
          n.stripSuffix(".json").toLong }.sorted,
        names.flatMap(p => p.getName match {
          case CompactedR(a, b) => Some((a.toLong, b.toLong, p.toString))
          case _ => None
        }).sortBy(_._1),
        statuses.map(s => s.getPath.getName -> s.getLen).toMap)
    }
    val headVersion: Option[Long] =
      (versions.lastOption ++ compactions.map(_._2).maxOption).maxOption
    val v: Long = (versionAsOf, timestampAsOf) match {
      case (Some(x), _) =>
        require(versions.contains(x) ||
          compactions.exists(_._2 == x) ||
          checkpointAt(spark, tablePath, x).exists(_.version == x),
          s"version $x not in ${versions.headOption.getOrElse(-1L)}..${headVersion.getOrElse(-1L)}")
        x
      case (_, Some(ts)) =>
        val ok = commitTimes(spark, tablePath).filter(_._2 <= ts)
        require(ok.nonEmpty, s"no commit at or before timestamp $ts")
        ok.map(_._1).max
      case _ =>
        // aggressive metadata cleanup may leave a log with NO commit
        // JSONs at all — the newest checkpoint alone is then the
        // complete table state (how big production logs look right
        // after cleanup)
        headVersion
          .orElse(checkpointAt(spark, tablePath, Long.MaxValue).map(_.version))
          .getOrElse(throw new IllegalStateException(
            s"empty _delta_log at $tablePath"))
    }
    val cp = checkpointAt(spark, tablePath, v)
    // MINOR LOG COMPACTION (PROTOCOL.md §Log Compaction Files): a
    // `<x>.<y>.compacted.json` holds the reconciled actions of
    // commits x..y. Every version in (checkpoint, v] must be served —
    // by its raw JSON or by a covering compacted file (greedy longest
    // range ending at/below v; a 10⁵-commit table between checkpoints
    // replays a handful of compacted files, not every commit). A
    // version covered by NEITHER is a loud error, never a silent
    // partial replay.
    val jsonPaths: Seq[String] = {
      val cpV = cp.map(_.version).getOrElse(-1L)
      val raw = versions.filter(j => j > cpV && j <= v).toSet
      val byStart = compactions.filter(c => c._1 > cpV && c._2 <= v)
        .groupBy(_._1)
      val out = Seq.newBuilder[String]
      var cur = cpV + 1
      while (cur <= v) {
        byStart.getOrElse(cur, Nil).sortBy(-_._2).headOption match {
          case Some((_, y, p)) => out += p; cur = y + 1
          case None if raw(cur) =>
            out += new Path(logDir(tablePath), pad20(cur) + ".json").toString
            cur += 1
          case None => throw new IllegalStateException(
            s"version $cur of $tablePath is missing: no commit JSON and " +
              "no covering log-compaction file (expired past retention?)")
        }
      }
      out.result()
    }

    // DRIVER-SIDE replay fast path: a SMALL checkpoint-less log
    // replays with Jackson on the driver — identical semantics to
    // the distributed replay below with NONE of its Spark jobs (3+
    // per snapshot call; snapshot() runs 2-3× per DML, so the jobs
    // dominate small-table command latency — the same trade real
    // Delta makes, whose log replay is driver-side until state
    // reconstruction needs a cluster). A checkpoint or a JSON tail
    // beyond the threshold takes the distributed path — the shape a
    // 10⁵-commit production log needs. Both paths are exercised by
    // the graded suite (small logs here, checkpointed/compacted logs
    // below), so a semantic drift breaks hashes loudly.
    // segment-keyed cache lookup (see snapshotCache): same resolved
    // version + same checkpoint + same replay file set → the replay
    // below is deterministic, serve the parsed Snapshot
    val segKey = tablePath + "\u0001" + v +
      cp.fold("")(c => "\u0001" + c.format + ":" + c.version + ":" +
        c.paths.mkString(",")) +
      "\u0001" + jsonPaths.mkString("\u0002")
    val cachedSnap = snapshotCache.get(segKey)
    if (cachedSnap != null) return cachedSnap
    def cachePut(s: Snapshot): Snapshot = { snapshotCache.put(segKey, s); s }

    val driverMax = spark.conf.getOption(
      "spark.sql.graft.delta.driverReplayMaxBytes")
      .flatMap(_.toLongOption).getOrElse(4L << 20)
    if (driverMax > 0 && (jsonPaths.nonEmpty || cp.isDefined)) {
      // checkpoint files live in the log dir, so the same listing
      // prices them; sidecar sizes are priced from the top file's
      // refs inside driverCheckpointNodes
      val tailBytes = jsonPaths.map(p => sizeByName.getOrElse(
        new Path(p).getName, Long.MaxValue / 1024)).sum
      val cpBytes = cp.fold(0L)(_.paths.map(p => sizeByName.getOrElse(
        new Path(p).getName, Long.MaxValue / 1024)).sum)
      if (tailBytes + cpBytes <= driverMax) {
        val dir = logDir(tablePath)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        cp match {
          case None =>
            return cachePut(snapshotDriver(tablePath, v, jsonPaths, fs))
          case Some(ref) =>
            // a checkpoint the driver can parse (projected parquet →
            // the SAME JsonNode action shape the tail yields) replays
            // here too; anything it can't stays distributed
            driverCheckpointNodes(spark, tablePath, ref,
              driverMax - tailBytes - cpBytes) match {
              case Some(nodes) =>
                return cachePut(snapshotDriver(tablePath, v, jsonPaths,
                  fs, nodes.map((ref.version, _))))
              case None => ()
            }
        }
      }
    }

    // JSON tail: distributed text read; the version rides in from
    // the file name so replay order survives the union. A compacted
    // file's actions replay AT its range-end version y — already
    // reconciled within the range, and correctly ordered against
    // every action outside it.
    val jsonActions: Option[DataFrame] =
      if (jsonPaths.isEmpty) None
      else Some(spark.read.text(jsonPaths: _*)
        .select(from_json(col("value"), ActionSchema).as("a"),
          coalesce(
            nullif(regexp_extract(input_file_name(),
              "\\d{20}\\.(\\d{20})\\.compacted\\.json", 1), lit(""))
              .cast("long"),
            regexp_extract(input_file_name(), "(\\d{20})\\.json", 1)
              .cast("long")).as("__v"))
        .select(col("a.*"), col("__v")))

    val cpActions: Option[DataFrame] =
      cp.map(ref => checkpointActions(spark, tablePath, ref))

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
    val tableProtocol: Protocol = proto.headOption.map { p =>
      (p.getAs[Int]("minReaderVersion"), p.getAs[Int]("minWriterVersion"),
        Option(p.getAs[scala.collection.Seq[String]]("readerFeatures"))
          .map(_.toSeq).getOrElse(Nil),
        Option(p.getAs[scala.collection.Seq[String]]("writerFeatures"))
          .map(_.toSeq).getOrElse(Nil))
    }.getOrElse((1, 2, Nil, Nil))

    val metaRow = actions.filter(col("metaData").isNotNull)
      .orderBy(col("__v").desc).select("metaData.*").limit(1).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"no metaData action in _delta_log of $tablePath"))
    val conf = Option(metaRow.getAs[scala.collection.Map[String, String]]("configuration"))
      .map(_.toMap).getOrElse(Map.empty[String, String])
    // column mapping: `name` mode resolves at read time through the
    // schema's physicalName metadata, `id` mode through parquet
    // FIELD-ID resolution ([[readSnapshotAll]]); unknown future modes
    // stay loud, never wrong
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    if (cmMode != "none" && cmMode != "name" && cmMode != "id")
      throw new UnsupportedOperationException(
        s"delta.columnMapping.mode=$cmMode is not supported " +
          "(none/name/id only)")
    val schema = DataType.fromJson(metaRow.getAs[String]("schemaString"))
      .asInstanceOf[StructType]
    validateTypeWidening(schema, tablePath)
    val partCols = Option(metaRow.getAs[scala.collection.Seq[String]]("partitionColumns"))
      .map(_.toSeq).getOrElse(Seq.empty)

    // log replay: per path, the action from the highest version wins;
    // WITHIN one version an add wins over a remove of the same path —
    // a deletion-vector commit re-adds the path (remove old entry +
    // add with the new DV) and the file must stay live with the new
    // metadata. One combinable shuffle over the FILE LIST — data
    // never moves.
    val fileActions = actions.select(
      coalesce(col("add.path"), col("remove.path")).as("path"),
      col("add.path").isNotNull.as("is_add"),
      col("add.partitionValues").as("pv"),
      col("add.size").as("size"),
      col("add.modificationTime").as("mtime"),
      col("add.stats").as("stats"),
      col("add.deletionVector").as("dv"),
      col("add.baseRowId").as("base_rid"),
      col("add.defaultRowCommitVersion").as("dcv"),
      col("__v"))
      .filter(col("path").isNotNull)
    val live = fileActions
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("path")
          .orderBy(col("__v").desc, col("is_add").desc)))
      .filter(col("__rn") === 1 && col("is_add"))
    val rows = live.select("path", "pv", "size", "mtime", "stats", "dv",
      "base_rid", "dcv").collect()
    val files = rows.map { r =>
      val dv = Option(r.getAs[org.apache.spark.sql.Row]("dv")).map { d =>
        DeletionVectors.Descriptor(
          d.getAs[String]("storageType"),
          d.getAs[String]("pathOrInlineDv"),
          Option(d.getAs[java.lang.Integer]("offset")).map(_.toInt),
          Option(d.getAs[java.lang.Integer]("sizeInBytes")).map(_.toInt)
            .getOrElse(0),
          Option(d.getAs[java.lang.Long]("cardinality")).map(_.toLong)
            .getOrElse(0L))
      }
      AddFile(new Path(tablePath, decodePath(r.getAs[String]("path"))).toString,
        Option(r.getAs[scala.collection.Map[String, String]]("pv"))
          .map(_.toMap).getOrElse(Map.empty),
        Option(r.getAs[java.lang.Long]("size")).map(_.toLong).getOrElse(0L),
        Option(r.getAs[java.lang.Long]("mtime")).map(_.toLong).getOrElse(0L),
        Option(r.getAs[String]("stats")),
        dv,
        Option(r.getAs[java.lang.Long]("base_rid")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("dcv")).map(_.toLong))
    }.toSeq
    // txn replay: highest committed version per appId (the streaming
    // sink's exactly-once watermark — a replayed micro-batch with
    // version <= this is a no-op)
    val txns = actions.filter(col("txn").isNotNull)
      .groupBy(col("txn.appId").as("appId"))
      .agg(max(col("txn.version")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // domain metadata replay: latest action per domain wins; a
    // removed=true tombstone retires the domain. Domains are a
    // handful of system entries (clustering, row tracking) — driver
    // collect is bounded like txns.
    val domains: Map[String, String] =
      if (!actions.columns.contains("domainMetadata")) Map.empty
      else actions.filter(col("domainMetadata").isNotNull)
        .select(col("domainMetadata.domain").as("domain"),
          col("domainMetadata.configuration").as("dconf"),
          coalesce(col("domainMetadata.removed"), lit(false)).as("removed"),
          col("__v"))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("domain")
            .orderBy(col("__v").desc)))
        .filter(col("__rn") === 1 && !col("removed"))
        .select("domain", "dconf")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cachePut(Snapshot(tablePath, v, schema, partCols, files, conf, txns,
      tableProtocol, domains))
  }

  /** The driver-side twin of [[snapshot]]'s distributed replay (see
    * the fast-path comment there): streams each commit/compacted
    * JSON through Jackson in ascending version order and applies the
    * identical reconciliation — last protocol/metaData win; per path
    * the action from the highest version wins, with add beating
    * remove within one version; txn high-watermarks per appId;
    * latest domainMetadata per domain with removed tombstones
    * retiring. Called for logs under the size threshold — never
    * row-scaled work. `cpNodes` are CHECKPOINT action nodes (parsed
    * driver-side, [[DeltaCheckpointIo]]) applied at their checkpoint
    * version BEFORE the tail, exactly where the distributed path
    * unions them in. */
  private def snapshotDriver(tablePath: String, v: Long,
                             jsonPaths: Seq[String],
                             fs: org.apache.hadoop.fs.FileSystem,
                             cpNodes: Seq[(Long, com.fasterxml.jackson.databind.JsonNode)] = Nil): Snapshot = {
    import scala.jdk.CollectionConverters._
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val CompactedR = "(\\d{20})\\.(\\d{20})\\.compacted\\.json".r
    val CommitR = "(\\d{20})\\.json".r
    def versionOf(p: String): Long = new Path(p).getName match {
      case CompactedR(_, y) => y.toLong
      case CommitR(x) => x.toLong
      case other => throw new IllegalStateException(
        s"unrecognized log file in replay set: $other")
    }
    type J = com.fasterxml.jackson.databind.JsonNode
    def opt(n: J, k: String): Option[J] =
      Option(n.get(k)).filterNot(_.isNull)
    var proto: Protocol = (1, 2, Nil, Nil)
    var protoSeen = false
    var metaNode: J = null
    val fileState =
      scala.collection.mutable.HashMap[String, (Long, Boolean, J)]()
    val txns = scala.collection.mutable.HashMap[String, Long]()
    val domains =
      scala.collection.mutable.HashMap[String, (Long, String, Boolean)]()
    def applyNode(ver: Long, n: J): Unit = {
      opt(n, "protocol").foreach { pn =>
        protoSeen = true
        proto = (
          opt(pn, "minReaderVersion").map(_.asInt()).getOrElse(1),
          opt(pn, "minWriterVersion").map(_.asInt()).getOrElse(2),
          opt(pn, "readerFeatures").toSeq
            .flatMap(_.elements().asScala.map(_.asText())),
          opt(pn, "writerFeatures").toSeq
            .flatMap(_.elements().asScala.map(_.asText())))
      }
      opt(n, "metaData").foreach(metaNode = _)
      val add = opt(n, "add")
      val fileNode = add.orElse(opt(n, "remove"))
      fileNode.foreach { a =>
        val pth = a.get("path").asText()
        val isAdd = add.isDefined
        fileState.get(pth) match {
          case Some((ev, _, _)) if ev > ver => ()
          case Some((ev, eAdd, _)) if ev == ver && eAdd && !isAdd => ()
          case _ => fileState(pth) = (ver, isAdd, a)
        }
      }
      opt(n, "txn").foreach { t =>
        val app = t.get("appId").asText()
        val tv = t.get("version").asLong()
        if (!txns.get(app).exists(_ >= tv)) txns(app) = tv
      }
      opt(n, "domainMetadata").foreach { d =>
        val dom = d.get("domain").asText()
        if (!domains.get(dom).exists(_._1 > ver))
          domains(dom) = (ver,
            opt(d, "configuration").map(_.asText()).getOrElse(""),
            opt(d, "removed").exists(_.asBoolean()))
      }
    }
    cpNodes.foreach { case (ver, n) => applyNode(ver, n) }
    jsonPaths.map(p => (versionOf(p), p)).sortBy(_._1).foreach {
      case (ver, p) =>
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(new Path(p)), "UTF-8"))
        try {
          var line = br.readLine()
          while (line != null) {
            if (line.trim.nonEmpty) applyNode(ver, M.readTree(line))
            line = br.readLine()
          }
        } finally br.close()
    }
    // protocol gate + metadata checks — identical to the distributed
    // path: fail loudly rather than read wrong data
    val (mrv, _, rfs, _) = proto
    if (protoSeen &&
      (mrv > 3 || (mrv == 3 && !rfs.toSet.subsetOf(SupportedReaderFeatures))))
      throw new UnsupportedOperationException(
        s"unsupported Delta protocol: minReaderVersion=$mrv " +
          s"features=${rfs.toSet}")
    if (metaNode == null) throw new IllegalStateException(
      s"no metaData action in _delta_log of $tablePath")
    val conf: Map[String, String] =
      Option(metaNode.get("configuration")).toSeq
        .flatMap(_.fields().asScala.map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText()))).toMap
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    if (cmMode != "none" && cmMode != "name" && cmMode != "id")
      throw new UnsupportedOperationException(
        s"delta.columnMapping.mode=$cmMode is not supported " +
          "(none/name/id only)")
    val schema = DataType.fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[StructType]
    validateTypeWidening(schema, tablePath)
    val partCols = Option(metaNode.get("partitionColumns")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val files = fileState.toSeq.filter(_._2._2).sortBy(_._1).map {
      case (pth, (_, _, a)) =>
        val pv = opt(a, "partitionValues").toSeq
          .flatMap(_.fields().asScala.map(f => f.getKey ->
            (if (f.getValue.isNull) null else f.getValue.asText()))).toMap
        val dv = opt(a, "deletionVector").map { d =>
          DeletionVectors.Descriptor(
            d.get("storageType").asText(),
            d.get("pathOrInlineDv").asText(),
            opt(d, "offset").map(_.asInt()),
            opt(d, "sizeInBytes").map(_.asInt()).getOrElse(0),
            opt(d, "cardinality").map(_.asLong()).getOrElse(0L))
        }
        AddFile(new Path(tablePath, decodePath(pth)).toString, pv,
          opt(a, "size").map(_.asLong()).getOrElse(0L),
          opt(a, "modificationTime").map(_.asLong()).getOrElse(0L),
          opt(a, "stats").map(_.asText()),
          dv,
          opt(a, "baseRowId").map(_.asLong()),
          opt(a, "defaultRowCommitVersion").map(_.asLong()))
    }
    val doms = domains.toMap.collect {
      case (d, (_, c, removed)) if !removed => d -> c }
    Snapshot(tablePath, v, schema, partCols, files, conf,
      txns.toMap, proto, doms)
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

  /** Read with a predicate, pruning partitions BEFORE the scan: files
    * whose log-side `partitionValues` cannot satisfy `predicate` are
    * dropped from the planned file list (the 100×-scale behavior a
    * partitioned layout exists for — a date-partitioned 100 TB table
    * reads one partition's files, not all of them), then the full
    * predicate applies as a normal residual filter so non-partition
    * conjuncts behave identically. Result rows are exactly
    * `read(...).where(predicate)`. */
  def readWhere(spark: SparkSession, tablePath: String,
                predicate: org.apache.spark.sql.Column,
                versionAsOf: Option[Long] = None,
                timestampAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, versionAsOf, timestampAsOf)
    readSnapshot(spark, snap, Some(predicate)).where(predicate)
  }

  /** Files of `snap` that could satisfy `predicate` by their per-file
    * STATS (add.stats min/max/nullCount): only top-level AND
    * conjuncts of the form `<numeric column> <op> <literal>` are
    * consulted; a file without stats (or a conjunct of any other
    * shape) never skips — sound by construction, and the caller
    * applies the full predicate as a residual filter anyway. */
  /** `(column, op, literal)` triples for the top-level AND conjuncts
    * of `predicate` shaped `<numeric column> <op> <numeric literal>`
    * (attribute normalized to the left, Casts unwrapped — widening
    * preserves values so the original column's bounds stay valid;
    * literals gated on their DECLARED NumericType so Date/Timestamp
    * internals never compare against bounds; columns gated on the
    * SCHEMA-declared numeric type so lexicographic string bounds
    * never wrong-prune). The shared normalizer behind Delta stats
    * skipping AND Iceberg bounds skipping. */
  private[sources] def numericChecks(spark: SparkSession, schema: StructType,
                                     predicate: org.apache.spark.sql.Column)
  : Seq[(String, String, BigDecimal)] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, _}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: Cast => attrName(c.child)
      case _ => None
    }
    def litNum(e: Expression): Option[BigDecimal] = e match {
      case Literal(v, dt) if dt.isInstanceOf[NumericType] => v match {
        case n: java.lang.Integer => Some(BigDecimal(n.intValue()))
        case n: java.lang.Long => Some(BigDecimal(n.longValue()))
        case n: java.lang.Short => Some(BigDecimal(n.intValue()))
        case n: java.lang.Byte => Some(BigDecimal(n.intValue()))
        case n: java.lang.Double => Some(BigDecimal(n.doubleValue()))
        case n: java.lang.Float => Some(BigDecimal(n.floatValue().toDouble))
        case n: Decimal => Some(n.toBigDecimal)
        case _ => None
      }
      case _ => None
    }
    def numericCol(n: String): Boolean =
      schema.find(_.name == n).exists(_.dataType.isInstanceOf[NumericType])
    def both(x: Expression, y: Expression, opAttrLeft: String,
             opAttrRight: String): Option[(String, String, BigDecimal)] =
      (for (n <- attrName(x); v <- litNum(y)) yield (n, opAttrLeft, v))
        .orElse(for (n <- attrName(y); v <- litNum(x)) yield (n, opAttrRight, v))
    def normalize(e: Expression): Option[(String, String, BigDecimal)] = e match {
      case EqualTo(x, y) => both(x, y, "=", "=")
      case LessThan(x, y) => both(x, y, "<", ">")
      case LessThanOrEqual(x, y) => both(x, y, "<=", ">=")
      case GreaterThan(x, y) => both(x, y, ">", "<")
      case GreaterThanOrEqual(x, y) => both(x, y, ">=", "<=")
      case _ => None
    }
    // ANALYZE the predicate against a schema-only frame: the Filter
    // condition comes back as a resolved catalyst tree
    // (AttributeReference/Literal with type coercions made explicit),
    // independent of the Column API's internal node representation
    val cond: Expression = {
      val dummy = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      dummy.where(predicate).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.getOrElse(return Seq.empty)
    }
    conjuncts(cond).flatMap(normalize)
      .filter { case (c, _, _) => numericCol(c) }
  }

  /** Whether a value interval `[lo, hi]` can satisfy `<col> op v` —
    * the keep-unless-provably-false core shared by both formats. */
  private[sources] def boundsCanSatisfy(op: String, v: BigDecimal,
                                        lo: BigDecimal, hi: BigDecimal): Boolean =
    op match {
      case "=" => v >= lo && v <= hi
      case "<" => lo < v
      case "<=" => lo <= v
      case ">" => hi > v
      case ">=" => hi >= v
    }

  def statsPrunedFiles(spark: SparkSession, snap: Snapshot,
                       predicate: org.apache.spark.sql.Column): Seq[AddFile] = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val checks = numericChecks(spark, snap.schema, predicate)
    if (checks.isEmpty) return snap.files
    // an unparseable recorded bound (real tables may carry stats in
    // shapes we did not author) keeps the file, never throws
    def parseNum(n: com.fasterxml.jackson.databind.JsonNode): Option[BigDecimal] =
      try Some(BigDecimal(n.asText()))
      catch { case _: NumberFormatException => None }
    snap.files.filter { f =>
      f.stats.forall { js =>
        val root = try M.readTree(js) catch { case _: Exception => null }
        root == null || checks.forall { case (c, op, v) =>
          val mn = Option(root.path("minValues").get(c)).filterNot(_.isNull)
            .flatMap(parseNum)
          val mx = Option(root.path("maxValues").get(c)).filterNot(_.isNull)
            .flatMap(parseNum)
          val nr = Option(root.get("numRecords")).map(_.asLong())
          val nc = Option(root.path("nullCount").get(c)).filterNot(_.isNull)
            .map(_.asLong())
          // an all-null file can satisfy NO comparison conjunct
          val allNull = (nr, nc) match {
            case (Some(n), Some(k)) => n > 0 && k == n
            case _ => false
          }
          if (allNull) false
          else (mn, mx) match {
            case (Some(lo), Some(hi)) => boundsCanSatisfy(op, v, lo, hi)
            case _ => true // no bounds recorded — keep
          }
        }
      }
    }
  }

  /** The planned file list for a predicated read: per-file STATS
    * skipping ([[statsPrunedFiles]]) composed with PARTITION pruning
    * ([[partitionPrunedFiles]]) — both keep-unless-provably-false, so
    * any residual-filterable predicate prunes soundly. */
  def prunedFiles(spark: SparkSession, snap: Snapshot,
                  predicate: org.apache.spark.sql.Column): Seq[AddFile] = {
    val statsPruned = snap.copy(files = statsPrunedFiles(spark, snap, predicate))
    partitionPrunedFiles(spark, statsPruned, predicate)
  }

  /** The subset of `snap.files` whose partitionValues satisfy the
    * PARTITION-ONLY top-level AND conjuncts of `predicate`: conjuncts
    * referencing any data column are ignored entirely (they stay
    * residual filters on the caller's side). Evaluating the FULL
    * predicate with data columns bound to null would wrong-prune
    * null-intolerant shapes — `p === "x" && n.isNotNull` evaluates
    * false under the null binding even for files that hold matches —
    * so only conjuncts whose attribute references are a subset of the
    * partition columns are consulted, each evaluated by Catalyst over
    * a file-list-sized local frame of TYPED partition values (null =
    * unknown keeps the file). Any conjunct that does not round-trip
    * through its SQL form keeps all files: pruning is an optimization,
    * never a filter. */
  private def partitionPrunedFiles(spark: SparkSession, snap: Snapshot,
                                   predicate: org.apache.spark.sql.Column): Seq[AddFile] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Expression, SubqueryExpression}
    if (snap.partitionColumns.isEmpty || snap.files.isEmpty) return snap.files
    import spark.implicits._
    val pc = snap.partitionColumns
    val cond: Expression = {
      val dummy = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      dummy.where(predicate).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.getOrElse(return snap.files)
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val pcSet = pc.toSet
    val partOnly = conjuncts(cond).filter { c =>
      val refs = c.references.toSeq.map(_.name)
      refs.nonEmpty && refs.forall(pcSet.contains) && c.deterministic &&
        !c.exists(_.isInstanceOf[SubqueryExpression])
    }
    if (partOnly.isEmpty) return snap.files
    val pruneCol = try partOnly.map(c => expr(c.sql)).reduce(_ && _)
    catch { case scala.util.control.NonFatal(_) => return snap.files }
    val rows = snap.files.zipWithIndex.map { case (f, i) =>
      (i, pc.map(c => f.partitionValues.getOrElse(c, null)))
    }
    val typed = rows.toDF("__idx", "__pv").select(
      col("__idx") +: pc.map(c =>
        element_at(col("__pv"), pc.indexOf(c) + 1)
          .cast(snap.schema(c).dataType).as(c)): _*)
    // keep unless provably false: coalesce(pred, true) drops only
    // files whose partition values definitely fail a partition-only
    // conjunct
    val keep = try typed.filter(coalesce(pruneCol, lit(true)))
      .select("__idx").as[Int].collect().toSet
    catch { case scala.util.control.NonFatal(_) => return snap.files }
    snap.files.zipWithIndex.collect { case (f, i) if keep(i) => f }
  }

  /** Materialize any [[Snapshot]] (real-Delta or VersionedTable),
    * optionally pruning the file list on a partition predicate first
    * (see [[prunedFiles]] — sound for any predicate; prunes when it
    * references partition columns). */
  def readSnapshot(spark: SparkSession, snap: Snapshot,
                   partitionFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val pruned = partitionFilter match {
      case Some(p) => snap.copy(files = prunedFiles(spark, snap, p))
      case None => snap
    }
    readSnapshotAll(spark, pruned)
  }

  private val PhysNameKey = "delta.columnMapping.physicalName"

  private[sources] def physName(f: StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
    else f.name

  /** True when any top-level field's physical parquet name differs
    * from its logical name (`delta.columnMapping.mode = name` after a
    * RENAME or DROP). */
  private[sources] def isColumnMapped(schema: StructType): Boolean =
    schema.fields.exists(f => physName(f) != f.name)

  private def nestedMapped(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f => physName(f) != f.name) ||
      s.fields.exists(f => nestedMapped(f.dataType))
    case a: ArrayType => nestedMapped(a.elementType)
    case m: MapType => nestedMapped(m.keyType) || nestedMapped(m.valueType)
    case _ => false
  }

  /** Writers read and stage by LOGICAL name; on a column-mapped table
    * that would silently write (or rewrite) wrong columns — loud. */
  private def requireNotColumnMapped(snap: Snapshot, op: String): Unit =
    if (isColumnMapped(snap.schema) ||
      snap.configuration.get("delta.columnMapping.mode").exists(_ != "none"))
      throw new UnsupportedOperationException(
        s"$op on a column-mapped table is not supported — reads resolve " +
          "physical names / field ids (DeltaLog.read), writers do not yet")

  /** The PHYSICAL view of a column-mapped snapshot: every top-level
    * field renamed to its parquet physical name (id mode additionally
    * stamps `parquet.field.id` so Spark's field-id resolution matches
    * by id), partition columns translated, and the mapping mode
    * dropped from the configuration (the view is resolved). The
    * parquet files, the log's partitionValues keys, and the per-file
    * stats JSON all speak physical names — readers run over this view
    * and alias the output back to logical names (a plain projection,
    * so pushdown and codegen survive). Nested physical renames are
    * loud. Shared by [[read]] and the DSv2 catalog scan. */
  private[sources] def physicalSnapshot(spark: SparkSession,
                                        snap: Snapshot): Snapshot = {
    val cmMode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    snap.schema.fields.foreach(f => if (nestedMapped(f.dataType))
      throw new UnsupportedOperationException(
        s"nested column-mapping physical names under field ${f.name} " +
          "are not supported"))
    def physField(f: StructField): StructField = {
      val renamed = f.copy(name = physName(f))
      if (cmMode == "id" && f.metadata.contains("delta.columnMapping.id")) {
        require(spark.conf.get(
          "spark.sql.parquet.fieldId.read.enabled", "false") == "true",
          "id-mode column mapping needs " +
            "spark.sql.parquet.fieldId.read.enabled=true")
        renamed.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id")).build())
      } else renamed
    }
    snap.copy(
      schema = StructType(snap.schema.fields.map(physField)),
      partitionColumns = snap.partitionColumns.map(c =>
        physName(snap.schema(c))),
      configuration = snap.configuration - "delta.columnMapping.mode")
  }

  private def readSnapshotAll(spark: SparkSession, snap: Snapshot): DataFrame = {
    import spark.implicits._
    // column mapping: the parquet files store PHYSICAL names; read
    // through a physical-named snapshot (partitionValues keys are
    // physical in the log already), then alias every column back to
    // its logical name — a plain projection, so pushdown and codegen
    // survive. In `id` mode the physical fields ALSO carry the
    // spec's column id as `parquet.field.id`, and Spark's own
    // field-id resolution (spark.sql.parquet.fieldId.read.enabled,
    // set in GraftSession) matches them by ID — the parquet column
    // NAME is free to differ, which is the whole point of id mode.
    // Nested physical renames would need a recursive struct rebuild —
    // loud until someone needs them.
    val cmMode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    if (isColumnMapped(snap.schema) || cmMode != "none")
      return readSnapshotAll(spark, physicalSnapshot(spark, snap)).select(
        snap.schema.fields.map(f => col(physName(f)).as(f.name)).toSeq: _*)
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    // input_file_name() reports SparkPath's URL-encoded form (space
    // as %20) — encode the file list the same way, then normalize to
    // scheme-less absolute path on both sides
    def norm(p: String) = p.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    def fileKey(p: String) =
      norm(org.apache.spark.paths.SparkPath.fromPathString(p).urlEncoded)
    def scanWithPath(files: Seq[AddFile]) =
      spark.read.schema(dataSchema).parquet(files.map(_.path): _*)
        .withColumn("__path",
          regexp_replace(input_file_name(), "^[a-zA-Z0-9]+:(//)?", ""))

    // deletion vectors: files with a DV read with their physical row
    // index and anti-join the deleted-position set. Bytes are fetched
    // once per sidecar (KB–MB, bounded by the descriptors' recorded
    // sizeInBytes); EXPANSION to positions happens on executors. The
    // join side broadcasts only when total cardinality is small.
    val (dvFiles, plainFiles) = snap.files.partition(_.dv.exists(_.cardinality != 0L))
    val plain = if (plainFiles.nonEmpty) Some(scanWithPath(plainFiles)) else None
    val dvScan = if (dvFiles.isEmpty) None else {
      val conf = spark.sparkContext.hadoopConfiguration
      val dvData: Seq[(String, Array[Byte])] = dvFiles.map(f =>
        (fileKey(f.path),
          DeletionVectors.loadData(conf, snap.tablePath, f.dv.get)))
      val posDf = spark.createDataset(dvData).flatMap { case (p, bytes) =>
        DeletionVectors.deletedRows(bytes).map(r => (p, r))
      }.toDF("__path", "__ri")
      val totalCard = dvFiles.flatMap(_.dv).map(_.cardinality).sum
      val posSide = if (totalCard <= 5000000L) broadcast(posDf) else posDf
      val scanned = spark.read.schema(dataSchema)
        .parquet(dvFiles.map(_.path): _*)
        .select(col("*"),
          col("_metadata.row_index").as("__ri"))
        .withColumn("__path",
          regexp_replace(input_file_name(), "^[a-zA-Z0-9]+:(//)?", ""))
      Some(scanned.join(posSide, Seq("__path", "__ri"), "left_anti").drop("__ri"))
    }
    val base = (plain.toSeq ++ dvScan.toSeq).reduce(_.unionByName(_))

    if (snap.partitionColumns.isEmpty)
      base.select(dataSchema.fieldNames.map(col): _*)
    else {
      val pvRows = snap.files.map(f =>
        (fileKey(f.path),
          snap.partitionColumns.map(c => f.partitionValues.getOrElse(c, null))))
      val pvDf = broadcast(pvRows.toDF("__path", "__pv"))
      val joined = base.join(pvDf, Seq("__path"), "left")
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

  private def normPath(p: String): String =
    p.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
  private def fileKeyOf(p: String): String =
    normPath(org.apache.spark.paths.SparkPath.fromPathString(p).urlEncoded)

  /** Distributed scan of `files` with their deletion vectors APPLIED
    * (rows at DV positions dropped) — the row set a reader must see.
    * Emits the DATA columns plus `__path` (scheme-less file key) and,
    * with `keepRowIndex`, `__ri` (the physical row index, what a DV
    * delete writer records). DV bytes are fetched once per sidecar
    * driver-side (KB–MB); position EXPANSION happens on executors. */
  private def scanLive(spark: SparkSession, tablePath: String,
                       dataSchema: StructType, files: Seq[AddFile],
                       keepRowIndex: Boolean = false): DataFrame = {
    import spark.implicits._
    def scanPath(fs: Seq[AddFile], withRi: Boolean) = {
      val base = spark.read.schema(dataSchema).parquet(fs.map(_.path): _*)
      val sel = if (withRi)
        base.select(col("*"), col("_metadata.row_index").as("__ri"))
      else base
      sel.withColumn("__path",
        regexp_replace(input_file_name(), "^[a-zA-Z0-9]+:(//)?", ""))
    }
    val (dvFiles, plainFiles) = files.partition(_.dv.exists(_.cardinality != 0L))
    val parts = Seq.newBuilder[DataFrame]
    if (plainFiles.nonEmpty) parts += scanPath(plainFiles, keepRowIndex)
    if (dvFiles.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val dvData: Seq[(String, Array[Byte])] = dvFiles.map(f =>
        (fileKeyOf(f.path),
          DeletionVectors.loadData(conf, tablePath, f.dv.get)))
      val posDf = spark.createDataset(dvData).flatMap { case (p, bytes) =>
        DeletionVectors.deletedRows(bytes).map(r => (p, r))
      }.toDF("__path", "__dvri")
      val totalCard = dvFiles.flatMap(_.dv).map(_.cardinality).sum
      val posSide = if (totalCard <= 5000000L) broadcast(posDf) else posDf
      val scanned = scanPath(dvFiles, withRi = true)
        .withColumn("__dvri", col("__ri"))
      val filtered = scanned
        .join(posSide, Seq("__path", "__dvri"), "left_anti").drop("__dvri")
      parts += (if (keepRowIndex) filtered else filtered.drop("__ri"))
    }
    parts.result().reduce(_.unionByName(_))
  }

  /** `(version, timestamp_ms, operation)` per commit — operations
    * come from the leading `commitInfo` action when the writer
    * recorded one (graft writers do; external/legacy commits show "").
    * Driver I/O is one small read per commit JSON — the DESCRIBE
    * HISTORY shape, never a data scan. */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val fs = logDir(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    versionTimes(spark, tablePath).map { case (v, mtime) =>
      val p = new Path(logDir(tablePath), pad20(v) + ".json")
      val (op, ts) = try {
        val in = fs.open(p)
        val first = try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8"))
          br.readLine()
        } finally in.close()
        val ci = Option(first)
          .flatMap(l => Option(M.readTree(l).get("commitInfo")))
        (ci.flatMap(c => Option(c.get("operation")).map(_.asText()))
          .getOrElse(""),
          // ICT tables: the commit's own recorded timestamp is the
          // authoritative one (file mtimes can be rewritten by copies)
          ci.flatMap(c => Option(c.get("inCommitTimestamp"))
            .map(_.asLong())).getOrElse(mtime))
      } catch { case _: Exception => ("", mtime) }
      (v, ts, op)
    }.toDF("version", "timestamp_ms", "operation")
  }

  // ---------------- incremental / CDC reads ----------------

  /** Parsed actions of a polled commit-JSON tail — the one shape both
    * change-feed arms consume (every consumer was already a driver
    * collect; this parses the tail ONCE instead of one Spark job per
    * projection). */
  private final case class TailMeta(schemaString: String,
                                    partitionColumns: Seq[String])
  private final case class TailCdc(path: String, pv: Map[String, String],
                                   size: Long, v: Long)
  private final case class TailFile(path: String, isAdd: Boolean,
                                    pv: Map[String, String], size: Long,
                                    mtime: Long,
                                    dv: Option[DeletionVectors.Descriptor],
                                    dataChange: Boolean, v: Long)

  /** Parse the polled tail: Jackson ON THE DRIVER when the range's
    * JSON bytes fit the replay gate
    * (`spark.sql.graft.delta.driverReplayMaxBytes` — zero Spark jobs),
    * distributed from_json + projected collects above it (the shape an
    * unbounded range needs). Both branches yield identical values —
    * the same parity contract as the snapshot replay fast path. */
  private def parsedTail(spark: SparkSession, tablePath: String,
                         jsonPaths: Seq[String])
  : (Seq[TailMeta], Seq[TailCdc], Seq[TailFile]) = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val driverMax = spark.conf.getOption(
      "spark.sql.graft.delta.driverReplayMaxBytes")
      .flatMap(_.toLongOption).getOrElse(4L << 20)
    val sizeByName = fs.listStatus(dir).toSeq
      .map(s => s.getPath.getName -> s.getLen).toMap
    val tailBytes = jsonPaths.map(p => sizeByName.getOrElse(
      new Path(p).getName, Long.MaxValue / 1024)).sum
    val VRe = "(\\d{20})\\.json".r
    def versionOf(p: String): Long = new Path(p).getName match {
      case VRe(x) => x.toLong
      case other => throw new IllegalStateException(
        s"unexpected file in polled tail: $other")
    }
    if (driverMax > 0 && tailBytes <= driverMax) {
      val M = new com.fasterxml.jackson.databind.ObjectMapper()
      type J = com.fasterxml.jackson.databind.JsonNode
      def opt(n: J, k: String): Option[J] =
        Option(n.get(k)).filterNot(_.isNull)
      def mapOf(n: Option[J]): Map[String, String] = {
        import scala.jdk.CollectionConverters._
        n.toSeq.flatMap(_.fields().asScala.map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText()))).toMap
      }
      val metas = Seq.newBuilder[TailMeta]
      val cdcs = Seq.newBuilder[TailCdc]
      val files = Seq.newBuilder[TailFile]
      jsonPaths.foreach { p =>
        val v = versionOf(p)
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(new Path(p)), "UTF-8"))
        try {
          var line = br.readLine()
          while (line != null) {
            if (line.trim.nonEmpty) {
              val n = M.readTree(line)
              opt(n, "metaData").foreach { m =>
                import scala.jdk.CollectionConverters._
                metas += TailMeta(m.get("schemaString").asText(),
                  opt(m, "partitionColumns").toSeq
                    .flatMap(_.elements().asScala.map(_.asText())))
              }
              opt(n, "cdc").foreach { c =>
                cdcs += TailCdc(c.get("path").asText(),
                  mapOf(opt(c, "partitionValues")),
                  opt(c, "size").map(_.asLong()).getOrElse(0L), v)
              }
              val add = opt(n, "add")
              add.orElse(opt(n, "remove")).foreach { a =>
                val dv = opt(a, "deletionVector").map { d =>
                  DeletionVectors.Descriptor(
                    d.get("storageType").asText(),
                    d.get("pathOrInlineDv").asText(),
                    opt(d, "offset").map(_.asInt()),
                    opt(d, "sizeInBytes").map(_.asInt()).getOrElse(0),
                    opt(d, "cardinality").map(_.asLong()).getOrElse(0L))
                }
                files += TailFile(a.get("path").asText(), add.isDefined,
                  mapOf(opt(a, "partitionValues")),
                  opt(a, "size").map(_.asLong()).getOrElse(0L),
                  opt(a, "modificationTime").map(_.asLong()).getOrElse(0L),
                  dv.filter(_ => add.isDefined),
                  opt(a, "dataChange").forall(_.asBoolean()), v)
              }
            }
            line = br.readLine()
          }
        } finally br.close()
      }
      return (metas.result(), cdcs.result(), files.result())
    }
    // over-gate: distributed parse, the SAME projected collects as
    // before (each bounded: metaData/cdc are per-commit-scaled, the
    // file projection is what the legs materialize anyway)
    val acts = spark.read.text(jsonPaths: _*)
      .select(from_json(col("value"), ActionSchema).as("a"),
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1)
          .cast("long").as("__v"))
      .select(col("a.*"), col("__v"))
    val metas = acts.filter(col("metaData").isNotNull)
      .select("metaData.schemaString", "metaData.partitionColumns", "__v")
      .collect().toSeq.map { m =>
        TailMeta(m.getAs[String]("schemaString"),
          Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
            .map(_.toSeq).getOrElse(Seq.empty))
      }
    val cdcs = acts.filter(col("cdc").isNotNull)
      .select(col("cdc.path").as("path"),
        col("cdc.partitionValues").as("pv"),
        col("cdc.size").as("size"), col("__v")).collect().toSeq.map { r =>
        TailCdc(r.getAs[String]("path"),
          Option(r.getAs[scala.collection.Map[String, String]]("pv"))
            .map(_.toMap).getOrElse(Map.empty),
          Option(r.getAs[java.lang.Long]("size")).map(_.toLong).getOrElse(0L),
          r.getAs[Long]("__v"))
      }
    val files = acts
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.path").isNotNull.as("is_add"),
        col("add.partitionValues").as("pv"),
        col("add.size").as("size"),
        col("add.modificationTime").as("mtime"),
        col("add.deletionVector").as("dv"),
        coalesce(col("add.dataChange"), col("remove.dataChange"), lit(true))
          .as("data_change"), col("__v"))
      .filter(col("path").isNotNull).collect().toSeq.map { r =>
        val dv = Option(r.getAs[org.apache.spark.sql.Row]("dv")).map { d =>
          DeletionVectors.Descriptor(
            d.getAs[String]("storageType"), d.getAs[String]("pathOrInlineDv"),
            Option(d.getAs[java.lang.Integer]("offset")).map(_.toInt),
            Option(d.getAs[java.lang.Integer]("sizeInBytes")).map(_.toInt)
              .getOrElse(0),
            Option(d.getAs[java.lang.Long]("cardinality")).map(_.toLong)
              .getOrElse(0L))
        }
        TailFile(r.getAs[String]("path"), r.getAs[Boolean]("is_add"),
          Option(r.getAs[scala.collection.Map[String, String]]("pv"))
            .map(_.toMap).getOrElse(Map.empty),
          Option(r.getAs[java.lang.Long]("size")).map(_.toLong).getOrElse(0L),
          Option(r.getAs[java.lang.Long]("mtime")).map(_.toLong).getOrElse(0L),
          dv, r.getAs[Boolean]("data_change"), r.getAs[Long]("__v"))
      }
    (metas, cdcs, files)
  }

  /** Row-level change feed of a REAL Delta table for the commits in
    * `(fromVersion, toVersion]` — the `startingVersion` incremental
    * poll the reference's silver/gold layers stream from. Each
    * commit's file-level diff comes straight from its JSON actions
    * (never a snapshot diff): added files' rows are tagged `insert`,
    * removed files' rows `delete`, each with `_commit_version` — an
    * update written as remove+add in one commit appears as
    * delete+insert, the same shape real Delta CDF gives without
    * `_change_data` files. Removed files' content is still readable
    * because Delta removes are logical (tombstones; data files
    * survive until VACUUM — a vacuumed-away removed file is a loud
    * read error, not silent emptiness).
    *
    * Scale shape: only the requested JSON tail is parsed (bounded by
    * the poll cadence, same as any checkpointed streaming source);
    * data reads are distributed parquet scans of exactly the changed
    * files. Partition values re-attach per file like [[readSnapshot]].
    * Schema changes INSIDE the polled range are rejected loudly —
    * poll up to the metaData boundary, adapt, continue. */
  def changes(spark: SparkSession, tablePath: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(toVersion >= fromVersion,
      s"bad change range ($fromVersion, $toVersion]")
    val versions = listVersions(spark, tablePath)
      .filter(j => j > fromVersion && j <= toVersion)
    val endSnap = snapshot(spark, tablePath,
      versionAsOf = Some(versions.lastOption.getOrElse(toVersion)))
    val withVersionCol = StructType(endSnap.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
    if (versions.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withVersionCol)
    val jsonPaths = versions
      .map(j => new Path(logDir(tablePath), pad20(j) + ".json").toString)
    // the polled tail, parsed ONCE (driver-side under the replay byte
    // gate — zero jobs; distributed above it)
    val (metaActs, cdcActs, allFileActs) =
      parsedTail(spark, tablePath, jsonPaths)
    // a metaData action in range is fine iff it declares the SAME
    // schema/partitioning the range ends with (table creation at
    // commit 0, a no-op metaData rewrite) — an actual schema change
    // mid-range is the loud-error case
    metaActs.foreach { m =>
      val sch = DataType.fromJson(m.schemaString).asInstanceOf[StructType]
      if (sch != endSnap.schema ||
        m.partitionColumns != endSnap.partitionColumns)
        throw new UnsupportedOperationException(
          s"schema/metadata change inside polled range ($fromVersion, " +
            s"$toVersion] of $tablePath — poll up to the boundary, adapt, continue")
    }
    // PROTOCOL.md CDF reader rule: a commit WITH `cdc` actions serves
    // its row-level changes from those `_change_data` files
    // EXCLUSIVELY (the writer recorded the precise pre/post images);
    // commits without reconstruct from the file-level diff as before
    val cdcVersions: Set[Long] = cdcActs.map(_.v).toSet
    // deletion-vector commits re-add the SAME path with a DV; the
    // file-level diff cannot express that, so ranges containing DV
    // adds NOT covered by cdc files take the stateful row-diff
    // replay below instead
    val dvInRange = allFileActs
      .exists(a => a.isAdd && a.dv.isDefined && !cdcVersions(a.v))
    if (dvInRange)
      return changesWithDv(spark, tablePath, fromVersion, allFileActs,
        endSnap, cdcActs)
    val cdcLegs: Seq[DataFrame] =
      cdcVersionLegs(spark, tablePath, endSnap, cdcActs)
        .toSeq.sortBy(_._1).map(_._2)
    // dataChange=false actions (OPTIMIZE / Z-ORDER rewrites) rearrange
    // bytes without changing rows — surfacing them as delete+insert
    // would let a replica consumer drop rows (within-commit apply
    // order of identical delete/insert rows is unspecified), so the
    // change feed skips them, exactly like real Delta CDF
    val fileActs = allFileActs
      .filter(a => a.dataChange && !cdcVersions(a.v))
    // removed files carry no partitionValues on the tombstone — they
    // were added earlier: resolve pv from the fromVersion snapshot,
    // or from an add WITHIN the polled range (add+remove both inside
    // the poll window)
    lazy val priorPv: Map[String, Map[String, String]] = {
      if (endSnap.partitionColumns.isEmpty) Map.empty
      else {
        val baseV = listVersions(spark, tablePath).filter(_ <= fromVersion)
          .reduceOption(_ max _)
        val fromSnap = baseV.map(b =>
          snapshot(spark, tablePath, versionAsOf = Some(b))
            .files.map(f => f.path -> f.partitionValues).toMap)
          .getOrElse(Map.empty[String, Map[String, String]])
        val inRange = fileActs.filter(_.isAdd).map { a =>
          new Path(tablePath, decodePath(a.path)).toString -> a.pv
        }.toMap
        fromSnap ++ inRange
      }
    }
    def group(isAdd: Boolean): Seq[(Long, Seq[AddFile])] =
      fileActs.filter(_.isAdd == isAdd)
        .groupBy(_.v).toSeq.sortBy(_._1)
        .map { case (cv, as) =>
          cv -> as.map { a =>
            val abs = new Path(tablePath, decodePath(a.path)).toString
            val pv =
              if (isAdd) a.pv
              else priorPv.getOrElse(abs, Map.empty[String, String])
            AddFile(abs, pv,
              if (isAdd) a.size else 0L,
              if (isAdd) a.mtime else 0L)
          }
        }
    // the polled tail is bounded, so a per-commit union keeps the
    // plan small while every leg stays a distributed parquet scan
    val legs: Seq[DataFrame] =
      group(isAdd = true).map { case (cv, fls) =>
        readSnapshotAll(spark, endSnap.copy(files = fls))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(cv))
      } ++ group(isAdd = false).map { case (cv, fls) =>
        readSnapshotAll(spark, endSnap.copy(files = fls))
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(cv))
      }
    (cdcLegs ++ legs).reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withVersionCol))
  }

  /** One change-feed DataFrame per cdc-bearing version: the commit's
    * `_change_data` files read EXCLUSIVELY (the writer recorded the
    * precise pre/post images — PROTOCOL.md CDF reader rule), keyed by
    * version. Shared by the plain and DV change-feed arms. */
  private def cdcVersionLegs(spark: SparkSession, tablePath: String,
                             endSnap: Snapshot,
                             cdcActs: Seq[TailCdc])
  : Map[Long, DataFrame] =
    cdcActs.groupBy(_.v).map { case (cv, as) =>
      val fls = as.map { a =>
        AddFile(new Path(tablePath, decodePath(a.path)).toString,
          a.pv, a.size, 0L)
      }
      cv -> readSnapshotAll(spark, endSnap.copy(
        schema = StructType(endSnap.schema.fields :+
          StructField("_change_type", StringType)),
        files = fls))
        .withColumn("_commit_version", lit(cv))
    }

  /** The ROW-DIFF change-feed arm for polled ranges containing
    * deletion-vector commits. A DV delete re-adds the same path with
    * a (grown) vector; the row-level change is the POSITION DIFF:
    * newly-covered positions stream as `delete` rows, newly-uncovered
    * ones (a restore) as `insert`s — never the whole file on both
    * sides. Stateful per-commit replay: liveness + DV state start at
    * the fromVersion snapshot; real file drops emit their
    * PREVIOUSLY-LIVE rows (old DV applied), brand-new files their
    * live rows (own DV applied). Driver cost is O(polled commits ×
    * DV bytes) — the bounded poll tail; row reads are distributed
    * scans of exactly the changed files, position-selected via a
    * broadcast semi-join on `_metadata.row_index`. */
  private def changesWithDv(spark: SparkSession, tablePath: String,
                            fromVersion: Long, allFileActs: Seq[TailFile],
                            endSnap: Snapshot,
                            cdcActs: Seq[TailCdc]): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val pc = endSnap.partitionColumns
    val dataSchema = StructType(endSnap.schema.filterNot(
      f => pc.contains(f.name)))
    val withVersionCol = StructType(endSnap.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))

    final case class Act(path: String, isAdd: Boolean,
                         pv: Map[String, String], size: Long, mtime: Long,
                         dv: Option[DeletionVectors.Descriptor],
                         dataChange: Boolean)
    // EVERY file action rides along (liveness must follow a
    // dataChange=false OPTIMIZE's file moves, or a later DV delete on
    // the compacted file is misread as a brand-new file and re-emits
    // its whole contents); EMISSION below covers dataChange=true only
    val byCommit: Seq[(Long, Seq[Act])] = allFileActs
      .groupBy(_.v).toSeq.sortBy(_._1)
      .map { case (cv, as) =>
        cv -> as.map { a =>
          Act(new Path(tablePath, decodePath(a.path)).toString,
            a.isAdd, a.pv, a.size, a.mtime, a.dv, a.dataChange)
        }
      }

    // liveness + DV state at the range start
    val baseV = listVersions(spark, tablePath).filter(_ <= fromVersion)
      .reduceOption(_ max _)
    var live: Map[String, AddFile] = baseV
      .map(b => snapshot(spark, tablePath, versionAsOf = Some(b))
        .files.map(f => f.path -> f).toMap)
      .getOrElse(Map.empty)

    def positions(d: Option[DeletionVectors.Descriptor]): Set[Long] =
      d.filter(_.cardinality != 0L).map(x =>
        DeletionVectors.deletedRows(
          DeletionVectors.loadData(conf, tablePath, x)).toSet)
        .getOrElse(Set.empty)

    /** Rows of `sel`'s files AT the selected physical positions. */
    def posLeg(sel: Seq[(AddFile, Set[Long])], tag: String,
               cv: Long): Option[DataFrame] = {
      val nonEmpty = sel.filter(_._2.nonEmpty)
      if (nonEmpty.isEmpty) return None
      val posDf = broadcast(nonEmpty.flatMap { case (f, ps) =>
        ps.toSeq.sorted.map(p => (fileKeyOf(f.path), p))
      }.toDF("__path", "__ri"))
      val raw = spark.read.schema(dataSchema)
        .parquet(nonEmpty.map(_._1.path): _*)
        .select(col("*"), col("_metadata.row_index").as("__ri"))
        .withColumn("__path",
          regexp_replace(input_file_name(), "^[a-zA-Z0-9]+:(//)?", ""))
        .join(posDf, Seq("__path", "__ri"), "left_semi")
      val full =
        if (pc.isEmpty) raw
        else {
          val pvDf = broadcast(nonEmpty.map { case (f, _) =>
            (fileKeyOf(f.path), pc.map(c => f.partitionValues.getOrElse(c, null)))
          }.toDF("__path", "__pv"))
          raw.join(pvDf, Seq("__path"), "left")
            .select(endSnap.schema.map(f =>
              if (pc.contains(f.name))
                element_at(col("__pv"), pc.indexOf(f.name) + 1)
                  .cast(f.dataType).as(f.name)
              else col(f.name)): _*)
        }
      Some(full.select(endSnap.schema.fieldNames.map(col): _*)
        .withColumn("_change_type", lit(tag))
        .withColumn("_commit_version", lit(cv)))
    }

    // cdc-covered versions in the range serve from their
    // `_change_data` files EXCLUSIVELY (precise pre/post images —
    // never reconstructed as whole-file legs); the stateful row-diff
    // replay below covers only the cdc-less commits, while LIVENESS
    // still advances over every action of every commit
    val cdcByVersion = cdcVersionLegs(spark, tablePath, endSnap, cdcActs)

    val legs = Seq.newBuilder[DataFrame]
    byCommit.foreach { case (cv, as) =>
      val allAdds = as.filter(_.isAdd)
      val addPaths = allAdds.map(_.path).toSet
      val adds = allAdds.filter(_.dataChange)
      def toAddFile(a: Act): AddFile =
        AddFile(a.path, a.pv, a.size, a.mtime, None, a.dv)
      if (cdcByVersion.contains(cv)) {
        legs += cdcByVersion(cv)
      } else {
        // real drops (dataChange, not re-added): previously-live rows
        // stream as deletes — the OLD vector applies, never resurrecting
        val dropped = as.filterNot(_.isAdd).filter(_.dataChange)
          .filterNot(r => addPaths(r.path))
          .map(r => live.getOrElse(r.path,
            AddFile(r.path, r.pv, 0L, 0L))) // pre-creation tombstone: raw file
        if (dropped.nonEmpty)
          legs += readSnapshotAll(spark, endSnap.copy(files = dropped))
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_version", lit(cv))
        val newFiles = Seq.newBuilder[AddFile]
        val delDelta = Seq.newBuilder[(AddFile, Set[Long])]
        val resDelta = Seq.newBuilder[(AddFile, Set[Long])]
        adds.foreach { a =>
          live.get(a.path) match {
            case Some(old) => // DV update of a live file: position diff
              val oldP = positions(old.dv)
              val newP = positions(a.dv)
              delDelta += ((toAddFile(a), newP -- oldP))
              resDelta += ((toAddFile(a), oldP -- newP))
            case None => newFiles += toAddFile(a)
          }
        }
        val nf = newFiles.result()
        if (nf.nonEmpty) // own DVs applied: only live rows insert
          legs += readSnapshotAll(spark, endSnap.copy(files = nf))
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(cv))
        legs ++= posLeg(delDelta.result(), "delete", cv)
        legs ++= posLeg(resDelta.result(), "insert", cv)
      }
      // advance state over EVERY action, dataChange or not
      as.filterNot(_.isAdd).filterNot(r => addPaths(r.path))
        .foreach(r => live -= r.path)
      allAdds.foreach(a => live += a.path -> toAddFile(a))
    }
    // cdc-bearing commits with no file actions still serve their feed
    val seen = byCommit.map(_._1).toSet
    cdcByVersion.toSeq.sortBy(_._1)
      .foreach { case (cv, leg) => if (!seen(cv)) legs += leg }
    legs.result().reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withVersionCol))
  }

  /** Incremental consumption of a real Delta table — the poll-based
    * analog of `readStream.option("startingVersion", …)`, the SAME
    * contract [[VersionedTable.syncChanges]] gives for graft tables:
    * returns the changes committed AFTER `lastVersion` plus the
    * version the consumer is carried to. A foreachBatch-style loop
    * persists the returned version as its offset and applies the
    * tagged rows downstream; exactly-once when apply + offset commit
    * are atomic on the consumer side. */
  def syncChanges(spark: SparkSession, tablePath: String,
                  lastVersion: Long): (Long, Option[DataFrame]) = {
    val cur = listVersions(spark, tablePath).lastOption.getOrElse(-1L)
    if (cur <= lastVersion) (lastVersion, None)
    else (cur, Some(changes(spark, tablePath, lastVersion, cur)))
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

  private def metaDataLine(tableId: String, schemaJson: String,
                           partitionColumns: Seq[String], now: Long,
                           configuration: Map[String, String] = Map.empty)
  : String = {
    val pcJson = partitionColumns.map(jsEscape).mkString("[", ",", "]")
    val confJson = configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsEscape(k)}:${jsEscape(v)}" }
      .mkString("{", ",", "}")
    s"""{"metaData":{"id":${jsEscape(tableId)},"format":{"provider":"parquet","options":{}},"schemaString":${jsEscape(schemaJson)},"partitionColumns":$pcJson,"configuration":$confJson,"createdTime":$now}}"""
  }

  /** Table-relative path → percent-encoded log path, RFC 2396 per
    * SEGMENT ('/' preserved): unreserved bytes pass through, everything
    * else (including space → %20 and '+' → %2B — NOT form encoding's
    * '+' for space) becomes %XX over UTF-8 bytes. [[decodePath]] is the
    * exact inverse, and real Delta readers URI-decode to the same
    * on-disk literal — staged paths with spaces stay interoperable. */
  private def encodePath(rel: String): String = {
    def seg(s: String): String = {
      val b = new StringBuilder
      s.getBytes("UTF-8").foreach { byte =>
        val c = (byte & 0xff).toChar
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || "-_.~!*'()".indexOf(c.toInt) >= 0) b.append(c)
        else b.append(f"%%${byte & 0xff}%02X")
      }
      b.toString
    }
    rel.split('/').map(seg).mkString("/")
  }

  /** Hive-style partition-dir unescape: %XX only (Spark's
    * ExternalCatalogUtils.escapePathName never emits '+', so a
    * literal '+' in a value must survive — URLDecoder would eat it). */
  private[sources] def hiveUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Write `df` hive-partitioned into a scratch dir under `dst`, then
    * adopt each part under a stable `part-<tag>-<i>.parquet` name in
    * its final partition directory — the shared staging step of every
    * committing writer (never leave half-written files at paths the
    * log references). Returns (relPath, partitionValues, size, stats)
    * per adopted file. */
  private def stageData(spark: SparkSession, df: DataFrame, dst: Path,
                        effParts: Seq[String], tag: String)
  : Seq[(String, Map[String, String], Long, Option[String])] = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val fs = dst.getFileSystem(fsConf)
    val tmp = new Path(dst, s".tmp-$tag-${java.util.UUID.randomUUID()}")
    if (effParts.isEmpty) df.write.parquet(tmp.toString)
    else df.write.partitionBy(effParts: _*).parquet(tmp.toString)
    // walk the staged tree: data files sit under one hive-style dir
    // level per partition column
    def walk(p: Path): Seq[Path] = {
      val sts = fs.listStatus(p).toSeq.filterNot(
        _.getPath.getName.startsWith("_"))
      sts.flatMap(st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty)
    }
    val tmpRoot = fs.makeQualified(tmp).toString
    val staged = walk(tmp).sortBy(_.toString)
    // adopted names carry a per-writer uniquifier: two OPTIMISTIC
    // writers racing for the same version must never adopt to the
    // same path — the loser would clobber the winner's committed data
    // file before the CAS even ran
    val uniq = java.util.UUID.randomUUID().toString.take(8)
    val renamed = staged.zipWithIndex.map { case (src, i) =>
      val relStaged = fs.makeQualified(src).toString
        .stripPrefix(tmpRoot).stripPrefix("/")
      val dirs = relStaged.split('/').dropRight(1).toSeq
      val pv = parsePartitionDirs(dirs, effParts)
      val rel = (dirs :+ s"part-$tag-$uniq-$i.parquet").mkString("/")
      val fin = new Path(dst, rel)
      fs.mkdirs(fin.getParent)
      if (!fs.rename(src, fin))
        throw new IllegalStateException(s"rename failed for $rel")
      (rel, pv, fs.getFileStatus(fin).getLen, fin)
    }
    fs.delete(tmp, true)
    // footer stats: concurrently on the DRIVER below the gate,
    // as ONE Spark job over executors above it (task-collected write
    // statistics — O(files) ranged I/O must not serialize on the
    // driver at a 100 TB append)
    val gate = spark.conf
      .getOption("spark.sql.graft.footerStatsDriverMaxFiles")
      .map(_.toInt).getOrElse(64)
    if (renamed.size <= gate)
      FooterIo.mapAll(renamed) { case (rel, pv, len, fin) =>
        (rel, pv, len, footerStats(fsConf, fin)) }
    else {
      val sc = new SerializableHadoopConf(fsConf)
      val slices = math.max(1, math.min(renamed.size,
        spark.sparkContext.defaultParallelism))
      val statsByPath = spark.sparkContext
        .parallelize(renamed.map(_._4.toString), slices)
        .map(s => s -> footerStats(sc.value, new Path(s)))
        .collect().toMap
      renamed.map { case (rel, pv, len, fin) =>
        (rel, pv, len, statsByPath(fin.toString)) }
    }
  }

  /** True when the table declares `delta.enableChangeDataFeed` — the
    * property real Delta keys CDF writes on. */
  private[sources] def cdfEnabled(snap: Snapshot): Boolean =
    snap.configuration.get("delta.enableChangeDataFeed")
      .exists(_.trim.equalsIgnoreCase("true"))

  /** True when the table declares UniForm
    * (`delta.universalFormat.enabledFormats` contains `iceberg` —
    * the real Delta property): every commit then auto-advances the
    * IN-PLACE Iceberg mirror so external Iceberg readers always see
    * the latest Delta state without a manual mirror step. */
  private[sources] def uniformEnabled(conf: Map[String, String]): Boolean =
    conf.get("delta.universalFormat.enabledFormats")
      .exists(_.split(",").map(_.trim).contains("iceberg"))

  /** The post-commit UniForm hook: one metadata-only Iceberg commit
    * adopting the NEW live file set (no-op when the file set did not
    * change — property-only commits re-mirror nothing). Loud by
    * design if the table drifted into a mirror-incompatible state
    * the enable-time check could not foresee. */
  private def maybeUniform(spark: SparkSession, deltaPath: String,
                           conf: Map[String, String]): Unit =
    if (uniformEnabled(conf)) {
      IcebergTable.mirrorFromDelta(spark, deltaPath)
      ()
    }

  /** Stage `rows` (full table schema + `_change_type`) as CHANGE-DATA
    * files under `_change_data/` — the PROTOCOL.md "Add CDC File"
    * shape: hive-partitioned like the data (partition values in the
    * action, never in the file), `_change_type` a regular column in
    * the parquet, the directory underscore-prefixed so plain table
    * scans never list it. Returns the `cdc` action lines for the
    * commit (dataChange=false per the spec — CDC files never feed the
    * file-level diff). */
  private def stageCdcLines(spark: SparkSession, deltaPath: String,
                            snap: Snapshot, rows: DataFrame,
                            v: Long): Seq[String] = {
    val ordered = rows.select((snap.schema.fieldNames :+ "_change_type")
      .map(col).toIndexedSeq: _*)
    val adopted = stageData(spark, ordered,
      new Path(deltaPath, "_change_data"), snap.partitionColumns, s"cdc-$v")
    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    adopted.map { case (rel, pv, sz, _) =>
      s"""{"cdc":{"path":${jsEscape(encodePath(s"_change_data/$rel"))},"partitionValues":${pvJson(pv)},"size":$sz,"dataChange":false}}"""
    }
  }

  /** Parse hive-style partition directory segments of a staged
    * relative path into (partitionValues, fileName). */
  private[sources] def parsePartitionDirs(relDirs: Seq[String],
                                 partCols: Seq[String]): Map[String, String] = {
    val kv = relDirs.map { seg =>
      val eq = seg.indexOf('=')
      require(eq > 0, s"expected hive-style partition dir, got: $seg")
      val k = hiveUnescape(seg.substring(0, eq))
      val raw = hiveUnescape(seg.substring(eq + 1))
      k -> (if (raw == "__HIVE_DEFAULT_PARTITION__") null else raw)
    }.toMap
    require(kv.keySet == partCols.toSet,
      s"staged partition dirs ${kv.keySet} do not match declared $partCols")
    kv
  }

  /** Per-file Delta stats JSON read from the parquet FOOTER (no data
    * scan — one bounded driver-side footer read per adopted file):
    * `numRecords` plus min/max/nullCount for TOP-LEVEL NUMERIC leaf
    * columns (int32/int64/float/double). Strings, dates and nested
    * fields are deliberately omitted — a column without stats simply
    * never skips, which is always sound; recording truncated string
    * bounds correctly (min rounds down, max must round UP) is where
    * real engines have shipped wrong-results bugs. */
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
                          p: Path): Option[String] = try {
    import scala.collection.JavaConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      final class Agg {
        var min: Option[BigDecimal] = None
        var max: Option[BigDecimal] = None
        var nulls = 0L
        var isFloating = false
        var ok = true
      }
      val aggs = scala.collection.mutable.LinkedHashMap[String, Agg]()
      blocks.foreach(_.getColumns.asScala.foreach { cc =>
        val path = cc.getPath.toArray
        if (path.length == 1) {
          val a = aggs.getOrElseUpdate(path(0), new Agg)
          val st = cc.getStatistics
          if (st == null || st.isEmpty || st.getNumNulls < 0) a.ok = false
          else {
            a.nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              import org.apache.parquet.column.statistics._
              val mnmx: Option[(BigDecimal, BigDecimal)] = st match {
                case s: IntStatistics => Some((BigDecimal(s.getMin), BigDecimal(s.getMax)))
                case s: LongStatistics => Some((BigDecimal(s.getMin), BigDecimal(s.getMax)))
                case s: FloatStatistics =>
                  a.isFloating = true
                  Some((BigDecimal(s.getMin.toDouble), BigDecimal(s.getMax.toDouble)))
                case s: DoubleStatistics =>
                  a.isFloating = true
                  Some((BigDecimal(s.getMin), BigDecimal(s.getMax)))
                case _ => a.ok = false; None
              }
              mnmx.foreach { case (mn, mx) =>
                a.min = Some(a.min.fold(mn)(_.min(mn)))
                a.max = Some(a.max.fold(mx)(_.max(mx)))
              }
            }
          }
        }
      })
      def num(a: Agg, v: BigDecimal): String =
        if (a.isFloating) v.toDouble.toString else v.toBigIntExact
          .map(_.toString).getOrElse(v.toDouble.toString)
      val withStats = aggs.toSeq.filter(_._2.ok)
      val mins = withStats.collect { case (n, a) if a.min.isDefined =>
        s"${jsEscape(n)}:${num(a, a.min.get)}" }
      val maxs = withStats.collect { case (n, a) if a.max.isDefined =>
        s"${jsEscape(n)}:${num(a, a.max.get)}" }
      val nulls = withStats.map { case (n, a) => s"${jsEscape(n)}:${a.nulls}" }
      Some(s"""{"numRecords":$numRecords,"minValues":{${mins.mkString(",")}},"maxValues":{${maxs.mkString(",")}},"nullCount":{${nulls.mkString(",")}}}""")
    } finally r.close()
  } catch { case scala.util.control.NonFatal(_) => None } // no stats, never wrong stats

  /** How often [[write]] consolidates the log: every Nth commit
    * authors `<v>.checkpoint.parquet` + `_last_checkpoint`, so a
    * reader replays ONE distributed parquet read plus a bounded JSON
    * tail instead of the whole commit history — the difference
    * between O(1) and O(commits) planning for a streaming sink that
    * commits per micro-batch (real Delta's default cadence is also
    * 10). */
  val DefaultCheckpointInterval: Int = 10

  /** Checkpoint when due. The TABLE's `delta.checkpointInterval`
    * property overrides the caller's default cadence — the knob real
    * Delta writers honor. */
  private def maybeCheckpoint(spark: SparkSession, deltaPath: String,
                              v: Long, callerInterval: Int,
                              config: Map[String, String]): Unit = {
    // tolerant parse: the COMMIT already landed — a malformed
    // externally-set property must not fail a write that committed
    val interval = config.get("delta.checkpointInterval")
      .flatMap(_.trim.toIntOption).getOrElse(callerInterval)
    if (interval > 0 && v > 0 && v % interval == 0) {
      checkpoint(spark, deltaPath, v)
      // real Delta's post-checkpoint metadata cleanup (on by default;
      // delta.enableExpiredLogCleanup=false opts out): one listing,
      // usually zero victims — the log shrinks on the same cadence it
      // checkpoints, so a streaming sink's _delta_log stays bounded
      if (config.get("delta.enableExpiredLogCleanup")
        .forall(_.trim.equalsIgnoreCase("true")))
        cleanupLog(spark, deltaPath, configHint = Some(config))
    }
  }

  /** The (readerFeatures, writerFeatures) a LEGACY protocol implies —
    * what an upgrade to table features must enumerate (PROTOCOL.md
    * "Table Features"), or spec-compliant external writers stop
    * honoring existing constraints / generated columns. */
  private def legacyImpliedFeatures(mrv: Int, mwv: Int): (Seq[String], Seq[String]) = {
    val wf =
      if (mwv >= 7) Nil
      else Seq(
        2 -> Seq("appendOnly", "invariants"),
        3 -> Seq("checkConstraints"),
        4 -> Seq("changeDataFeed", "generatedColumns"),
        5 -> Seq("columnMapping"),
        6 -> Seq("identityColumns"))
        .filter(_._1 <= mwv).flatMap(_._2)
    val rf = if (mrv >= 3 || mrv < 2) Nil else Seq("columnMapping")
    (rf, wf)
  }

  /** What the committing transaction READ from the table — the input
    * to conflict classification when a concurrent writer wins the
    * version race (delta.io concurrency control, WriteSerializable):
    *  - [[BlindAppend]]: nothing was read (a pure append) — rebases
    *    over any data-only winner.
    *  - [[ReadFiles]]: specific files were read and every one of them
    *    appears in the commit's remove actions (OPTIMIZE/compaction) —
    *    a winner's APPEND cannot invalidate the work, only a winner
    *    touching the same files can.
    *  - [[ReadTable]]: rows were selected by predicate (DML, an
    *    overwrite, a validating DDL) — a winner's dataChange ADD may
    *    hold rows the predicate never saw, so it conflicts. */
  private[sources] sealed trait ReadScope
  private[sources] case object BlindAppend extends ReadScope
  private[sources] case object ReadFiles extends ReadScope
  private[sources] case object ReadTable extends ReadScope

  /** A concurrent winner took our version and the commits are NOT
    * logically disjoint — the graft twin of real Delta's
    * `ConcurrentModificationException` family. `kind` is the protocol
    * conflict class (ProtocolChanged / MetadataChanged /
    * ConcurrentAppend / ConcurrentDeleteDelete / ConcurrentTransaction). */
  final class CommitConflictException(val kind: String, msg: String)
    extends RuntimeException(s"$kind: $msg")

  /** Optimistic-concurrency commit — the shared CAS every DeltaLog
    * commit site routes through. Attempts the exclusive create of
    * `<v>.json`; when a concurrent writer already took the version,
    * READS the winner commit(s), classifies the logical conflict from
    * the action lines (PROTOCOL.md actions; delta.io "Concurrency
    * control" semantics at WriteSerializable), and REBASES — retries
    * the same action lines at the next free version — when the
    * transactions are disjoint:
    *
    *  - winner changed `protocol`                  → refuse
    *  - winner changed `metaData`                  → refuse
    *  - winner removed (or re-added) a path our commit removes
    *    (write-write on the same file)             → refuse
    *  - winner added dataChange files while we read by predicate
    *    ([[ReadTable]]: the winner's rows were never scanned by the
    *    DML/overwrite that produced this commit)   → refuse
    *  - winner committed our idempotent `txn` appId → refuse
    *  - otherwise → rebase at latest+1 (blind appends over anything
    *    data-only; OPTIMIZE's dataChange=false removes over appends;
    *    metadata-only DDL over data-only winners).
    *
    * Action lines are position-independent under log replay, so a
    * rebase re-writes them verbatim at the higher version — no
    * re-staging (staged file names may embed the originally attempted
    * version; that is cosmetic, the log's paths are what bind).
    * Returns the committed version. */
  /** ICT liveness from an already-replayed table configuration — the
    * hint commit sites pass to [[commitCas]] so an ICT-less table
    * (the common case) never pays a predecessor head read per
    * commit. */
  private[sources] def ictOn(cfg: Map[String, String]): Boolean =
    cfg.get("delta.enableInCommitTimestamps")
      .exists(_.trim.equalsIgnoreCase("true"))

  private[sources] def commitCas(spark: SparkSession, deltaPath: String,
                                 firstVersion: Long, lines: Seq[String],
                                 scope: ReadScope = ReadTable,
                                 maxRetries: Int = 20,
                                 operation: String = "",
                                 ictHint: Option[Boolean] = None): Long = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val fs = logDir(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parse(ls: Seq[String]) = ls.filter(_.trim.nonEmpty).map(M.readTree)
    // conflict bookkeeping is LAZY: the no-conflict fast path — the
    // overwhelmingly common case — never Jackson-parses its own
    // action lines; the first lost version race forces them once
    lazy val ours = parse(lines)
    // ROW-TRACKING rebase state: a data writer's add lines carry
    // baseRowId ranges + the watermark domain, both functions of the
    // base the commit actually lands on — rewritten per attempt
    var curLines: Seq[String] = lines
    lazy val oursRtWriter: Boolean = ours.exists(n =>
      Option(n.get("add")).exists(_.has("baseRowId")))
    lazy val ourRemoves: Set[String] = ours.flatMap(n => Option(n.get("remove")))
      .map(_.get("path").asText()).toSet
    lazy val ourTxnApps: Set[String] = ours.flatMap(n => Option(n.get("txn")))
      .map(_.get("appId").asText()).toSet
    lazy val ourDomains: Set[String] = ours
      .flatMap(n => Option(n.get("domainMetadata")))
      .map(_.get("domain").asText()).toSet
    // IN-COMMIT TIMESTAMPS (PROTOCOL.md §In-Commit Timestamps): when
    // the table carries delta.enableInCommitTimestamps, every commit's
    // commitInfo must record `inCommitTimestamp`, STRICTLY greater
    // than the predecessor's — so the payload is a function of the
    // attempted version (a rebase changes the predecessor) and is
    // rebuilt per attempt. Detection: a metaData action in OUR lines
    // is authoritative (it carries the full post-commit
    // configuration); otherwise the predecessor's commitInfo having
    // an ICT means the chain is live.
    // cheap containment probe first: commits without a metaData line
    // (every data commit) skip the Jackson parse entirely — a false
    // positive from a quoted "metaData" in stats just parses, safely
    val oursIctMeta: Option[Boolean] =
      if (!lines.exists(_.contains("\"metaData\""))) None
      else ours
      .flatMap(n => Option(n.get("metaData"))).lastOption.map { md =>
        Option(md.get("configuration"))
          .flatMap(c => Option(c.get("delta.enableInCommitTimestamps")))
          .exists(_.asText().trim.equalsIgnoreCase("true"))
      }
    // head-line commitInfo of a committed version; polls the brief
    // create-to-write window of a racing winner (same treatment as
    // the Iceberg side's readJson)
    def headCommitInfo(pv: Long): Option[com.fasterxml.jackson.databind.JsonNode] = {
      val p = new Path(logDir(deltaPath), pad20(pv) + ".json")
      var tries = 0
      while (true) {
        val parsed =
          try {
            val in = fs.open(p)
            val first = try {
              val br = new java.io.BufferedReader(
                new java.io.InputStreamReader(in, "UTF-8"))
              br.readLine()
            } finally in.close()
            if (first == null) None
            else Some(Option(M.readTree(first).get("commitInfo")))
          } catch {
            case _: java.io.FileNotFoundException => return None
            case _: Exception => None // torn mid-write — poll
          }
        parsed match {
          case Some(ci) => return ci
          case None =>
            tries += 1
            if (tries > 50) return None
            Thread.sleep(10)
        }
      }
      None // unreachable
    }
    def prevIct(pv: Long): Option[Long] =
      headCommitInfo(pv).flatMap(ci =>
        Option(ci.get("inCommitTimestamp")).map(_.asLong()))
    def infoJson(ts: Long, ict: Option[Long]): String = {
      val ictField = ict.map(t => s""","inCommitTimestamp":$t""").getOrElse("")
      s"""{"commitInfo":{"timestamp":$ts,"operation":${jsEscape(operation)},"engineInfo":"graft"$ictField}}"""
    }
    // enablement bookkeeping the spec mandates when ICT turns on
    // after table creation: record the version+timestamp it became
    // live at, in the SAME metaData the enablement commits
    def injectEnablement(line: String, v: Long, ict: Long): String = {
      val node = M.readTree(line)
      val md = node.get("metaData")
      val cfg = if (md == null) null else md.get("configuration")
      if (cfg == null || !cfg.isObject) line
      else {
        val obj = cfg.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        obj.put("delta.inCommitTimestampEnablementVersion", v.toString)
        obj.put("delta.inCommitTimestampEnablementTimestamp", ict.toString)
        M.writeValueAsString(node)
      }
    }
    def payloadFor(v: Long): Array[Byte] = {
      val prevVOpt = if (v == 0) None else Some(v - 1)
      // ICT liveness, cheapest source first: our own metaData line is
      // authoritative (it carries the post-commit configuration);
      // else the caller's already-replayed configuration (ictHint);
      // the per-commit predecessor head read happens ONLY when
      // neither is known, or when the chain is live and the floor is
      // actually needed — never as a probe on an ICT-less table
      lazy val prevI = prevVOpt.flatMap(prevIct)
      val enabled = oursIctMeta.orElse(ictHint).getOrElse(prevI.isDefined)
      val out: Seq[String] =
        if (!enabled) {
          val infoLine =
            if (operation.isEmpty) None
            else Some(infoJson(System.currentTimeMillis(), None))
          infoLine.toSeq ++ curLines
        } else {
          // floor: predecessor ICT + 1, or (fresh enablement over a
          // non-ICT history) strictly after its file timestamp
          val floor = prevVOpt.map { pv =>
            prevI.map(_ + 1L).getOrElse(
              // predecessor JSON may be metadata-cleaned away — the
              // wall clock is then the only floor
              try fs.getFileStatus(new Path(logDir(deltaPath),
                pad20(pv) + ".json")).getModificationTime + 1L
              catch { case _: java.io.FileNotFoundException => 0L })
          }.getOrElse(0L)
          val ict = math.max(System.currentTimeMillis(), floor)
          val adj =
            if (oursIctMeta.contains(true) && prevI.isEmpty && v > 0)
              curLines.map(l => injectEnablement(l, v, ict))
            else curLines
          infoJson(ict, Some(ict)) +: adj
        }
      (out.mkString("\n") + "\n").getBytes("UTF-8")
    }

    var v = firstVersion
    var attempts = 0
    while (true) {
      val commit = new Path(logDir(deltaPath), pad20(v) + ".json")
      val created = AtomicCas.createExclusive(fs, commit, payloadFor(v))
      if (created) return v
      attempts += 1
      if (attempts > maxRetries) throw new CommitConflictException(
        "CommitRetriesExhausted",
        s"$deltaPath: lost the version race $maxRetries times in a row")
      // the winner(s): every commit from our attempted version up to
      // the current head — each must be disjoint from ours for the
      // rebase to be sound
      val latest = listVersions(spark, deltaPath).last
      var winnerRtHwm: Option[Long] = None
      (v to latest).foreach { w =>
        val p = new Path(logDir(deltaPath), pad20(w) + ".json")
        val in = fs.open(p)
        val text = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          new String(bos.toByteArray, "UTF-8")
        } finally in.close()
        val ws = parse(text.split('\n').toSeq)
        if (ws.exists(_.has("protocol")))
          throw new CommitConflictException("ProtocolChanged",
            s"$deltaPath: commit $w upgraded the protocol under us")
        if (ws.exists(_.has("metaData")))
          throw new CommitConflictException("MetadataChanged",
            s"$deltaPath: commit $w changed the table metadata under us")
        val wRemoves = ws.flatMap(n => Option(n.get("remove")))
          .map(_.get("path").asText()).toSet
        val wAdds = ws.flatMap(n => Option(n.get("add")))
        val wAddPaths = wAdds.map(_.get("path").asText()).toSet
        val touched = ourRemoves.find(r => wRemoves(r) || wAddPaths(r))
        touched.foreach(pth => throw new CommitConflictException(
          "ConcurrentDeleteDelete",
          s"$deltaPath: commit $w also rewrote/removed $pth"))
        val wBlindAdds = wAdds.exists(a =>
          Option(a.get("dataChange")).exists(_.asBoolean()))
        if (scope == ReadTable && wBlindAdds)
          throw new CommitConflictException("ConcurrentAppend",
            s"$deltaPath: commit $w added data files our predicate-scoped " +
              "read never scanned")
        val wTxn = ws.flatMap(n => Option(n.get("txn")))
          .map(_.get("appId").asText()).toSet
        val sameApp = ourTxnApps.intersect(wTxn)
        if (sameApp.nonEmpty) throw new CommitConflictException(
          "ConcurrentTransaction",
          s"$deltaPath: commit $w carries txn appId ${sameApp.head} — the " +
            "same idempotent writer raced itself")
        // domain metadata: last-writer-wins per domain, so a rebase
        // over a winner that touched the SAME domain would silently
        // clobber its state — refuse; different domains are disjoint.
        // EXCEPTION: the row-id high watermark — two data writers
        // both advance delta.rowTracking, and the loser RE-ASSIGNS
        // its ranges above the winner's watermark instead of failing
        // (real Delta's row-id reconciliation; recorded here, applied
        // after the winner scan)
        val wDomainNodes = ws.flatMap(n => Option(n.get("domainMetadata")))
        val wDomains = wDomainNodes.map(_.get("domain").asText()).toSet
        if (oursRtWriter && wDomains.contains(RowTrackingDomain)) {
          wDomainNodes.filter(_.get("domain").asText() == RowTrackingDomain)
            .foreach { d =>
              val hwm = M.readTree(d.get("configuration").asText())
                .get("rowIdHighWaterMark").asLong()
              winnerRtHwm = Some(math.max(winnerRtHwm.getOrElse(-1L), hwm))
            }
        }
        val sameDomain = ourDomains.intersect(wDomains) --
          (if (oursRtWriter) Set(RowTrackingDomain) else Set.empty[String])
        if (sameDomain.nonEmpty) throw new CommitConflictException(
          "ConcurrentDomainMetadata",
          s"$deltaPath: commit $w also set domain metadata for " +
            s"'${sameDomain.head}'")
      }
      v = latest + 1
      // row-tracking rebase: restamp defaultRowCommitVersion at the
      // new landing version, and shift our baseRowId ranges (and our
      // watermark domain) past a concurrent winner's watermark
      if (oursRtWriter) {
        val parsed = curLines.map(M.readTree)
        val ourMinBase = parsed.flatMap(n => Option(n.get("add")))
          .filter(_.has("baseRowId")).map(_.get("baseRowId").asLong()).min
        val shift = winnerRtHwm.map(h => math.max(0L, h + 1 - ourMinBase))
          .getOrElse(0L)
        curLines = curLines.map { l =>
          val n = M.readTree(l)
          val add = n.get("add")
          val dm = n.get("domainMetadata")
          if (add != null && add.has("baseRowId")) {
            val a = add.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            a.put("baseRowId", a.get("baseRowId").asLong() + shift)
            a.put("defaultRowCommitVersion", v)
            M.writeValueAsString(n)
          } else if (shift != 0L && dm != null &&
            dm.get("domain").asText() == RowTrackingDomain) {
            val d = dm.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            val hwm = M.readTree(d.get("configuration").asText())
              .get("rowIdHighWaterMark").asLong()
            d.put("configuration",
              s"""{"rowIdHighWaterMark":${hwm + shift}}""")
            M.writeValueAsString(n)
          } else l
        }
      }
    }
    -1L // unreachable
  }

  /** Write `df` as ONE new commit of a real Delta table at
    * `deltaPath` — append by default, full overwrite with
    * `overwrite = true`; creates the table (commit 0 with
    * protocol/metaData) when the log doesn't exist yet.
    *
    * `partitionBy` lays the data out hive-style (one directory level
    * per partition column) with REAL `partitionValues` in the add
    * actions — partition columns are dropped from the data files per
    * the Delta spec (values live only in the log), and
    * [[readSnapshot]] prunes on them before the scan. Appends to a
    * partitioned table inherit its partitioning; passing a DIFFERENT
    * `partitionBy` on append is a loud error, never a silently
    * forked layout.
    *
    * Appends to an existing table require an identical schema (loud
    * error, never a silently forked log). The commit file is created
    * with exclusive-create semantics, so two racing writers cannot
    * both claim the same version on filesystems honoring atomic
    * create (the same contract VersionedTable's CAS commit
    * documents). Every `checkpointInterval`-th commit also authors a
    * classic single-file checkpoint parquet and `_last_checkpoint`.
    * Returns the committed Delta version. */
  /** `CREATE TABLE dst SHALLOW CLONE src` — the ZERO-COPY Delta →
    * Delta clone (the dev-copy-of-prod shape): one commit at `dst`
    * ADOPTS the source's current live files by ABSOLUTE path — no
    * data copied — and carries the schema (field metadata included:
    * column mapping, generation), partitioning, configuration
    * (constraints keep binding writers of the clone) and PROTOCOL
    * (features the adopted files depend on must not downgrade).
    * The clone then evolves independently: appends/DML land under
    * `dst`, the source never sees them, and `vacuum` on the clone
    * walks only `dst` so adopted source files are never deleted
    * through the clone. The clone is marked `graft.cloneOf`; like
    * real Delta, vacuuming the SOURCE past the clone point breaks
    * the clone's time travel — the marker documents the dependency.
    * DV-bearing sources refuse loudly: their sidecar paths resolve
    * against the table root and would dangle under `dst` (OPTIMIZE
    * the source first — compaction applies the vectors). */
  def cloneShallow(spark: SparkSession, srcPath: String,
                   dstPath: String): Long = {
    val src = snapshot(spark, srcPath)
    require(src.files.forall(_.dv.forall(_.cardinality == 0L)),
      s"$srcPath carries deletion vectors whose sidecar paths resolve " +
        "against the table root — they would dangle under the clone; " +
        "OPTIMIZE first (compaction applies the vectors)")
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(dstPath)
    val fs = dst.getFileSystem(fsConf)
    require(!fs.exists(logDir(dstPath)) ||
      fs.listStatus(logDir(dstPath)).isEmpty,
      s"Delta table already exists at $dstPath")
    fs.mkdirs(logDir(dstPath))
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val now = System.currentTimeMillis()
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("delta-clone:" + dstPath).getBytes("UTF-8")).toString
    val (mrv, mwv, rf, wf) = src.protocol
    val protoLine =
      if (mwv >= 7 || rf.nonEmpty || wf.nonEmpty)
        s"""{"protocol":{"minReaderVersion":$mrv,"minWriterVersion":$mwv,"readerFeatures":${rf.map(jsEscape).mkString("[", ",", "]")},"writerFeatures":${wf.map(jsEscape).mkString("[", ",", "]")}}}"""
      else s"""{"protocol":{"minReaderVersion":$mrv,"minWriterVersion":$mwv}}"""
    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines += protoLine
    lines += metaDataLine(tableId, src.schema.json, src.partitionColumns,
      now, src.configuration + ("graft.cloneOf" -> srcPath))
    // live domains travel with the clone: the row-id high watermark
    // (adopted files carry their baseRowIds) and clustering columns
    // are table state, not location state
    src.domains.toSeq.sortBy(_._1).foreach { case (d, c) =>
      lines += domainMetadataLine(d, c, removed = false)
    }
    src.files.foreach { f =>
      val abs = encodePath(deScheme(
        fs.makeQualified(new Path(f.path)).toString))
      val statsPart = f.stats.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(abs)},"partitionValues":${pvJson(f.partitionValues)},"size":${f.size},"modificationTime":$now,"dataChange":true$statsPart${rtCarry(f)}}}"""
    }
    commitCas(spark, dstPath, 0L, lines.toSeq, ReadTable,
      operation = "CLONE")
  }

  /** `CONVERT TO DELTA` — adopt an existing parquet directory IN
    * PLACE as a real Delta table (the standard first step of a Delta
    * migration; Delta's own CONVERT TO DELTA command): ONE commit
    * (protocol + metaData + one add per data file) references the
    * files where they already sit — NO data copied or rewritten, so a
    * 100 TB directory converts with metadata I/O only (schema from
    * the parquet footers via Spark's schema inference; per-file
    * numRecords/bounds stats from the footers, never a data scan).
    * Hive-partitioned layouts convert with `partitionBy` naming the
    * directory keys — partition values land in the add actions per
    * the Delta convention, and the partition COLUMNS must not also be
    * in the parquet (that is the hive layout; a mismatch refuses).
    * Refuses when a `_delta_log` already exists. Returns version 0. */
  def convertToDelta(spark: SparkSession, path: String,
                     partitionBy: Seq[String] = Seq.empty): Long = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val fs = dst.getFileSystem(fsConf)
    require(fs.exists(dst), s"no directory at $path")
    require(!fs.exists(logDir(path)) ||
      fs.listStatus(logDir(path)).isEmpty,
      s"$path already holds a _delta_log — it IS a Delta table")
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
        .flatMap(st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
          else Seq.empty)
    val files = walk(dst)
    require(files.nonEmpty, s"no parquet files under $path")
    // schema: Spark's parquet inference over the directory — the same
    // schema any reader of the raw directory already saw; partition
    // columns come from the directory keys
    val df = spark.read.parquet(path)
    val schema = df.schema
    partitionBy.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not found in the inferred schema " +
        s"${schema.fieldNames.mkString(", ")} — name hive directory keys"))
    val now = System.currentTimeMillis()
    val rootQ = fs.makeQualified(dst).toString
    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    lines += metaDataLine(java.util.UUID.nameUUIDFromBytes(
      ("delta-convert:" + path).getBytes("UTF-8")).toString,
      schema.json, partitionBy, now)
    files.sortBy(_.toString).foreach { f =>
      val rel = fs.makeQualified(f).toString
        .stripPrefix(rootQ).stripPrefix("/")
      val dirs = rel.split('/').dropRight(1).toSeq
      val pv =
        if (partitionBy.isEmpty) Map.empty[String, String]
        else parsePartitionDirs(dirs, partitionBy)
      val st = fs.getFileStatus(f)
      val statsPart = footerStats(fsConf, f)
        .map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":${st.getLen},"modificationTime":${st.getModificationTime},"dataChange":true$statsPart}}"""
    }
    commitCas(spark, path, 0L, lines.toSeq, ReadTable,
      operation = "CONVERT")
  }

  /** The metadata key of a GENERATED column (PROTOCOL.md "Generated
    * Columns"): the column's value is always `expr` over the row's
    * other columns. Writers either OMIT the column (graft computes
    * it) or must supply exactly the generated value — a mismatch
    * vetoes the commit ([[enforceInvariants]] checks it on every
    * write path, DML included). */
  val GenerationExprKey = "delta.generationExpression"
  /** IDENTITY column metadata keys (PROTOCOL.md §Identity Columns). */
  /** Column-default metadata key (Spark's own CURRENT_DEFAULT — what
    * delta-spark persists into the schemaString; PROTOCOL.md "Column
    * Defaults", writer feature `allowColumnDefaults`). */
  val ColumnDefaultKey = "CURRENT_DEFAULT"
  val IdentityStartKey = "delta.identity.start"
  val IdentityStepKey = "delta.identity.step"
  val IdentityHwmKey = "delta.identity.highWaterMark"
  val IdentityAllowExplicitKey = "delta.identity.allowExplicitInsert"

  /** `CREATE TABLE` — commit version 0 (protocol + metaData) with NO
    * data: the declared schema (which may carry GENERATED column
    * metadata and NOT NULL fields), partitioning and configuration
    * land before the first row, so every subsequent writer is bound
    * by them. Generated columns bump the protocol to what real
    * writers key on (minWriterVersion 4, the version that introduced
    * them). Refuses when the table already exists. */
  def createTable(spark: SparkSession, deltaPath: String,
                  schema: StructType, partitionBy: Seq[String] = Seq.empty,
                  configuration: Map[String, String] = Map.empty): Long = {
    val fs = new Path(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(logDir(deltaPath)) ||
      fs.listStatus(logDir(deltaPath)).isEmpty,
      s"Delta table already exists at $deltaPath")
    partitionBy.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in ${schema.fieldNames.mkString(",")}"))
    schema.fields.filter(_.metadata.contains(GenerationExprKey)).foreach {
      f =>
        require(!partitionBy.contains(f.name),
          s"generated column ${f.name} cannot be a partition column")
        // the expression must reference only OTHER columns
        val e = f.metadata.getString(GenerationExprKey)
        require(!("""\b""" + java.util.regex.Pattern.quote(f.name) +
          """\b""").r.findFirstIn(e).isDefined,
          s"generated column ${f.name} references itself: $e")
    }
    // configuration consistency: feature-bearing properties carry the
    // SAME protocol obligations here as on the post-create paths —
    // a CDF table at writer 2 would be protocol-invalid; constraint
    // and mapping keys must go through their validating DDL
    configuration.keys.foreach { k =>
      require(!k.startsWith("delta.constraints."),
        s"set $k through ALTER TABLE … ADD CONSTRAINT — constraints " +
          "are validated there")
      require(k != "delta.columnMapping.mode",
        "enable column mapping through ALTER TABLE … SET TBLPROPERTIES " +
          "after creation — the upgrade assigns ids and physical names")
    }
    fs.mkdirs(logDir(deltaPath))
    val hasGen = schema.fields.exists(_.metadata.contains(GenerationExprKey))
    val hasCdf = configuration.get("delta.enableChangeDataFeed")
      .exists(_.trim.equalsIgnoreCase("true"))
    val idFields = schema.fields.filter(_.metadata.contains(IdentityStartKey))
    idFields.foreach { f =>
      require(!partitionBy.contains(f.name),
        s"IDENTITY column ${f.name} cannot be a partition column")
      require(f.dataType == LongType,
        s"IDENTITY column ${f.name} must be BIGINT")
    }
    // identity columns are a writer-6 protocol feature
    val minWriter =
      if (idFields.nonEmpty) 6 else if (hasGen || hasCdf) 4 else 2
    // column DEFAULTs are a TABLE FEATURE (no legacy writer version):
    // writer 7 + allowColumnDefaults, legacy-implied features kept
    val hasDefaults =
      schema.fields.exists(_.metadata.contains(ColumnDefaultKey))
    val protoLine =
      if (!hasDefaults)
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":$minWriter}}"""
      else {
        val (_, legacyWf) = legacyImpliedFeatures(1, minWriter)
        val wf = (legacyWf :+ "allowColumnDefaults").distinct.sorted
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":${wf.map(jsEscape).mkString("[", ",", "]")}}}"""
      }
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    val lines = Seq(
      protoLine,
      metaDataLine(tableId, schema.json, partitionBy,
        System.currentTimeMillis(), configuration))
    commitCas(spark, deltaPath, 0L, lines, ReadTable,
      operation = "CREATE TABLE")
  }

  def write(spark: SparkSession, dfIn: DataFrame, deltaPath: String,
            overwrite: Boolean = false,
            partitionBy: Seq[String] = Seq.empty,
            checkpointInterval: Int = DefaultCheckpointInterval,
            txn: Option[(String, Long)] = None,
            mergeSchema: Boolean = false): Long = {
    // the identity-column pin must not outlive a FAILED write
    // (CommitRetriesExhausted, invariant violation): the holder +
    // finally guarantees the executor cache blocks free on every
    // exit path, not just the success one
    val pinned = new java.util.concurrent.atomic.AtomicReference[DataFrame]
    try writeImpl(spark, dfIn, deltaPath, overwrite, partitionBy,
      checkpointInterval, txn, mergeSchema, pinned)
    finally Option(pinned.get).foreach(_.unpersist(blocking = false))
  }

  private def writeImpl(spark: SparkSession, dfIn: DataFrame,
                        deltaPath: String, overwrite: Boolean,
                        partitionBy: Seq[String],
                        checkpointInterval: Int,
                        txn: Option[(String, Long)],
                        mergeSchema: Boolean,
                        pinned: java.util.concurrent.atomic.AtomicReference[DataFrame]): Long = {
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

    val prior: Option[Snapshot] =
      if (existing.nonEmpty) Some(snapshot(spark, deltaPath)) else None
    // a declared writer feature we don't implement, or an overwrite
    // of an append-only table, must refuse BEFORE anything stages
    prior.foreach(p => validateWritable(p, removesData = overwrite))
    // NESTED column defaults refuse loudly (the Delta twin of the
    // Iceberg nested-defaults gate): Spark/delta-spark only define
    // CURRENT_DEFAULT for top-level columns, so a foreign schema
    // carrying it on a struct-inner field is out of spec — writing
    // through it would silently not fill what its author intended
    prior.foreach { p =>
      def nested(dt: DataType): Boolean = dt match {
        case s: StructType => s.fields.exists(f =>
          f.metadata.contains(ColumnDefaultKey) || nested(f.dataType))
        case a: ArrayType => nested(a.elementType)
        case m: MapType => nested(m.keyType) || nested(m.valueType)
        case _ => false
      }
      p.schema.fields.filter(f => nested(f.dataType)).foreach(f =>
        throw new UnsupportedOperationException(
          s"column ${f.name} of $deltaPath carries a CURRENT_DEFAULT on " +
            "a NESTED field — Delta column defaults are defined for " +
            "top-level columns only; refusing rather than silently " +
            "ignoring the default"))
    }
    // GENERATED columns: a writer may OMIT them — computed here over
    // the incoming rows, in the table's declared column order.
    // PROVIDED values are validated by [[enforceInvariants]] below,
    // like every other invariant (a mismatch vetoes the commit).
    // The fill only applies when the frame IS the table's schema
    // minus some generated columns (case-insensitively) — an
    // overwrite replacing the schema outright must not have the old
    // generation expressions evaluated over unrelated columns.
    val dfGen: DataFrame = {
      val fillable = prior.exists { p =>
        val ps = p.schema
        val lower = ps.fieldNames.map(n => n.toLowerCase -> n).toMap
        val missing = ps.fieldNames.toSet --
          dfIn.columns.flatMap(c => lower.get(c.toLowerCase)).toSet
        dfIn.columns.forall(c => lower.contains(c.toLowerCase)) &&
          missing.nonEmpty &&
          missing.forall(n => ps(n).metadata.contains(GenerationExprKey) ||
            ps(n).metadata.contains(IdentityStartKey) ||
            ps(n).metadata.contains(ColumnDefaultKey))
      }
      if (!fillable) dfIn
      else {
        val ps = prior.get.schema
        var d = dfIn
        ps.fields.filter(f => f.metadata.contains(GenerationExprKey) &&
          !dfIn.columns.exists(_.equalsIgnoreCase(f.name)))
          .foreach(f => d = d.withColumn(f.name,
            expr(f.metadata.getString(GenerationExprKey)).cast(f.dataType)))
        // column DEFAULTs (PROTOCOL.md "Column Defaults"): an append
        // omitting a defaulted column writes the default's value
        ps.fields.filter(f => f.metadata.contains(ColumnDefaultKey) &&
          !f.metadata.contains(GenerationExprKey) &&
          !f.metadata.contains(IdentityStartKey) &&
          !dfIn.columns.exists(_.equalsIgnoreCase(f.name)))
          .foreach(f => d = d.withColumn(f.name,
            expr(f.metadata.getString(ColumnDefaultKey)).cast(f.dataType)))
        d // identity columns fill below; the final select happens there
      }
    }
    // IDENTITY columns (PROTOCOL.md §Identity Columns): a frame that
    // OMITS an identity column gets values ALLOCATED — contiguous
    // from the high watermark, distributed as base + step×(partition
    // offset + row index within the partition); the SAME commit's
    // metaData advances `delta.identity.highWaterMark`, which is what
    // makes concurrent identity appends safe: the loser of the
    // version race sees a winner metaData change and refuses
    // (MetadataChanged) instead of silently double-allocating.
    // Explicit values need GENERATED BY DEFAULT
    // (allowExplicitInsert=true) and push the watermark past their
    // extreme. The per-partition count pass is one column-pruned job;
    // nothing row-sized reaches the driver.
    val identityFields: Seq[StructField] = prior.toSeq.flatMap(_.schema.fields)
      .filter(_.metadata.contains(IdentityStartKey))
    var identitySchema: Option[StructType] = None
    val dfId: DataFrame = if (identityFields.isEmpty) dfGen else {
      val ps = prior.get.schema
      val lower = ps.fieldNames.map(n => n.toLowerCase -> n).toMap
      // fill only a TABLE-SHAPED frame whose only absent columns are
      // identity columns — a schema-replacing overwrite (or a frame
      // missing regular columns, which the append gate refuses with
      // its own message) passes through untouched
      val tableShaped =
        dfGen.columns.forall(c => lower.contains(c.toLowerCase)) &&
          ps.fieldNames
            .filterNot(n => dfGen.columns.exists(_.equalsIgnoreCase(n)))
            .forall(n => ps(n).metadata.contains(IdentityStartKey))
      if (!tableShaped) dfGen // schema-replacing overwrite
      else {
        val missing = identityFields
          .filterNot(f => dfGen.columns.exists(_.equalsIgnoreCase(f.name)))
        val explicit = identityFields
          .filter(f => dfGen.columns.exists(_.equalsIgnoreCase(f.name)))
        explicit.foreach { f =>
          require(f.metadata.contains(IdentityAllowExplicitKey) &&
            f.metadata.getBoolean(IdentityAllowExplicitKey),
            s"column ${f.name} is GENERATED ALWAYS AS IDENTITY — " +
              "explicit values are not accepted (use GENERATED BY DEFAULT)")
        }
        var updated: Map[String, Long] = Map.empty // name -> new HWM
        var d = dfGen
        if (missing.nonEmpty) {
          // PIN the partition-to-rows mapping first: the offsets the
          // count pass computes must describe the SAME partitions the
          // write job evaluates later — an upstream with any
          // non-determinism (sample, round-robin repartition, flaky
          // source) could otherwise shift rows between the two jobs
          // and silently duplicate or skip identity values
          d = d.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinned.set(d) // caller unpersists in finally — every exit path
          // ONE count pass serves every missing identity column
          val pidCounts = d
            .groupBy(spark_partition_id().as("__pid")).count()
            .collect().map(r => r.getInt(0) -> r.getLong(1))
            .sortBy(_._1)
          val total = pidCounts.map(_._2).sum
          val offsets: Map[Int, Long] = pidCounts
            .scanLeft((-1, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
            .sliding(2).collect { case Array((_, acc), (pid, _)) =>
              pid -> acc }.toMap
          missing.foreach { f =>
            val start = f.metadata.getLong(IdentityStartKey)
            val step = f.metadata.getLong(IdentityStepKey)
            val hwm =
              if (f.metadata.contains(IdentityHwmKey))
                f.metadata.getLong(IdentityHwmKey)
              else start - step
            val rowIdx = monotonically_increasing_id()
              .bitwiseAND(lit((1L << 33) - 1))
            d = d.withColumn(f.name, (lit(hwm + step) + lit(step) *
              (element_at(typedlit(offsets), spark_partition_id()) + rowIdx))
              .cast(f.dataType))
            if (total > 0) updated += f.name -> (hwm + step * total)
          }
        }
        explicit.foreach { f =>
          val step = f.metadata.getLong(IdentityStepKey)
          val ext = d.agg(
            (if (step >= 0) max(col(f.name)) else min(col(f.name)))
              .cast("long")).collect().head
          if (!ext.isNullAt(0)) {
            val x = ext.getLong(0)
            val cur = if (f.metadata.contains(IdentityHwmKey))
              Some(f.metadata.getLong(IdentityHwmKey)) else None
            val push = cur match {
              case Some(h) if (step >= 0 && x <= h) || (step < 0 && x >= h) =>
                None
              case _ => Some(x)
            }
            push.foreach(nh => updated += f.name -> nh)
          }
        }
        if (updated.nonEmpty)
          identitySchema = Some(StructType(ps.fields.map(f =>
            updated.get(f.name) match {
              case Some(nh) => f.copy(metadata = new MetadataBuilder()
                .withMetadata(f.metadata).putLong(IdentityHwmKey, nh).build())
              case None => f
            })))
        d
      }
    }
    // filled frames (generated and/or identity columns) re-align to
    // the table's declared column order; untouched frames pass as-is
    val df: DataFrame = prior match {
      case Some(p) if dfId.ne(dfIn) =>
        dfId.select(p.schema.fieldNames.map(col).toIndexedSeq: _*)
      case _ => dfId
    }

    // names + types must match exactly; nullability and metadata are
    // presentation details parquet does not enforce (a non-nullable
    // frame appends fine into a nullable table)
    def normType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, normType(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(normType(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(normType(m.keyType), normType(m.valueType), valueContainsNull = true)
      case other => other
    }
    def shape(s: StructType): StructType =
      normType(s).asInstanceOf[StructType]
    // COLUMN-MAPPED tables take writes: the frame is staged under the
    // schema's physicalNames (and physical partition dirs), so
    // existing files and fresh ones agree on the parquet layout. In
    // `id` mode the staged parquet ADDITIONALLY carries each column's
    // spec id as `parquet.field.id` footer metadata, so engines that
    // resolve by field id (the point of id mode) read the appended
    // files like any other. The SCHEMA may not change through a write
    // (evolution on a mapped table needs fresh column ids — the DDL
    // path).
    def cmModeOf(p: Snapshot): String =
      p.configuration.getOrElse("delta.columnMapping.mode", "none")
    val mappedPrior: Option[Snapshot] = prior.filter(p =>
      cmModeOf(p) != "none" || isColumnMapped(p.schema))
    mappedPrior.foreach { p =>
      require(cmModeOf(p) == "name" || cmModeOf(p) == "id",
        s"write on a ${cmModeOf(p)}-mode column-mapped table is not " +
          "supported")
      if (cmModeOf(p) == "id") {
        require(spark.conf.get(
          "spark.sql.parquet.fieldId.write.enabled", "true") == "true",
          "id-mode column-mapping writes need " +
            "spark.sql.parquet.fieldId.write.enabled=true")
        p.schema.fields.foreach(f =>
          require(f.metadata.contains("delta.columnMapping.id"),
            s"id-mode table field ${f.name} lacks delta.columnMapping.id"))
      }
      p.schema.fields.foreach(f => if (nestedMapped(f.dataType))
        throw new UnsupportedOperationException(
          s"write with nested column-mapping physical names under " +
            s"field ${f.name} is not supported"))
      require(shape(p.schema) == shape(df.schema),
        s"write on column-mapped $deltaPath must match the table " +
          s"schema exactly (${df.schema.simpleString} vs " +
          s"${p.schema.simpleString}) — schema changes need fresh " +
          "column ids (RENAME/DROP/ADD COLUMN DDL)")
    }
    // `option("mergeSchema", "true")` appends — the way most users
    // actually evolve Delta schemas: NEW columns (forced nullable —
    // existing rows carry no value) widen the table schema in the SAME
    // commit's metaData; existing columns must keep their exact types;
    // the incoming frame may also OMIT existing columns (the new files
    // serve them as null via schema-on-read). Column-mapped tables
    // refuse toward the DDL path (evolution needs fresh column ids).
    val mergedSchema: Option[StructType] =
      if (overwrite || !mergeSchema) None
      else prior.flatMap { p =>
        require(mappedPrior.isEmpty,
          s"mergeSchema append on column-mapped $deltaPath is not " +
            "supported — use ALTER TABLE ADD COLUMNS (fresh column ids)")
        val priorTypes = p.schema.fields.map(f => f.name -> f.dataType).toMap
        df.schema.fields.foreach(f => priorTypes.get(f.name).foreach(t =>
          require(t == f.dataType,
            s"mergeSchema cannot change column ${f.name}: table has $t, " +
              s"incoming ${f.dataType}")))
        // an OMITTED column serves null from the new files — that must
        // never silently violate a NOT NULL invariant or a GENERATED
        // expression (enforceInvariants can only check columns present
        // in the frame)
        p.schema.fields.filterNot(f => df.columns.contains(f.name))
          .foreach { f =>
            require(f.nullable,
              s"mergeSchema append omits NOT NULL column ${f.name} — " +
                "its rows would read as null")
            require(!f.metadata.contains(GenerationExprKey),
              s"mergeSchema append omits GENERATED column ${f.name} — " +
                "supply it or let a full-schema write compute it")
          }
        val newFields = df.schema.fields
          .filterNot(f => priorTypes.contains(f.name))
          .map(f => f.copy(nullable = true))
        if (newFields.isEmpty) None
        else Some(StructType(p.schema.fields ++ newFields))
      }
    prior.filter(_ => !overwrite).foreach { p =>
      if (!mergeSchema)
        require(shape(p.schema) == shape(df.schema),
          s"append schema ${df.schema.simpleString} does not match table " +
            s"schema ${p.schema.simpleString}; use overwrite to replace " +
            "or mergeSchema to evolve")
      require(partitionBy.isEmpty || partitionBy == p.partitionColumns,
        s"append partitionBy $partitionBy does not match table " +
          s"partitioning ${p.partitionColumns}")
    }
    // append AND overwrite inherit the table's partitioning when
    // partitionBy is not given (an overwrite must never SILENTLY
    // de-partition a table); an overwrite with an explicit different
    // partitionBy re-lays the table out
    val effParts: Seq[String] = prior match {
      case Some(p) if partitionBy.isEmpty => p.partitionColumns
      case _ => partitionBy
    }
    effParts.foreach(c => require(df.columns.contains(c),
      s"partition column $c not in ${df.columns.mkString(",")}"))
    // a UniForm table's Iceberg mirror adopts hive-layout files whose
    // partition columns are NOT in the parquet — refuse the layout
    // change BEFORE committing, not at the post-commit mirror step
    prior.filter(p => uniformEnabled(p.configuration)).foreach { _ =>
      require(effParts.isEmpty,
        s"UniForm table $deltaPath cannot take partitioned writes — " +
          "disable delta.universalFormat.enabledFormats first")
    }

    // CHECK constraints + NOT NULL invariants veto the commit BEFORE
    // anything is staged. An overwrite that REPLACES the schema drops
    // the old nullability with it — but a shape-equal overwrite KEEPS
    // the prior metaData (see the commit assembly), so its NOT NULL
    // declarations still bind and must be enforced.
    val retainsPriorSchema: Boolean = prior.exists { p =>
      mappedPrior.nonEmpty ||
        (shape(p.schema) == shape(df.schema) &&
          p.partitionColumns == effParts)
    }
    prior.foreach(p => enforceInvariants(spark, df, p, deltaPath,
      enforceNotNull = !overwrite || retainsPriorSchema))

    // stage the data through a scratch dir, then adopt the parts
    // under stable names (never leave half-written files at paths the
    // log references); on a mapped table the staged parquet carries
    // PHYSICAL names and the partition dirs the physical keys the
    // log's partitionValues convention expects
    val (stageDf, stageParts) = mappedPrior match {
      case Some(p) =>
        val idMode = cmModeOf(p) == "id"
        (df.select(p.schema.fields.map { f =>
          if (idMode)
            col(f.name).as(physName(f), new MetadataBuilder()
              .putLong("parquet.field.id",
                f.metadata.getLong("delta.columnMapping.id")).build())
          else col(f.name).as(physName(f))
        }.toIndexedSeq: _*),
          effParts.map(c => physName(p.schema(c))))
      case None => (df, effParts)
    }
    val adopted = stageData(spark, stageDf, dst, stageParts, s"$v")

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    // the log's schemaString keeps ALL columns (partition cols
    // included) in the df's declared order; data files carry the rest
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (v == 0L) {
      // variant / timestamp_ntz columns demand their reader+writer
      // table features from birth — a (1,2) log serving them would
      // be protocol-invalid to real readers
      lines += readerWriterFeatureLine((1, 2, Nil, Nil),
        schemaTypeFeatures(df.schema)).getOrElse(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      lines += metaDataLine(tableId, df.schema.json, effParts, now)
    } else if (mergedSchema.isDefined) {
      // schema-evolving append: the widened schema lands in the SAME
      // commit as the data, configuration (constraints, properties)
      // carried verbatim; an identity-watermark advance composes by
      // replacing the affected fields inside the widened schema
      val base = mergedSchema.get
      val out = identitySchema match {
        case Some(is) =>
          val byName = is.fields.map(f => f.name -> f).toMap
          StructType(base.fields.map(f => byName.getOrElse(f.name, f)))
        case None => base
      }
      // a schema evolution INTRODUCING variant/ntz columns upgrades
      // the protocol in the same commit
      lines ++= readerWriterFeatureLine(prior.get.protocol,
        schemaTypeFeatures(out))
      lines += metaDataLine(tableId, out.json, effParts, now,
        prior.get.configuration)
    } else if (overwrite) {
      val p = prior.get
      // a schema-changing overwrite must never drop the table's
      // configuration (constraints, properties) on the floor; and a
      // SHAPE-equal overwrite keeps the prior metaData verbatim —
      // re-stamping the frame's bare schema would strip column
      // mapping / generation / comment metadata off the fields —
      // UNLESS an identity watermark advanced, which lands the prior
      // schema with only the watermark metadata updated
      if (mappedPrior.isEmpty &&
        (shape(p.schema) != shape(df.schema) ||
          p.partitionColumns != effParts)) {
        lines ++= readerWriterFeatureLine(p.protocol,
          schemaTypeFeatures(df.schema))
        lines += metaDataLine(tableId, df.schema.json, effParts, now,
          p.configuration)
      } else identitySchema.foreach(is =>
        lines += metaDataLine(tableId, is.json, effParts, now,
          p.configuration))
      // snapshot paths are absolute; the log stores table-relative —
      // normalize the scheme off both sides before stripping
      def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
      val root = deScheme(fs.makeQualified(dst).toString)
      p.files.foreach { f =>
        val rel = encodePath(deScheme(new Path(f.path).toString)
          .stripPrefix(root + "/"))
        lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
      }
    } else {
      // plain append: an identity-watermark advance lands the prior
      // schema (watermark metadata only) in the SAME commit as the
      // data — the atomicity concurrent allocators rely on
      identitySchema.foreach(is =>
        lines += metaDataLine(tableId, is.json, effParts, now,
          prior.get.configuration))
    }
    // ROW TRACKING: every add on a row-tracked table carries a fresh
    // contiguous baseRowId range from the high watermark, plus the
    // advanced watermark domain. The attempted version stamps
    // defaultRowCommitVersion; commitCas re-stamps it (and shifts the
    // ranges past a concurrent winner's watermark) on rebase.
    val rtEnabled = prior.exists(p => rowTrackingEnabled(p.configuration))
    val rtBases: Seq[Option[Long]] =
      if (!rtEnabled) adopted.map(_ => None)
      else {
        var nextId = rowIdHighWaterMark(prior.get) + 1
        adopted.map { case (_, _, _, st) =>
          val n = numRecordsOf(st).getOrElse(throw new IllegalStateException(
            "row tracking needs numRecords stats on staged files"))
          val b = nextId; nextId += n; Some(b)
        }
      }
    adopted.zip(rtBases).foreach { case ((rel, pv, sz, st), base) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      val rtPart = base.map(b =>
        s""","baseRowId":$b,"defaultRowCommitVersion":$v""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":true$statsPart$rtPart}}"""
    }
    if (rtEnabled && adopted.nonEmpty) {
      val hwmNew = rtBases.last.get +
        numRecordsOf(adopted.last._4).getOrElse(0L) - 1L
      lines += domainMetadataLine(RowTrackingDomain,
        s"""{"rowIdHighWaterMark":$hwmNew}""", removed = false)
    }
    // the txn action (appId, version) is the public Delta idempotence
    // marker: a streaming sink stamps (queryId, batchId) and skips any
    // batch at or below the table's replayed watermark on restart
    txn.foreach { case (appId, tv) =>
      lines += s"""{"txn":{"appId":${jsEscape(appId)},"version":$tv,"lastUpdated":$now}}"""
    }
    // an append reads nothing (rebases over data-only winners); an
    // overwrite of a non-empty table logically read every prior row
    val scope: ReadScope =
      if (overwrite && prior.nonEmpty) ReadTable else BlindAppend
    val op =
      if (txn.isDefined) "STREAMING UPDATE"
      else if (overwrite) "WRITE (overwrite)"
      else "WRITE"
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, scope,
      operation = op,
      ictHint = prior.map(p => ictOn(p.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      prior.map(_.configuration).getOrElse(Map.empty))
    maybeUniform(spark, deltaPath,
      prior.map(_.configuration).getOrElse(Map.empty))
    vc
  }

  /** Hive-style partition-dir escape — inverse of [[hiveUnescape]]
    * for the characters that would corrupt a path segment. */
  private[sources] def hiveEscape(s: String): String = {
    val bad = "\u0001%/:=\\#?*\"<>|"
    val b = new StringBuilder
    s.foreach { c =>
      if (c < ' ' || bad.indexOf(c) >= 0) b.append(f"%%${c.toInt}%02X")
      else b.append(c)
    }
    b.toString
  }

  /** `OPTIMIZE` (compaction, optionally Z-ORDER) — rewrite each
    * partition's data files into ~`targetFileBytes` outputs and
    * commit the swap as ONE `dataChange=false` version: readers at
    * the new version see identical rows in fewer, larger files
    * (small-file pressure is what kills a per-micro-batch streaming
    * sink's scan planning at scale); older versions still reference
    * the old files — nothing is deleted here, that is [[vacuum]]'s
    * explicit job. With `zorderBy` the rewritten rows are
    * multi-column Z-clustered ([[Layout.zorderBy]] — the reference's
    * `OPTIMIZE ... ZORDER BY`, gold_transformation.py:160) so file
    * min/max stats prune on ANY Z column. Partitions already at one
    * file are left alone unless Z-ordering was requested. Returns
    * the committed version, or the current version when there was
    * nothing to do (no empty commits). */
  def optimize(spark: SparkSession, deltaPath: String,
               targetFileBytes: Long = 128L << 20,
               zorderBy: Seq[String] = Nil,
               checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val snap = snapshot(spark, deltaPath)
    validateWritable(snap) // feature gate before any rewrite
    requireNotColumnMapped(snap, "OPTIMIZE")
    // a CLUSTERED table's declared columns apply when the caller
    // didn't name any — the liquid shape: OPTIMIZE maintains the
    // declared layout without per-job column lists
    val zBy = if (zorderBy.nonEmpty) zorderBy else clusteringColumns(snap)
    zBy.foreach { c =>
      require(snap.schema.fieldNames.contains(c), s"unknown Z-ORDER column $c")
      require(!snap.partitionColumns.contains(c),
        s"Z-ORDER column $c is a partition column — already file-separated")
    }
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    val groups = snap.files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
    // DV-bearing files ALWAYS rewrite (real OPTIMIZE's purge
    // semantics): compaction drops the covered rows physically and
    // clears the vectors, even for a partition holding a single file —
    // time travel keeps serving older versions through their DVs
    def hasDv(f: AddFile): Boolean = f.dv.exists(_.cardinality > 0L)
    val rewrite = groups.filter { case (_, fls) =>
      fls.size > 1 || zBy.nonEmpty || fls.exists(hasDv) }
    if (rewrite.isEmpty) return snap.version
    val v = snap.version + 1
    val now = System.currentTimeMillis()
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)

    val adds = scala.collection.mutable.ArrayBuffer[(String, Map[String, String], Long, Option[String])]()
    // ROW TRACKING preservation: compaction MATERIALIZES each row's
    // current row id / commit version into the physical columns named
    // by table configuration — rewritten rows keep their identity
    // (the spec's preserved row tracking; reads coalesce materialized
    // over baseRowId+index). The new files still get fresh baseRowIds
    // below, as every add must.
    val rtEnabled = rowTrackingEnabled(snap.configuration)
    rewrite.zipWithIndex.foreach { case ((pv, fls), gi) =>
      // existing deletion vectors APPLY during compaction — reading
      // raw parquet here would resurrect logically-deleted rows in
      // the rewritten files (and dataChange=false would hide it from
      // the change feed); the compacted files carry no DV
      val df =
        if (!rtEnabled) scanLive(spark, deltaPath, dataSchema, fls).drop("__path")
        else {
          import spark.implicits._
          val matId = snap.configuration.getOrElse(MatRowIdColKey,
            "_row-id-col-default")
          val matVer = snap.configuration.getOrElse(MatRowVerColKey,
            "_row-commit-version-col-default")
          val ext = StructType(dataSchema.fields ++ Seq(
            StructField(matId, LongType), StructField(matVer, LongType)))
          val baseDf = broadcast(fls.map(f =>
            (fileKeyOf(f.path),
              f.baseRowId.getOrElse(throw new IllegalStateException(
                s"row-tracked file without baseRowId: ${f.path}")),
              f.defaultRowCommitVersion.getOrElse(0L)))
            .toDF("__path", "__base", "__dcv"))
          scanLive(spark, deltaPath, ext, fls, keepRowIndex = true)
            .join(baseDf, Seq("__path"))
            .withColumn(matId, coalesce(col(matId), col("__base") + col("__ri")))
            .withColumn(matVer, coalesce(col(matVer), col("__dcv")))
            .drop("__path", "__ri", "__base", "__dcv")
        }
      val nFiles = math.max(1L,
        (fls.map(_.size).sum + targetFileBytes - 1) / targetFileBytes).toInt
      val out =
        if (zBy.nonEmpty) Layout.zorderBy(df, nFiles, zBy)
        else df.coalesce(nFiles)
      val uniq = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new Path(dst, s".tmp-opt-$v-$gi-${java.util.UUID.randomUUID()}")
      out.write.parquet(tmp.toString)
      val dirs = snap.partitionColumns.map(c =>
        s"${hiveEscape(c)}=${Option(pv.getOrElse(c, null))
          .map(hiveEscape).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
      val parts = fs.listStatus(tmp).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (st, i) =>
        val rel = (dirs :+ s"part-$v-$uniq-$gi-$i.parquet").mkString("/")
        val fin = new Path(dst, rel)
        fs.mkdirs(fin.getParent)
        if (!fs.rename(st.getPath, fin))
          throw new IllegalStateException(s"rename failed for $rel")
        adds += ((rel, pv, fs.getFileStatus(fin).getLen,
          footerStats(fsConf, fin)))
      }
      fs.delete(tmp, true)
    }

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    rewrite.foreach { case (_, fls) =>
      fls.foreach { f =>
        val rel = encodePath(deScheme(new Path(f.path).toString)
          .stripPrefix(root + "/"))
        lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":false}}"""
      }
    }
    val rtOptBases: Seq[Option[Long]] =
      if (!rtEnabled) adds.toSeq.map(_ => None)
      else {
        var nextId = rowIdHighWaterMark(snap) + 1
        adds.toSeq.map { case (_, _, _, st) =>
          val n = numRecordsOf(st).getOrElse(throw new IllegalStateException(
            "row tracking needs numRecords stats on compacted files"))
          val b = nextId; nextId += n; Some(b)
        }
      }
    adds.toSeq.zip(rtOptBases).foreach { case ((rel, pv, sz, st), base) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      val rtPart = base.map(b =>
        s""","baseRowId":$b,"defaultRowCommitVersion":$v""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":false$statsPart$rtPart}}"""
    }
    if (rtEnabled && adds.nonEmpty) {
      val hwmNew = rtOptBases.last.get +
        numRecordsOf(adds.last._4).getOrElse(0L) - 1L
      lines += domainMetadataLine(RowTrackingDomain,
        s"""{"rowIdHighWaterMark":$hwmNew}""", removed = false)
    }
    // compaction read exactly the files it removes — a concurrent
    // APPEND is disjoint, the commit rebases past it; a winner
    // touching the same files refuses
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadFiles,
      operation = "OPTIMIZE", ictHint = Some(ictOn(snap.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      snap.configuration)
    maybeUniform(spark, deltaPath, snap.configuration)
    vc
  }

  /** `VACUUM` — physically delete data files referenced by NONE of
    * the most recent `keepVersions` snapshots. This is the ONE
    * destructive operation in the module: time travel (and
    * [[changes]] delete-row reads) older than the horizon become a
    * LOUD missing-file read error afterward, exactly like Delta past
    * its retention window. The `_delta_log` itself is never touched;
    * staged `.tmp-*` scratch dirs are cleaned opportunistically.
    * Returns the deleted (or, with `dryRun`, would-be-deleted)
    * table-relative paths. */
  /** The `RETAIN n HOURS` retention mapping: how many trailing
    * versions were committed at or after `cutoffMs` (always ≥ 1 — the
    * latest version never reclaims). Commit times come from the log
    * files' modification times, the same clock [[history]] reports;
    * versions whose commit JSON was cleaned away (v2-checkpoint
    * aggressive cleanup) count as older than any cutoff. */
  def keepCountSince(spark: SparkSession, deltaPath: String,
                     cutoffMs: Long): Int = {
    val fs = new Path(deltaPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = listVersions(spark, deltaPath)
    math.max(1, vs.count { v =>
      scala.util.Try(fs.getFileStatus(
        new Path(logDir(deltaPath), pad20(v) + ".json"))
        .getModificationTime).getOrElse(0L) >= cutoffMs
    })
  }

  def vacuum(spark: SparkSession, deltaPath: String,
             keepVersions: Int = 1, dryRun: Boolean = false): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    // a MIRROR only adopted its data files — physical cleanup through
    // the view would delete the OWNING table's data out from under it
    snapshot(spark, deltaPath).configuration.get("graft.mirrorOf")
      .foreach { src =>
        throw new UnsupportedOperationException(
          s"$deltaPath is a zero-copy mirror of $src — vacuum the " +
            "owning table, never the mirror")
      }
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)
    val versions = listVersions(spark, deltaPath)
    val referenced: Set[String] = versions.takeRight(keepVersions)
      .flatMap(kv => snapshot(spark, deltaPath, versionAsOf = Some(kv)).files
        .map(f => deScheme(fs.makeQualified(new Path(f.path)).toString)))
      .toSet
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    // CHANGE-DATA files are referenced per-commit (`cdc` actions),
    // not by snapshots: keep those of the RETAINED versions (their
    // CDC reads must keep working — the same horizon as time travel),
    // reclaim the rest. Real Delta's vacuum covers cdc files the same
    // way once retention passes.
    val cdcReferenced: Set[String] = versions.takeRight(keepVersions)
      .flatMap { kv =>
        val p = new Path(logDir(deltaPath), pad20(kv) + ".json")
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val M = new com.fasterxml.jackson.databind.ObjectMapper()
        txt.split('\n').toSeq.filter(_.trim.nonEmpty).flatMap { line =>
          Option(M.readTree(line).get("cdc")).map(c =>
            deScheme(fs.makeQualified(new Path(dst,
              decodePath(c.get("path").asText()))).toString))
        }
      }.toSet
    val cdcDir = new Path(dst, "_change_data")
    // skip '.'/'_'-prefixed entries like the main walk: an in-flight
    // CDF DML stages through _change_data/.tmp-cdc-*/ — deleting its
    // parts mid-stage would abort the commit's rename
    def walkAll(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walkAll(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val cdcVictims =
      if (!fs.exists(cdcDir)) Seq.empty
      else walkAll(cdcDir).filterNot(p =>
        cdcReferenced(deScheme(fs.makeQualified(p).toString)))
    val victims = walk(dst).filterNot(p =>
      referenced(deScheme(fs.makeQualified(p).toString))) ++ cdcVictims
    if (!dryRun) victims.foreach(p => fs.delete(p, false))
    victims.map(p => deScheme(fs.makeQualified(p).toString)
      .stripPrefix(root + "/"))
  }

  /** Parse a Delta duration property value (`interval 30 days`,
    * `7 days`, `interval 2 weeks`, `48 hours`, …) to milliseconds. */
  private[graft] def parseRetention(s: String): Option[Long] = {
    val R = "(?i)\\s*(?:interval\\s+)?(\\d+)\\s*(millisecond|second|minute|hour|day|week)s?\\s*".r
    s match {
      case R(n, u) =>
        val unit = u.toLowerCase match {
          case "millisecond" => 1L
          case "second" => 1000L
          case "minute" => 60000L
          case "hour" => 3600000L
          case "day" => 86400000L
          case _ => 7L * 86400000L // week
        }
        Some(n.toLong * unit)
      case _ => None
    }
  }

  /** EXPIRED-LOG cleanup — the WRITER side of
    * `delta.logRetentionDuration` (real Delta's metadata cleanup;
    * default 30 days, auto-run after each checkpoint unless
    * `delta.enableExpiredLogCleanup` is `false`): DELETE the log
    * files that are BOTH (a) past retention by modification time and
    * (b) strictly below the newest complete checkpoint version —
    * commit JSONs, minor log-compaction files, version checksums and
    * superseded checkpoints. Replay never needs them again:
    * [[snapshot]] serves every retained version from that checkpoint
    * plus the newer commits (it already reads checkpoint-only logs),
    * while time travel and CDC into the reaped range refuse loudly —
    * the retention trade every production Delta table makes. This is
    * what stops a per-micro-batch streaming sink's `_delta_log` from
    * growing without bound on disk (minor compaction only kept it
    * cheap to REPLAY). V2-checkpoint sidecar parquet under
    * `_sidecars/` is shared across checkpoints and left to
    * orphan-file cleanup.
    *
    * `olderThanMs` overrides the retention cutoff (an explicit
    * timestamp); `configHint` passes an already-replayed table
    * configuration so the auto-run path never replays the log just
    * for the property. `dryRun` lists without deleting. Returns the
    * deleted (or would-be-deleted) file names. */
  def cleanupLog(spark: SparkSession, deltaPath: String,
                 olderThanMs: Option[Long] = None,
                 dryRun: Boolean = false,
                 configHint: Option[Map[String, String]] = None): Seq[String] = {
    val dir = logDir(deltaPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    // the replay floor: the newest COMPLETE checkpoint; without one
    // nothing below the head is reconstructible — clean nothing
    val cp = checkpointAt(spark, deltaPath, Long.MaxValue)
    if (cp.isEmpty) return Seq.empty
    val floor = cp.get.version
    val cutoff = olderThanMs.getOrElse {
      val cfg = configHint.getOrElse(snapshot(spark, deltaPath).configuration)
      val retention = cfg.get("delta.logRetentionDuration")
        .flatMap(parseRetention).getOrElse(30L * 86400000L)
      System.currentTimeMillis() - retention
    }
    val CommitRe = "(\\d{20})\\.json".r
    val CompactRe = "(\\d{20})\\.(\\d{20})\\.compacted\\.json".r
    val CrcRe = "(\\d{20})\\.crc".r
    val victims = fs.listStatus(dir).toSeq.filter { st =>
      val old = st.getModificationTime < cutoff
      st.getPath.getName match {
        case CommitRe(v) => old && v.toLong < floor
        case CompactRe(_, y) => old && y.toLong < floor
        case CrcRe(v) => old && v.toLong < floor
        case ClassicCpRe(v) => old && v.toLong < floor
        case MultiCpRe(v, _, _) => old && v.toLong < floor
        case V2CpRe(v, _, _) => old && v.toLong < floor
        case _ => false
      }
    }
    if (!dryRun) victims.foreach(st => fs.delete(st.getPath, false))
    victims.map(_.getPath.getName).sorted
  }

  /** `RESTORE TABLE … TO VERSION AS OF v` (or `TIMESTAMP AS OF`) —
    * roll the table's CURRENT state back to an earlier version as a
    * NEW commit, exactly like real Delta's RESTORE: history is never
    * rewritten (the bad versions stay time-travelable; an audit can
    * still see what happened), the restore itself is one more version
    * whose actions are the FILE-SET DIFF between the current and the
    * target snapshot — files the target had and the current dropped
    * are re-added (with their recorded partition values, stats and
    * deletion-vector descriptors), files the current added since are
    * removed, paths live in both but with a DIFFERENT DV state are
    * swapped remove+add so the target's row visibility wins. Pure
    * metadata: no data file is read, copied or rewritten — restoring
    * a 100 TB table costs one log commit. The target's schema,
    * partitioning and configuration come back too (a post-target
    * ADD COLUMNS / ADD CONSTRAINT is undone), but the PROTOCOL never
    * downgrades (readers keyed on the current protocol stay sound).
    * Files the target references that [[vacuum]] already deleted fail
    * the restore loudly BEFORE anything commits — never a snapshot
    * pointing at ghosts. Restoring to the current version is a no-op
    * (no empty commits). Returns the committed (or current) version. */
  def restore(spark: SparkSession, deltaPath: String,
              versionAsOf: Option[Long] = None,
              timestampAsOf: Option[Long] = None,
              checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(versionAsOf.nonEmpty || timestampAsOf.nonEmpty,
      "RESTORE needs a target: versionAsOf or timestampAsOf")
    val cur = snapshot(spark, deltaPath)
    validateWritable(cur, removesData = true) // RESTORE drops newer rows
    val tgt = snapshot(spark, deltaPath, versionAsOf, timestampAsOf)
    require(tgt.version <= cur.version,
      s"cannot restore $deltaPath forward to version ${tgt.version}")
    if (tgt.version == cur.version) return cur.version

    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)

    // vacuum may have physically removed files only the target
    // references — verify BEFORE committing a snapshot full of ghosts
    val missing = tgt.files.filterNot(f => fs.exists(new Path(f.path)))
    require(missing.isEmpty,
      s"cannot restore $deltaPath to version ${tgt.version}: " +
        s"${missing.size} data file(s) it references were vacuumed " +
        s"(first: ${missing.head.path}); restore an un-vacuumed version")

    val curByKey = cur.files.map(f => fileKeyOf(f.path) -> f).toMap
    val tgtByKey = tgt.files.map(f => fileKeyOf(f.path) -> f).toMap
    def dvOf(f: AddFile) = f.dv.filter(_.cardinality != 0L)
    // re-add: target-only paths, plus shared paths whose DV state
    // differs (the target's row visibility must win at replay)
    val readds = tgt.files.filter { f =>
      val k = fileKeyOf(f.path)
      !curByKey.contains(k) || dvOf(curByKey(k)) != dvOf(f)
    }
    val removes = cur.files.filter(f => !tgtByKey.contains(fileKeyOf(f.path)))
    val dvSwaps = tgt.files.filter { f =>
      val k = fileKeyOf(f.path)
      curByKey.contains(k) && dvOf(curByKey(k)) != dvOf(f)
    }

    val now = System.currentTimeMillis()
    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    def relOf(p: String): String =
      encodePath(deScheme(new Path(p).toString)
        .stripPrefix(root + "/"))

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (tgt.schema != cur.schema ||
      tgt.partitionColumns != cur.partitionColumns ||
      tgt.configuration != cur.configuration) {
      val tableId = java.util.UUID.nameUUIDFromBytes(
        deltaPath.getBytes("UTF-8")).toString
      lines += metaDataLine(tableId, tgt.schema.json, tgt.partitionColumns,
        now, tgt.configuration)
    }
    (removes ++ dvSwaps).foreach { f =>
      lines += s"""{"remove":{"path":${jsEscape(relOf(f.path))},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    readds.foreach { f =>
      // offset is serialized ONLY when the descriptor carries one —
      // inline ('i') DVs must omit it per PROTOCOL.md
      val dvPart = dvOf(f).map { d =>
        val offsetPart = d.offset.map(o => s""","offset":$o""").getOrElse("")
        s""","deletionVector":{"storageType":${jsEscape(d.storageType)},"pathOrInlineDv":${jsEscape(d.pathOrInlineDv)}$offsetPart,"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
      }.getOrElse("")
      val statsPart = f.stats.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(relOf(f.path))},"partitionValues":${pvJson(f.partitionValues)},"size":${f.size},"modificationTime":$now,"dataChange":true$dvPart$statsPart${rtCarry(f)}}}"""
    }
    if (lines.isEmpty) return cur.version // same file set + metadata
    val v = cur.version + 1
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = "RESTORE", ictHint = Some(ictOn(cur.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      tgt.configuration)
    maybeUniform(spark, deltaPath, tgt.configuration)
    vc
  }

  /** Row-level `DELETE FROM … WHERE predicate` as COPY-ON-WRITE, the
    * way real Delta executes it: only files that can contain matches
    * (by partition values + per-file stats, [[prunedFiles]]) are even
    * scanned; of those, only files with >= 1 ACTUAL matching row are
    * rewritten (one match-detection job over the candidate set);
    * every other file is untouched — at 100 TB a selective delete
    * rewrites a handful of files, not the table. The swap commits as
    * ONE dataChange=true version (remove old + add rewritten, stats
    * recomputed from the new footers), so time travel still reads the
    * deleted rows at older versions and [[changes]] surfaces the
    * delete+reinsert pair. Rows where the predicate is NULL survive
    * (SQL DELETE semantics). Returns the committed version — or the
    * current one when nothing matched (no empty commits). */
  def delete(spark: SparkSession, deltaPath: String,
             predicate: org.apache.spark.sql.Column,
             checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    // merge-on-read arm (opt-in, `spark.graft.dv.enabled=true`): a
    // SMALL delete commits a deletion-vector sidecar per matched file
    // instead of rewriting the files — modern Delta's default for
    // selective deletes. The cardinality gate
    // (`spark.graft.dv.maxDeleteRows`, default 50k) sends large
    // deletes to copy-on-write, where rewriting is the cheaper shape.
    val viaDv =
      if (spark.conf.getOption("spark.graft.dv.enabled").contains("true"))
        dvDelete(spark, deltaPath, predicate, checkpointInterval)
      else None
    viaDv.getOrElse(
      copyOnWrite(spark, deltaPath, predicate, checkpointInterval,
        cdcOf = Some((full, pred) => full
          .where(coalesce(pred, lit(false)))
          .withColumn("_change_type", lit("delete"))),
        opName = "DELETE") {
        (full, pred) => full.where(!coalesce(pred, lit(false)))
      })
  }

  /** The DV delete arm: record matched (file, row-index) positions as
    * deletion-vector sidecars, commit remove+add of the SAME paths
    * with the new descriptors (one version, no data rewritten).
    * Existing DVs merge (union of positions — never lost). Returns
    * None when the match count exceeds the gate (fall back to
    * copy-on-write), Some(version) otherwise. */
  private def dvDelete(spark: SparkSession, deltaPath: String,
                       predicate: org.apache.spark.sql.Column,
                       checkpointInterval: Int): Option[Long] =
    dvMutate(spark, deltaPath, predicate, checkpointInterval, None)

  /** Shared merge-on-read arm: mark matched positions deleted via DV
    * sidecars and, for UPDATE, append `makeAppend(matchedRows)` as
    * fresh files — ONE commit either way. */
  private def dvMutate(spark: SparkSession, deltaPath: String,
                       predicate: org.apache.spark.sql.Column,
                       checkpointInterval: Int,
                       makeAppend: Option[DataFrame => DataFrame]): Option[Long] = {
    import spark.implicits._
    val snap = snapshot(spark, deltaPath)
    validateWritable(snap, removesData = true)
    requireNotColumnMapped(snap, "row-level DML")
    // a UniForm Iceberg mirror cannot express deletion vectors —
    // route the DML to copy-on-write, which mirrors cleanly
    if (uniformEnabled(snap.configuration)) return None
    val candidates = prunedFiles(spark, snap, predicate)
    if (candidates.isEmpty) return Some(snap.version)
    val maxRows = spark.conf.getOption("spark.graft.dv.maxDeleteRows")
      .map(_.toLong).getOrElse(50000L)
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    val pc = snap.partitionColumns
    val base = scanLive(spark, deltaPath, dataSchema, candidates,
      keepRowIndex = true)
    val withPv =
      if (pc.isEmpty) base
      else {
        val pvDf = broadcast(candidates.map(f =>
          (fileKeyOf(f.path), pc.map(c => f.partitionValues.getOrElse(c, null))))
          .toDF("__path", "__pv"))
        base.join(pvDf, Seq("__path"), "left")
          .select(col("__path") +: col("__ri") +: snap.schema.map(f =>
            if (pc.contains(f.name))
              element_at(col("__pv"), pc.indexOf(f.name) + 1)
                .cast(f.dataType).as(f.name)
            else col(f.name)): _*)
      }
    // A plain DELETE with no change feed needs only the matched
    // POSITIONS: one bounded take (the gatedPositions pattern —
    // executeTake stays under the gate on the driver, cap+1 rows back
    // is the over-gate signal) instead of persist+count+collect.
    // UPDATE and CDF-enabled tables reuse the matched ROWS (post-image
    // transform, change legs), so they keep the persisted frame.
    val needFullRows = makeAppend.isDefined || cdfEnabled(snap)
    val (matchedFull: Option[DataFrame], matchedPos: Array[(String, Long)]) =
      if (!needFullRows) {
        val cap = math.min(maxRows, Int.MaxValue - 2L).toInt
        val pos = withPv.where(predicate).select(col("__path"), col("__ri"))
          .as[(String, Long)].take(cap + 1)
        if (pos.isEmpty) return Some(snap.version)
        if (pos.length > cap) return None
        (None, pos)
      } else {
        val mf = graft.Caches.tracked(withPv.where(predicate))
        val matchedCount = mf.count()
        if (matchedCount == 0) { mf.unpersist(); return Some(snap.version) }
        if (matchedCount > maxRows) { mf.unpersist(); return None }
        (Some(mf), mf.select(col("__path"), col("__ri"))
          .as[(String, Long)].collect())
      }

    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)
    val byFile: Map[String, Seq[Long]] = matchedPos.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val v = snap.version + 1
    val now = System.currentTimeMillis()

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    // UPDATE: the transformed matched rows land as fresh files in the
    // table's layout (same hive staging as write/merge)
    val appendAdds: Seq[(String, Map[String, String], Long, Option[String])] =
      makeAppend.map { mk =>
        val rows = mk(matchedFull.get)
          .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
        // the transformed post-image must satisfy CHECK + NOT NULL
        // like every other writer — veto before the DV files land
        enforceInvariants(spark, rows, snap, deltaPath,
          enforceNotNull = true)
        stageData(spark, rows, dst, snap.partitionColumns, s"dvu-$v")
      }.getOrElse(Seq.empty)
    // CDF legs: the DV arm knows the matched rows exactly — a delete
    // streams them as `delete`, an update as pre/postimage
    val cdcLinesOut: Seq[String] =
      if (!cdfEnabled(snap)) Seq.empty
      else {
        val body = matchedFull.get.drop("__path", "__ri")
        val legs = makeAppend match {
          case None => body.withColumn("_change_type", lit("delete"))
          case Some(mk) =>
            body.withColumn("_change_type", lit("update_preimage"))
              .unionByName(mk(matchedFull.get)
                .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
                .withColumn("_change_type", lit("update_postimage")))
        }
        stageCdcLines(spark, deltaPath, snap, legs, v)
      }
    matchedFull.foreach(_.unpersist())

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    // deletionVectors is a table FEATURE: per PROTOCOL.md a reader at
    // (1,2) may ignore the descriptor and resurrect deleted rows —
    // upgrade to (3,7) with the feature lists (merging any features
    // the table already declared) in the SAME commit
    val (mrv, mwv, rf, wf) = snap.protocol
    if (mrv < 3 || !rf.contains("deletionVectors")) {
      // upgrading a LEGACY protocol to table features must ENUMERATE
      // every feature the prior minReader/minWriter versions implied
      val (legacyRf, legacyWf) = legacyImpliedFeatures(mrv, mwv)
      val rfOut = (rf ++ legacyRf :+ "deletionVectors").distinct.sorted
      val wfOut = (wf ++ legacyWf :+ "deletionVectors").distinct.sorted
      lines += s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":${rfOut.map(jsEscape).mkString("[", ",", "]")},"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}"""
    }
    candidates.filter(f => byFile.contains(fileKeyOf(f.path))).foreach { f =>
      val existing: Seq[Long] = f.dv.filter(_.cardinality != 0L)
        .map(d => DeletionVectors.deletedRows(
          DeletionVectors.loadData(fsConf, deltaPath, d)).toSeq)
        .getOrElse(Seq.empty)
      val merged = (existing ++ byFile(fileKeyOf(f.path))).distinct.sorted
      val desc = DeletionVectors.writeDvFile(fsConf, deltaPath, merged)
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      val dvJson = s""""deletionVector":{"storageType":${jsEscape(desc.storageType)},"pathOrInlineDv":${jsEscape(desc.pathOrInlineDv)},"offset":${desc.offset.getOrElse(1)},"sizeInBytes":${desc.sizeInBytes},"cardinality":${desc.cardinality}}"""
      val statsPart = f.stats.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
      lines += s"""{"add":{"path":${jsEscape(rel)},"partitionValues":${pvJson(f.partitionValues)},"size":${f.size},"modificationTime":$now,"dataChange":true,$dvJson$statsPart${rtCarry(f)}}}"""
    }
    val (rtParts, rtDomain) = rtFresh(snap, appendAdds.map(_._4), v)
    appendAdds.zip(rtParts).foreach { case ((rel, pv, sz, st), rtPart) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":true$statsPart$rtPart}}"""
    }
    lines ++= rtDomain
    lines ++= cdcLinesOut
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = if (makeAppend.isDefined) "UPDATE" else "DELETE",
      ictHint = Some(ictOn(snap.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      snap.configuration)
    Some(vc)
  }

  /** Row-level `UPDATE … SET assignments WHERE predicate`, copy-on-
    * write like [[delete]]: matched files are rewritten with matching
    * rows transformed and everything else byte-identical in content.
    * Assignments on PARTITION columns are refused (rows would have to
    * move directories — split that into delete + append). */
  def update(spark: SparkSession, deltaPath: String,
             predicate: org.apache.spark.sql.Column,
             assignments: Map[String, org.apache.spark.sql.Column],
             checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(assignments.nonEmpty, "UPDATE with no assignments")
    val snap0 = snapshot(spark, deltaPath)
    requireNotColumnMapped(snap0, "UPDATE")
    assignments.keys.foreach { c =>
      require(snap0.schema.fieldNames.contains(c), s"unknown column $c")
      require(!snap0.partitionColumns.contains(c),
        s"UPDATE on partition column $c would move rows across " +
          "partition directories — delete + append instead")
      require(!snap0.schema(c).metadata.contains(GenerationExprKey),
        s"cannot UPDATE generated column $c — it is always computed " +
          s"AS (${snap0.schema(c).metadata.getString(GenerationExprKey)})")
    }
    // generated columns RECOMPUTE from the post-assignment row (real
    // Delta's behavior when an update touches their inputs) — a
    // second projection after the assignments, identity on rows
    // whose inputs did not change
    val genRecompute: DataFrame => DataFrame = { d =>
      if (!snap0.schema.fields.exists(_.metadata.contains(GenerationExprKey)))
        d
      else d.select(snap0.schema.fields.map { f =>
        if (f.metadata.contains(GenerationExprKey))
          expr(f.metadata.getString(GenerationExprKey))
            .cast(f.dataType).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    }
    // merge-on-read arm (same opt-in + gate as [[delete]]): matched
    // rows become DV positions, their TRANSFORMED copies append as
    // fresh files — one commit, no file rewritten
    val viaDv =
      if (spark.conf.getOption("spark.graft.dv.enabled").contains("true"))
        dvMutate(spark, deltaPath, predicate, checkpointInterval,
          Some { matched =>
            // ONE projection over the ORIGINAL columns (simultaneous
            // SQL UPDATE semantics; every matched row transforms)
            genRecompute(matched.select(snap0.schema.fieldNames.map { c =>
              assignments.get(c)
                .map(_.cast(snap0.schema(c).dataType).as(c))
                .getOrElse(col(c))
            }.toSeq: _*))
          })
      else None
    // CDF legs: the matched rows before (update_preimage) and after
    // (update_postimage) the simultaneous projection
    val cdcOf = Some { (full: DataFrame, pred: org.apache.spark.sql.Column) =>
      val pre = full.where(coalesce(pred, lit(false)))
      val post = genRecompute(pre.select(snap0.schema.fieldNames.map { c =>
        assignments.get(c)
          .map(_.cast(snap0.schema(c).dataType).as(c))
          .getOrElse(col(c))
      }.toSeq: _*))
      pre.withColumn("_change_type", lit("update_preimage"))
        .unionByName(post.withColumn("_change_type", lit("update_postimage")))
    }
    viaDv.getOrElse(
      copyOnWrite(spark, deltaPath, predicate, checkpointInterval, cdcOf,
        validatePostImage = true, opName = "UPDATE") {
        (full, pred) => {
          // ONE projection over the ORIGINAL columns — SQL UPDATE
          // semantics are simultaneous (SET a = b, b = a swaps; a
          // sequential withColumn chain would turn it into a copy)
          val hit = coalesce(pred, lit(false))
          genRecompute(full.select(snap0.schema.fieldNames.map { c =>
            assignments.get(c) match {
              case Some(v) => when(hit, v.cast(snap0.schema(c).dataType))
                .otherwise(col(c)).as(c)
              case None => col(c)
            }
          }.toSeq: _*))
        }
      })
  }

  /** `MERGE INTO` (upsert): for each source row, the target row with
    * the same `keyCols` is REPLACED (whole-row update); source rows
    * with no match INSERT — last-writer-wins keyed upsert, the
    * SCD-1 / replica-apply shape the reference's silver layer needs.
    * Copy-on-write like [[delete]]: one match-detection job finds the
    * target files holding source keys, only those rewrite (matched
    * rows dropped), and the whole source lands as fresh hive-staged
    * files — removes + both add sets commit as ONE version. The
    * source must be unique per key (counted gate, loud error —
    * ambiguous multi-matches never half-apply), and its schema must
    * match the table's. Returns the committed version (current when
    * the source is empty). */
  def merge(spark: SparkSession, deltaPath: String, source: DataFrame,
            keyCols: Seq[String],
            checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    import spark.implicits._
    require(keyCols.nonEmpty, "MERGE with no key columns")
    val snap = snapshot(spark, deltaPath)
    validateWritable(snap, removesData = true)
    requireNotColumnMapped(snap, "MERGE")
    keyCols.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"unknown merge key $c"))
    def normType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, normType(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(normType(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(normType(m.keyType), normType(m.valueType), valueContainsNull = true)
      case other => other
    }
    require(StructType(snap.schema.fields.map(f =>
      StructField(f.name, normType(f.dataType)))) ==
      StructType(source.schema.fields.map(f =>
        StructField(f.name, normType(f.dataType)))) ||
      snap.schema.fieldNames.toSet == source.columns.toSet,
      s"merge source schema ${source.schema.simpleString} does not match " +
        s"table schema ${snap.schema.simpleString}")
    val src = graft.Caches.tracked(
      source.select(snap.schema.fieldNames.map(col): _*))
    // ambiguity gate: one source row per key, or the merge is
    // order-dependent — refuse rather than half-apply. ONE action
    // serves emptiness + the gate (SourceGate).
    val (nSrc, maxKeyMult) = SourceGate(src, keyCols)
    if (nSrc == 0L) return snap.version
    require(maxKeyMult <= 1L,
      "merge source has duplicate keys — aggregate it first")
    // CHECK constraints + NOT NULL bind every writer: the source rows
    // ARE the commit's new rows (replacements + inserts) — a
    // violating merge vetoes whole before anything stages
    enforceInvariants(spark, src, snap, deltaPath, enforceNotNull = true)
    val srcKeys = src.select(keyCols.map(col): _*)

    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    def fileKey(p: String) = deScheme(
      org.apache.spark.paths.SparkPath.fromPathString(p).urlEncoded)
    val pc = snap.partitionColumns

    // ONE match-detection job: which target files hold a source key
    val matched: Set[String] =
      if (snap.files.isEmpty) Set.empty
      else {
        // existing DVs applied: a merge-on-read-deleted row is not
        // a live key and must not trigger a file rewrite
        val base = scanLive(spark, deltaPath, dataSchema, snap.files)
        val withPv =
          if (pc.isEmpty) base
          else {
            val pvDf = broadcast(snap.files.map(f =>
              (fileKey(f.path), pc.map(c => f.partitionValues.getOrElse(c, null))))
              .toDF("__path", "__pv"))
            base.join(pvDf, Seq("__path"), "left")
              .select(col("__path") +: snap.schema.map(f =>
                if (pc.contains(f.name))
                  element_at(col("__pv"), pc.indexOf(f.name) + 1)
                    .cast(f.dataType).as(f.name)
                else col(f.name)): _*)
          }
        withPv.join(srcKeys, keyCols, "left_semi")
          .select("__path").distinct().as[String].collect().toSet
      }
    val toRewrite = snap.files.filter(f => matched(fileKey(f.path)))

    val v = snap.version + 1
    val now = System.currentTimeMillis()
    val root = deScheme(fs.makeQualified(dst).toString)
    val adds = scala.collection.mutable.ArrayBuffer[(String, Map[String, String], Long, Option[String])]()
    // rewrite matched files with the matched keys dropped
    toRewrite.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .zipWithIndex.foreach { case ((pv, fls), gi) =>
        val grp = scanLive(spark, deltaPath, dataSchema, fls).drop("__path")
        val full = grp.select(snap.schema.map(f =>
          if (pc.contains(f.name))
            lit(pv.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
          else col(f.name)): _*)
        val survivors = full.join(srcKeys, keyCols, "left_anti")
          .select(dataSchema.fieldNames.map(col): _*)
        val uniq = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(dst, s".tmp-mrg-$v-$gi-${java.util.UUID.randomUUID()}")
        survivors.write.parquet(tmp.toString)
        val dirs = pc.map(c =>
          s"${hiveEscape(c)}=${Option(pv.getOrElse(c, null))
            .map(hiveEscape).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
        val parts = fs.listStatus(tmp).toSeq
          .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
        parts.zipWithIndex.foreach { case (st, i) =>
          val stats = footerStats(fsConf, st.getPath)
          if (!stats.exists(_.contains("\"numRecords\":0"))) {
            val rel = (dirs :+ s"part-mrg-$v-$uniq-$gi-$i.parquet").mkString("/")
            val fin = new Path(dst, rel)
            fs.mkdirs(fin.getParent)
            if (!fs.rename(st.getPath, fin))
              throw new IllegalStateException(s"rename failed for $rel")
            adds += ((rel, pv, fs.getFileStatus(fin).getLen, stats))
          }
        }
        fs.delete(tmp, true)
      }
    // the whole source (updates + inserts) lands as fresh files in
    // the table's layout
    adds ++= stageData(spark, src, dst, pc, s"mrg-$v")

    // CDF legs: matched target rows (update_preimage), the matching
    // source rows replacing them (update_postimage), unmatched source
    // rows (insert) — `_change_data` files in the SAME commit
    val cdcLinesOut: Seq[String] =
      if (!cdfEnabled(snap)) Seq.empty
      else {
        // the matched-target frame is cached: three legs (preimage,
        // the postimage/insert key split) derive from it — never
        // re-scan the rewritten files per leg
        val pre: Option[DataFrame] =
          if (toRewrite.isEmpty) None
          else {
            val grp = scanLive(spark, deltaPath, dataSchema, toRewrite)
            val full =
              if (pc.isEmpty) grp.drop("__path")
              else {
                val pvDf = broadcast(toRewrite.map(f =>
                  (fileKey(f.path),
                    pc.map(c => f.partitionValues.getOrElse(c, null))))
                  .toDF("__path", "__pv"))
                grp.join(pvDf, Seq("__path"), "left")
                  .select(snap.schema.map(f =>
                    if (pc.contains(f.name))
                      element_at(col("__pv"), pc.indexOf(f.name) + 1)
                        .cast(f.dataType).as(f.name)
                    else col(f.name)): _*)
              }
            Some(graft.Caches.tracked(
              full.join(srcKeys, keyCols, "left_semi")))
          }
        def matchedKeys = pre.get.select(keyCols.map(col): _*).distinct()
        val legs = Seq(
          pre.map(_.withColumn("_change_type", lit("update_preimage"))),
          pre.map(_ => src.join(matchedKeys, keyCols, "left_semi")
            .withColumn("_change_type", lit("update_postimage"))),
          Some(pre.map(_ => src.join(matchedKeys, keyCols, "left_anti"))
            .getOrElse(src).withColumn("_change_type", lit("insert")))).flatten
        val lines = stageCdcLines(spark, deltaPath, snap,
          legs.reduce(_.unionByName(_)), v)
        pre.foreach(_.unpersist())
        lines
      }

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    toRewrite.foreach { f =>
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    val (rtParts, rtDomain) = rtFresh(snap, adds.toSeq.map(_._4), v)
    adds.toSeq.zip(rtParts).foreach { case ((rel, pv, sz, st), rtPart) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":true$statsPart$rtPart}}"""
    }
    lines ++= rtDomain
    lines ++= cdcLinesOut
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = "MERGE", ictHint = Some(ictOn(snap.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      snap.configuration)
    maybeUniform(spark, deltaPath, snap.configuration)
    vc
  }

  /** GENERALIZED MERGE — the flexible SQL shapes (`WHEN MATCHED [AND
    * cond] THEN UPDATE SET c = expr` with PARTIAL assignments over
    * target+source, `WHEN MATCHED [AND cond] THEN DELETE`, conditional
    * `WHEN NOT MATCHED THEN INSERT *`) as ONE copy-on-write commit.
    * [[merge]] stays the fast keyed-upsert path; this arm joins target
    * and source on the keys, applies the matched clause to the
    * AFFECTED rows only — identified by exact physical position
    * (`__path`,`__ri`), so a matched row whose condition is false
    * survives unchanged even when its file rewrites — then rewrites
    * exactly the files holding affected rows and appends post-images
    * + inserts. `WHEN NOT MATCHED BY SOURCE [AND cond] THEN
    * UPDATE/DELETE` acts on target rows with NO source match (target
    * columns only). CDF-enabled tables record delete /
    * update_preimage+update_postimage / insert cdc rows in the SAME
    * commit. Expression resolution contract: [[MergeSpec]]. */
  def mergeFlexible(spark: SparkSession, deltaPath: String,
                    source: DataFrame, keyCols: Seq[String],
                    matched: Seq[MergeSpec.Matched],
                    notMatched: Seq[MergeSpec.NotMatched],
                    bySource: Seq[MergeSpec.NotMatchedBySource] = Seq.empty,
                    checkpointInterval: Int = DefaultCheckpointInterval,
                    extraOn: Option[org.apache.spark.sql.Column] = None): Long = {
    import spark.implicits._
    import MergeSpec.SrcPrefix
    require(keyCols.nonEmpty, "MERGE with no key columns")
    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "MERGE with no clauses")
    val snap = snapshot(spark, deltaPath)
    validateWritable(snap, removesData = true)
    requireNotColumnMapped(snap, "MERGE")
    keyCols.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"unknown merge key $c"))
    keyCols.foreach(c => require(source.columns.contains(c),
      s"merge source lacks key column $c"))
    (matched.map(_.assignments) ++ bySource.map(_.assignments))
      .foreach(_.foreach { case (n, _) =>
        require(snap.schema.fieldNames.contains(n),
          s"unknown assignment column $n")
        require(!snap.schema(n).metadata.contains(GenerationExprKey),
          s"cannot UPDATE generated column $n — it is always computed " +
            s"AS (${snap.schema(n).metadata.getString(GenerationExprKey)})")
      })
    // INSERT * clauses need every target column in the source;
    // expression-insert clauses provide their own values but must
    // cover every column
    if (notMatched.exists(_.assignments.isEmpty))
      snap.schema.fieldNames.foreach(c => require(source.columns.contains(c),
        s"WHEN NOT MATCHED THEN INSERT needs source column $c"))
    notMatched.filter(_.assignments.nonEmpty).foreach(nm =>
      snap.schema.fieldNames.foreach(c =>
        require(nm.assignments.exists(_._1 == c),
          s"WHEN NOT MATCHED THEN INSERT must cover column $c")))
    val src = graft.Caches.tracked(source)
    // a BY SOURCE clause acts on UNMATCHED target rows, so an empty
    // source is not a no-op when it is present. ONE action serves
    // emptiness + the key-ambiguity gate (SourceGate).
    val (nSrc, maxKeyMult) = SourceGate(src, keyCols)
    if (nSrc == 0L && bySource.isEmpty) { src.unpersist(); return snap.version }
    require(maxKeyMult <= 1L,
      "merge source has duplicate keys — aggregate it first")
    val pc = snap.partitionColumns
    val dataSchema = StructType(snap.schema.filterNot(f => pc.contains(f.name)))
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)

    // target live rows (DVs applied) with partition values, __path
    // and the physical row index — the exact row identity the
    // affected-row bookkeeping keys on
    val target: DataFrame =
      if (snap.files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(StructField("__path", StringType) +:
            StructField("__ri", LongType) +: snap.schema.fields))
      else {
        val base = scanLive(spark, deltaPath, dataSchema, snap.files,
          keepRowIndex = true)
        if (pc.isEmpty) base
        else {
          val pvDf = broadcast(snap.files.map(f =>
            (fileKeyOf(f.path), pc.map(c => f.partitionValues.getOrElse(c, null))))
            .toDF("__path", "__pv"))
          base.join(pvDf, Seq("__path"), "left")
            .select(col("__path") +: col("__ri") +: snap.schema.map(f =>
              if (pc.contains(f.name))
                element_at(col("__pv"), pc.indexOf(f.name) + 1)
                  .cast(f.dataType).as(f.name)
              else col(f.name)): _*)
        }
      }
    val srcRen = src.select(src.columns.toSeq.map(c =>
      col(c).as(SrcPrefix + c)): _*)
    // NON-EQUI residual ON conjuncts ride the equality join — a row
    // pair is "matched" only under the FULL ON condition
    val joinCond = extraOn.foldLeft(
      keyCols.map(k => col(k) === col(SrcPrefix + k)).reduce(_ && _))(_ && _)
    // ordered clauses, first-match-wins (standard SQL MERGE)
    val mc = Option(matched).filter(_.nonEmpty).map(MergeSpec.ofMatched)
    val bsc = Option(bySource).filter(_.nonEmpty).map(MergeSpec.ofBySource)
    val affected = graft.Caches.tracked(mc match {
      case Some(c) => target.join(srcRen, joinCond, "inner").where(c.any)
      case None => target.join(srcRen, joinCond, "inner").limit(0)
    })
    // BY SOURCE: target rows with NO source match under the FULL ON,
    // clause condition applied over target columns alone
    val srcKeysDf = src.select(keyCols.map(col): _*).distinct()
    val bsAffected: Option[DataFrame] = bsc.map(c =>
      graft.Caches.tracked((extraOn match {
        case None => target.join(srcKeysDf, keyCols, "left_anti")
        case Some(_) => target.join(srcRen, joinCond, "left_anti")
      }).where(c.any)))
    val tableCols = snap.schema.fieldNames.toSeq
    val matchedFilePaths: Set[String] =
      if (snap.files.isEmpty) Set.empty
      else ((if (mc.isDefined)
        affected.select("__path").distinct().as[String].collect().toSet
      else Set.empty[String]) ++
        bsAffected.map(_.select("__path").distinct().as[String]
          .collect().toSet).getOrElse(Set.empty))
    val toRewrite = snap.files.filter(f => matchedFilePaths(fileKeyOf(f.path)))

    // GENERATED columns RECOMPUTE from the post-assignment row (real
    // Delta's behavior when an update touches their inputs) — the
    // same projection [[update]] applies
    val genRecompute: DataFrame => DataFrame = { d =>
      if (!snap.schema.fields.exists(_.metadata.contains(GenerationExprKey)))
        d
      else d.select(snap.schema.fields.map { f =>
        if (f.metadata.contains(GenerationExprKey))
          expr(f.metadata.getString(GenerationExprKey))
            .cast(f.dataType).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    }
    val updatedRows: Option[DataFrame] = mc.filter(_.hasUpdate).map { c =>
      genRecompute(affected.where(!c.isDelete).select(tableCols.map(n =>
        c.value(n, col(n)).cast(snap.schema(n).dataType).as(n)): _*))
    }
    val bsUpdatedRows: Option[DataFrame] =
      bsc.filter(_.hasUpdate).zip(bsAffected).map { case (c, bsa) =>
        genRecompute(bsa.where(!c.isDelete).select(tableCols.map(n =>
          c.value(n, col(n)).cast(snap.schema(n).dataType).as(n)): _*))
      }
    val insertRows: Option[DataFrame] =
      Option(notMatched).filter(_.nonEmpty).map { ns =>
        val c = MergeSpec.ofNotMatched(ns)
        // "not matched" = no target row satisfying the FULL ON
        val unmatchedSrc = extraOn match {
          case None => src.join(
            target.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
          case Some(_) => srcRen.join(target, joinCond, "left_anti")
            .select(src.columns.toSeq.map(cn =>
              col(SrcPrefix + cn).as(cn)): _*)
        }
        unmatchedSrc
          .where(c.any)
          .select(tableCols.map(n =>
            c.value(n, col(n)).cast(snap.schema(n).dataType).as(n)): _*)
      }
    val appendFrame: Option[DataFrame] =
      (updatedRows.toSeq ++ bsUpdatedRows.toSeq ++ insertRows.toSeq)
        .reduceOption(_.unionByName(_))
    // the new rows are this commit's writes: CHECK + NOT NULL veto
    // whole before anything stages
    appendFrame.foreach(af =>
      enforceInvariants(spark, af, snap, deltaPath, enforceNotNull = true))

    if (toRewrite.isEmpty && appendFrame.forall(_.isEmpty)) {
      affected.unpersist(); bsAffected.foreach(_.unpersist())
      src.unpersist(); return snap.version
    }

    val v = snap.version + 1
    val now = System.currentTimeMillis()
    val adds = scala.collection.mutable.ArrayBuffer[(String, Map[String, String], Long, Option[String])]()
    // rewrite affected files dropping exactly the AFFECTED ROWS (by
    // physical position) — condition-false matches survive in content
    val affectedRowIds = bsAffected
      .map(b => affected.select("__path", "__ri")
        .unionByName(b.select("__path", "__ri")))
      .getOrElse(affected.select("__path", "__ri"))
    toRewrite.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .zipWithIndex.foreach { case ((pv, fls), gi) =>
        val grp = scanLive(spark, deltaPath, dataSchema, fls,
          keepRowIndex = true)
        val survivors = grp.join(affectedRowIds, Seq("__path", "__ri"),
          "left_anti")
          .select(dataSchema.fieldNames.map(col): _*)
        val uniq = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(dst, s".tmp-mrgf-$v-$gi-${java.util.UUID.randomUUID()}")
        survivors.write.parquet(tmp.toString)
        val dirs = pc.map(c =>
          s"${hiveEscape(c)}=${Option(pv.getOrElse(c, null))
            .map(hiveEscape).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
        val parts = fs.listStatus(tmp).toSeq
          .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
        parts.zipWithIndex.foreach { case (st, i) =>
          val stats = footerStats(fsConf, st.getPath)
          if (!stats.exists(_.contains("\"numRecords\":0"))) {
            val rel = (dirs :+ s"part-mrgf-$v-$uniq-$gi-$i.parquet").mkString("/")
            val fin = new Path(dst, rel)
            fs.mkdirs(fin.getParent)
            if (!fs.rename(st.getPath, fin))
              throw new IllegalStateException(s"rename failed for $rel")
            adds += ((rel, pv, fs.getFileStatus(fin).getLen, stats))
          }
        }
        fs.delete(tmp, true)
      }
    appendFrame.foreach(af => adds ++= stageData(spark, af, dst, pc, s"mrgf-$v"))

    // CDF legs: the matched clause's pre-images (delete or
    // update_preimage), post-images, and inserts — same commit
    val cdcLinesOut: Seq[String] =
      if (!cdfEnabled(snap)) Seq.empty
      else {
        // pre-images split by the row's FIRST-TRUE clause action:
        // delete-clause rows record `delete`, update-clause rows
        // `update_preimage` (+ their post-image leg)
        def pre(frame: DataFrame, c: MergeSpec.OrderedClauses): Seq[DataFrame] = {
          val tgt = (f: DataFrame) => f.select(tableCols.map(col): _*)
          Seq(
            Option.when(c.hasDelete)(tgt(frame.where(c.isDelete))
              .withColumn("_change_type", lit("delete"))),
            Option.when(c.hasUpdate)(tgt(frame.where(!c.isDelete))
              .withColumn("_change_type", lit("update_preimage")))
          ).flatten
        }
        val legs =
          mc.toSeq.flatMap(pre(affected, _)) ++
          updatedRows.map(
            _.withColumn("_change_type", lit("update_postimage"))) ++
          bsc.zip(bsAffected).toSeq.flatMap { case (c, bsa) => pre(bsa, c) } ++
          bsUpdatedRows.map(
            _.withColumn("_change_type", lit("update_postimage"))) ++
          insertRows.map(_.withColumn("_change_type", lit("insert")))
        legs.reduceOption(_.unionByName(_))
          .map(l => stageCdcLines(spark, deltaPath, snap, l, v))
          .getOrElse(Seq.empty)
      }

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    toRewrite.foreach { f =>
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    val (rtParts, rtDomain) = rtFresh(snap, adds.toSeq.map(_._4), v)
    adds.toSeq.zip(rtParts).foreach { case ((rel, pv, sz, st), rtPart) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":true$statsPart$rtPart}}"""
    }
    lines ++= rtDomain
    lines ++= cdcLinesOut
    affected.unpersist(); bsAffected.foreach(_.unpersist()); src.unpersist()
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = "MERGE", ictHint = Some(ictOn(snap.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      snap.configuration)
    maybeUniform(spark, deltaPath, snap.configuration)
    vc
  }

  /** Shared copy-on-write core: locate files with actual matches,
    * rewrite them through `transform` (applied with the predicate over
    * the FULL schema — partition values attached as typed literals),
    * commit remove+add as one version. When the table declares
    * `delta.enableChangeDataFeed` and the caller supplies `cdcOf`
    * (the row-level change frame: full schema + `_change_type`), the
    * SAME commit also carries `cdc` actions over `_change_data/`
    * files — the precise CDF legs [[changes]] then serves instead of
    * the whole-file reconstruction. */
  private def copyOnWrite(spark: SparkSession, deltaPath: String,
                          predicate: org.apache.spark.sql.Column,
                          checkpointInterval: Int,
                          cdcOf: Option[(DataFrame, org.apache.spark.sql.Column) => DataFrame] = None,
                          validatePostImage: Boolean = false,
                          opName: String = "DML")
                         (transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    import spark.implicits._
    val snap = snapshot(spark, deltaPath)
    validateWritable(snap, removesData = true)
    requireNotColumnMapped(snap, "row-level DML")
    val candidates = prunedFiles(spark, snap, predicate)
    if (candidates.isEmpty) return snap.version
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    def fileKey(p: String) = deScheme(
      org.apache.spark.paths.SparkPath.fromPathString(p).urlEncoded)

    // ONE match-detection job over all candidate files: which files
    // hold at least one matching row (existing DVs applied — a row
    // already deleted merge-on-read must neither match nor resurrect)
    val pc = snap.partitionColumns
    val base = scanLive(spark, deltaPath, dataSchema, candidates)
    val withPv =
      if (pc.isEmpty) base
      else {
        val pvDf = broadcast(candidates.map(f =>
          (fileKey(f.path), pc.map(c => f.partitionValues.getOrElse(c, null))))
          .toDF("__path", "__pv"))
        val joined = base.join(pvDf, Seq("__path"), "left")
        joined.select(col("__path") +: snap.schema.map(f =>
          if (pc.contains(f.name))
            element_at(col("__pv"), pc.indexOf(f.name) + 1)
              .cast(f.dataType).as(f.name)
          else col(f.name)): _*)
      }
    val matched = withPv.where(predicate)
      .select("__path").distinct().as[String].collect().toSet
    if (matched.isEmpty) return snap.version
    val toRewrite = candidates.filter(f => matched(fileKey(f.path)))

    // CHECK constraints + NOT NULL bind EVERY writer, not just the
    // append path: validate the POST-IMAGE of the rewrite before
    // anything stages (a violating UPDATE vetoes whole — exactly the
    // write()-path guarantee). DELETEs skip it — their post-image is
    // a subset of rows the constraints already hold on.
    if (validatePostImage)
      enforceInvariants(spark,
        transform(withPv.where(col("__path").isin(matched.toSeq: _*))
          .drop("__path"), predicate)
          .select(snap.schema.fieldNames.map(col): _*),
        snap, deltaPath, enforceNotNull = true)

    // rewrite per partition group (pv is a constant inside a group,
    // attached as typed literals so the predicate sees the full row)
    val v = snap.version + 1
    val now = System.currentTimeMillis()
    val root = deScheme(fs.makeQualified(dst).toString)
    val adds = scala.collection.mutable.ArrayBuffer[(String, Map[String, String], Long, Option[String])]()
    val cdcFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val wantCdc = cdcOf.isDefined && cdfEnabled(snap)
    toRewrite.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .zipWithIndex.foreach { case ((pv, fls), gi) =>
        val grp = scanLive(spark, deltaPath, dataSchema, fls).drop("__path")
        val full = grp.select(snap.schema.map(f =>
          if (pc.contains(f.name))
            lit(pv.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
          else col(f.name)): _*)
        if (wantCdc) cdcFrames += cdcOf.get(full, predicate)
        val out = transform(full, predicate)
          .select(dataSchema.fieldNames.map(col): _*)
        val uniq = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(dst, s".tmp-cow-$v-$gi-${java.util.UUID.randomUUID()}")
        out.write.parquet(tmp.toString)
        val dirs = pc.map(c =>
          s"${hiveEscape(c)}=${Option(pv.getOrElse(c, null))
            .map(hiveEscape).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
        val parts = fs.listStatus(tmp).toSeq
          .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
        parts.zipWithIndex.foreach { case (st, i) =>
          // an empty survivor part (all rows of the group deleted)
          // stays un-adopted: a pure remove, no 0-row add files —
          // emptiness comes from the footer (no scan job)
          val stats = footerStats(fsConf, st.getPath)
          val isEmpty = stats.exists(_.contains("\"numRecords\":0"))
          if (!isEmpty) {
            val rel = (dirs :+ s"part-$v-$uniq-$gi-$i.parquet").mkString("/")
            val fin = new Path(dst, rel)
            fs.mkdirs(fin.getParent)
            if (!fs.rename(st.getPath, fin))
              throw new IllegalStateException(s"rename failed for $rel")
            adds += ((rel, pv, fs.getFileStatus(fin).getLen, stats))
          }
        }
        fs.delete(tmp, true)
      }

    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    toRewrite.foreach { f =>
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    val (rtParts, rtDomain) = rtFresh(snap, adds.toSeq.map(_._4), v)
    adds.toSeq.zip(rtParts).foreach { case ((rel, pv, sz, st), rtPart) =>
      val statsPart = st.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(encodePath(rel))},"partitionValues":${pvJson(pv)},"size":$sz,"modificationTime":$now,"dataChange":true$statsPart$rtPart}}"""
    }
    lines ++= rtDomain
    if (wantCdc && cdcFrames.nonEmpty)
      lines ++= stageCdcLines(spark, deltaPath, snap,
        cdcFrames.reduce(_.unionByName(_)), v)
    val vc = commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = opName, ictHint = Some(ictOn(snap.configuration)))
    maybeCheckpoint(spark, deltaPath, vc, checkpointInterval,
      snap.configuration)
    maybeUniform(spark, deltaPath, snap.configuration)
    vc
  }

  /** `ALTER TABLE … ADD COLUMNS` — commit a metaData-only version
    * declaring the widened schema. No data files change: existing
    * files read the new columns as null via parquet schema-on-read,
    * older versions still read with THEIR metaData (time travel
    * unaffected), and appends are now gated on the widened schema.
    * Returns the committed version. */
  def addColumns(spark: SparkSession, deltaPath: String,
                 newFields: Seq[StructField]): Long = {
    require(newFields.nonEmpty, "ADD COLUMNS with no columns")
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    newFields.foreach(f => require(!prior.schema.fieldNames.contains(f.name),
      s"column ${f.name} already exists in ${prior.schema.simpleString}"))
    // on a name-mode column-mapped table, EVERY field must carry a
    // column id + physicalName — a mapping-less field would be
    // protocol-invalid metadata real readers reject. Fresh ids go
    // past maxColumnId (never reused), and the watermark advances in
    // the same commit.
    require(!prior.configuration
      .get("delta.columnMapping.mode").contains("id"),
      s"ADD COLUMNS on id-mode column-mapped $deltaPath is not " +
        "supported — id mode is read-only in graft")
    val mapped = prior.configuration
      .get("delta.columnMapping.mode").contains("name")
    val (addedFields, newConf) =
      if (!mapped) (newFields, prior.configuration)
      else {
        var maxId = prior.configuration
          .get("delta.columnMapping.maxColumnId").map(_.toLong)
          .getOrElse(prior.schema.fields.length.toLong)
        val withMeta = newFields.map { f =>
          maxId += 1
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(ColIdKey, maxId)
            .putString(PhysNameKey, f.name).build())
        }
        (withMeta, prior.configuration +
          ("delta.columnMapping.maxColumnId" -> maxId.toString))
      }
    val widened = StructType(prior.schema.fields ++ addedFields)
    val fs = new Path(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v = prior.version + 1
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    val line = metaDataLine(tableId, widened.json, prior.partitionColumns,
      System.currentTimeMillis(), newConf)
    // a variant/ntz column addition upgrades the protocol in the
    // same commit; schema widening reads no data — rebases over
    // data-only winners
    val lines = readerWriterFeatureLine(prior.protocol,
      schemaTypeFeatures(StructType(addedFields))).toSeq :+ line
    commitCas(spark, deltaPath, v, lines, BlindAppend,
      operation = "ADD COLUMNS")
  }

  /** `ALTER TABLE … ADD CONSTRAINT <name> CHECK (<expr>)` —
    * PROTOCOL.md "CHECK Constraints": the predicate lives in table
    * configuration as `delta.constraints.<name>` and binds every
    * writer. EXISTING rows are validated first (one scan; a violation
    * vetoes the ALTER with the offending row count), then a
    * metaData-only version commits the constraint together with the
    * protocol bump real writers key on — minWriterVersion 3, or the
    * `checkConstraints` writer feature when the table is already on
    * (3,7). Every subsequent graft write re-validates the incoming
    * frame ([[write]]'s invariant gate); NULL results pass, per the
    * protocol. */
  def addCheckConstraint(spark: SparkSession, deltaPath: String,
                         name: String, exprSql: String): Long = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"constraint name '$name' must be an identifier")
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val key = s"delta.constraints.${name.toLowerCase(java.util.Locale.ROOT)}"
    require(!prior.configuration.contains(key),
      s"constraint $name already exists on $deltaPath " +
        s"(${prior.configuration(key)})")
    val bad = read(spark, deltaPath)
      .where(!coalesce(expr(exprSql), lit(true))).count()
    require(bad == 0L,
      s"cannot add CHECK constraint $name ($exprSql) to $deltaPath: " +
        s"$bad existing rows violate it")
    // the validation scan read the whole table — a concurrent
    // dataChange append may violate the constraint, so it conflicts
    commitConfigChange(spark, deltaPath, prior,
      prior.configuration + (key -> exprSql),
      featureUpgrade = Some((3, "checkConstraints")), scope = ReadTable,
      op = "ADD CONSTRAINT")
  }

  /** `ALTER TABLE … DROP CONSTRAINT <name>` — metaData-only commit
    * removing the `delta.constraints.<name>` entry. */
  def dropCheckConstraint(spark: SparkSession, deltaPath: String,
                          name: String): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val key = s"delta.constraints.${name.toLowerCase(java.util.Locale.ROOT)}"
    require(prior.configuration.contains(key),
      s"no constraint $name on $deltaPath")
    commitConfigChange(spark, deltaPath, prior,
      prior.configuration - key, featureUpgrade = None)
  }

  /** `ALTER TABLE … SET TBLPROPERTIES (k = v, …)` — a metaData-only
    * commit merging `props` into the table configuration. Enabling
    * `delta.enableChangeDataFeed` carries the protocol bump real
    * writers key on (minWriterVersion 4, or the `changeDataFeed`
    * writer feature on (3,7) tables) — from that commit on, every
    * graft DML writes `_change_data` files ([[changes]] then serves
    * the precise row-level feed). `delta.constraints.*` keys must go
    * through [[addCheckConstraint]] (they are validated there). */
  def setTableProperties(spark: SparkSession, deltaPath: String,
                         props: Map[String, String]): Long = {
    require(props.nonEmpty, "no properties to set")
    props.keys.foreach(k => require(!k.startsWith("delta.constraints."),
      s"set $k through ALTER TABLE … ADD CONSTRAINT — constraints are " +
        "validated against existing rows there"))
    // the column-mapping UPGRADE rides on this property, like real
    // Delta: mode=name assigns ids + physical names + the protocol
    // bump in one commit; id mode stays read-only (graft writes no
    // field-id parquet on the Delta path yet); downgrades refuse
    // ROW TRACKING enablement backfills baseRowIds for every live
    // file — its own commit shape ([[enableRowTracking]])
    props.get("delta.enableRowTracking").foreach { flag =>
      if (flag.trim.equalsIgnoreCase("true")) {
        require(props.size == 1,
          "set delta.enableRowTracking in its own ALTER — enablement " +
            "re-adds every live file with its assigned baseRowId")
        return enableRowTracking(spark, deltaPath)
      }
    }
    props.get("delta.columnMapping.mode").foreach { mode =>
      require(props.size == 1,
        "set delta.columnMapping.mode in its own ALTER — the upgrade " +
          "commits a schema rewrite, not a plain property merge")
      val prior0 = snapshot(spark, deltaPath)
      val cur = prior0.configuration
        .getOrElse("delta.columnMapping.mode", "none")
      mode.trim match {
        case "name" if cur == "none" =>
          return enableColumnMapping(spark, deltaPath)
        case m if m == cur => return listVersions(spark, deltaPath).last
        case "id" => throw new UnsupportedOperationException(
          "id-mode column mapping is read-only in graft — upgrade to " +
            "'name' mode instead")
        case other => throw new UnsupportedOperationException(
          s"cannot change column mapping mode $cur -> $other")
      }
    }
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val newConf = prior.configuration ++ props
    // UniForm enable-time compatibility: the in-place Iceberg mirror
    // refuses partitioned/DV-bearing/column-mapped sources — check
    // BEFORE the property commits, not at the first post-commit mirror
    if (uniformEnabled(newConf) && !uniformEnabled(prior.configuration)) {
      require(prior.partitionColumns.isEmpty,
        s"cannot enable UniForm on partitioned $deltaPath — the Iceberg " +
          "mirror adopts hive-layout files whose partition columns are " +
          "not in the parquet")
      require(prior.files.forall(_.dv.forall(_.cardinality == 0L)),
        s"cannot enable UniForm on $deltaPath while deletion vectors " +
          "are outstanding — OPTIMIZE first (applies the DVs)")
      require(!isColumnMapped(prior.schema) &&
        prior.configuration.getOrElse("delta.columnMapping.mode", "none")
          == "none",
        s"cannot enable UniForm on column-mapped $deltaPath")
    }
    val enablingCdf = props.get("delta.enableChangeDataFeed")
      .exists(_.trim.equalsIgnoreCase("true")) && !cdfEnabled(prior)
    // checkpoint policy v2 is a READER feature — modern checkpoints
    // are unreadable to pre-feature readers, so the protocol must say
    // so in the same commit
    props.get("delta.checkpointPolicy").foreach { p =>
      require(p.trim == "classic" || p.trim == "v2",
        s"unknown delta.checkpointPolicy '$p' (classic / v2)")
    }
    props.get("delta.checkpointInterval").foreach { p =>
      require(p.trim.toIntOption.exists(_ > 0),
        s"delta.checkpointInterval must be a positive integer, got '$p'")
    }
    val enablingV2Cp = props.get("delta.checkpointPolicy")
      .exists(_.trim == "v2") &&
      !prior.configuration.get("delta.checkpointPolicy").contains("v2")
    require(!(enablingCdf && enablingV2Cp),
      "enable delta.enableChangeDataFeed and delta.checkpointPolicy in " +
        "separate ALTERs — each carries its own protocol upgrade")
    // enabling in-commit timestamps carries the writer feature; the
    // enablement version/timestamp properties are stamped by
    // [[commitCas]] at the version the commit actually lands at
    val enablingIct = props.get("delta.enableInCommitTimestamps")
      .exists(_.trim.equalsIgnoreCase("true")) &&
      !prior.configuration.get("delta.enableInCommitTimestamps")
        .exists(_.trim.equalsIgnoreCase("true"))
    val v = commitConfigChange(spark, deltaPath, prior, newConf,
      featureUpgrade = if (enablingCdf) Some((4, "changeDataFeed")) else None,
      readerWriterFeature = if (enablingV2Cp) Some("v2Checkpoint") else None,
      writerOnlyFeature = if (enablingIct) Some("inCommitTimestamp") else None)
    // enabling UniForm publishes the initial mirror right away
    maybeUniform(spark, deltaPath, newConf)
    v
  }

  /** `ALTER TABLE … UNSET TBLPROPERTIES (k, …)` — drop configuration
    * keys (missing keys are a no-op, like Spark's IF EXISTS). */
  def unsetTableProperties(spark: SparkSession, deltaPath: String,
                           keys: Seq[String]): Long = {
    require(keys.nonEmpty, "no properties to unset")
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    commitConfigChange(spark, deltaPath, prior,
      prior.configuration -- keys, featureUpgrade = None)
  }

  // ---------------- domain metadata (PROTOCOL.md §Domain Metadata) --

  private[sources] def domainMetadataLine(domain: String, conf: String,
                                          removed: Boolean): String =
    s"""{"domainMetadata":{"domain":${jsEscape(domain)},"configuration":${jsEscape(conf)},"removed":$removed}}"""

  /** Protocol line upgrading to the WRITER-ONLY table features
    * `features`, or None when the table already declares them all.
    * Forces minWriterVersion 7 (enumerating legacy-implied writer
    * features so external writers keep honoring them); the reader
    * version and reader features are untouched — writer features
    * never gate reads. */
  private def writerFeatureLine(protocol: Protocol,
                                features: Seq[String]): Option[String] = {
    val (mrv, mwv, rf, wf) = protocol
    if (mwv >= 7 && features.forall(wf.contains)) None
    else {
      val (_, legacyWf) = legacyImpliedFeatures(mrv, mwv)
      val wfOut = (wf ++ legacyWf ++ features).distinct.sorted
      val rfJson =
        if (mrv >= 3) s""","readerFeatures":${rf.map(jsEscape).mkString("[", ",", "]")}"""
        else ""
      Some(s"""{"protocol":{"minReaderVersion":$mrv,"minWriterVersion":7$rfJson,"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}""")
    }
  }

  /** `ALTER TABLE … ALTER COLUMN c SET DEFAULT <sql>` / `DROP
    * DEFAULT` — PROTOCOL.md "Column Defaults" (writer table feature
    * `allowColumnDefaults`): the default lands in the column's
    * schema metadata (`CURRENT_DEFAULT`, what delta-spark persists),
    * SET upgrades the protocol to the feature in the same commit,
    * and every later append that OMITS the column writes the
    * default's value ([[write]]'s fill). Reads are untouched —
    * unlike Iceberg's `initial-default`, Delta defaults apply at
    * WRITE time only. Generated/identity columns refuse (they own
    * their values). */
  def setColumnDefault(spark: SparkSession, deltaPath: String,
                       column: String, default: Option[String]): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val f = prior.schema.fields.find(_.name.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"no column $column on $deltaPath"))
    require(!f.metadata.contains(GenerationExprKey),
      s"column ${f.name} is GENERATED — it owns its values")
    require(!f.metadata.contains(IdentityStartKey),
      s"column ${f.name} is IDENTITY — it owns its values")
    val newSchema = StructType(prior.schema.fields.map { fl =>
      if (!fl.name.equalsIgnoreCase(column)) fl
      else {
        val mb = new MetadataBuilder().withMetadata(fl.metadata)
        default match {
          case Some(d) => mb.putString(ColumnDefaultKey, d)
          case None => mb.remove(ColumnDefaultKey)
        }
        fl.copy(metadata = mb.build())
      }
    })
    val protoLine =
      if (default.isEmpty) None
      else writerFeatureLine(prior.protocol, Seq("allowColumnDefaults"))
    commitMetaChange(spark, deltaPath, newSchema, prior.partitionColumns,
      prior.configuration, protoLine,
      op = if (default.isDefined) "ALTER COLUMN SET DEFAULT"
      else "ALTER COLUMN DROP DEFAULT")
  }

  /** `ALTER TABLE … ALTER COLUMN c TYPE <wider>` — PROTOCOL.md "Type
    * Widening" (reader+writer feature `typeWidening`): the table
    * schema's type widens along the sanctioned promotion matrix, the
    * change is recorded in the column's `delta.typeChanges` metadata,
    * and EXISTING data files keep their narrow physical type — reads
    * up-cast per file (Spark's parquet reader serves every sanctioned
    * promotion natively; [[validateTypeWidening]] keeps foreign logs
    * honest). A metaData-only commit: no data moves. */
  def widenColumnType(spark: SparkSession, deltaPath: String,
                      column: String, to: DataType): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val f = prior.schema.fields.find(_.name.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"no column $column on $deltaPath"))
    require(f.dataType != to,
      s"column $column is already ${to.simpleString}")
    if (!widenOk(f.dataType, to))
      throw new UnsupportedOperationException(
        s"typeWidening: ${f.dataType.simpleString} -> " +
          s"${to.simpleString} on $column is not a sanctioned " +
          "promotion (byte/short/int/long chains, float->double, " +
          "date->timestamp_ntz, integer->double, integer/long->" +
          "decimal, decimal precision(+scale) growth)")
    require(!prior.partitionColumns.contains(f.name),
      s"cannot widen partition column ${f.name} — partition values " +
        "bind to the narrow type in the log")
    require(!f.metadata.contains(GenerationExprKey),
      s"column ${f.name} is GENERATED — its expression owns the type")
    require(!f.metadata.contains(IdentityStartKey),
      s"column ${f.name} is IDENTITY — identity columns stay long")
    val hist =
      if (f.metadata.contains("delta.typeChanges"))
        f.metadata.getMetadataArray("delta.typeChanges")
      else Array.empty[Metadata]
    val entry = new MetadataBuilder()
      .putString("fromType", f.dataType.typeName)
      .putString("toType", to.typeName).build()
    val newField = f.copy(dataType = to,
      metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putMetadataArray("delta.typeChanges", hist :+ entry).build())
    val newSchema = StructType(prior.schema.fields.map(fl =>
      if (fl.name.equalsIgnoreCase(column)) newField else fl))
    // reader+WRITER feature: force (3,7), enumerate legacy-implied
    // features, declare typeWidening in BOTH lists
    val protoLine =
      readerWriterFeatureLine(prior.protocol, Seq("typeWidening"))
    commitMetaChange(spark, deltaPath, newSchema, prior.partitionColumns,
      prior.configuration + ("delta.enableTypeWidening" -> "true"),
      protoLine, op = "CHANGE COLUMN")
  }

  /** Commit a `domainMetadata` action setting `configuration` (a
    * JSON string by convention) for `domain`, upgrading the protocol
    * to the `domainMetadata` writer feature when needed. Replay keeps
    * the latest action per domain ([[Snapshot.domains]]); concurrent
    * writers touching the SAME domain conflict in [[commitCas]]
    * (different domains rebase freely). System domains the engine
    * owns (`delta.clustering`, `delta.rowTracking`) go through their
    * dedicated DDL — guard against silent foot-guns. */
  def setDomainMetadata(spark: SparkSession, deltaPath: String,
                        domain: String, configuration: String): Long = {
    require(domain.nonEmpty, "empty domain name")
    require(!domain.startsWith("delta."),
      s"domain '$domain' is system-owned — delta.* domains are " +
        "maintained by their owning DDL (CLUSTER BY, row tracking)")
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    val lines = writerFeatureLine(prior.protocol, Seq("domainMetadata")).toSeq :+
      domainMetadataLine(domain, configuration, removed = false)
    val v = commitCas(spark, deltaPath,
      prior.version + 1, lines,
      scope = BlindAppend, operation = "SET DOMAIN METADATA",
      ictHint = Some(ictOn(prior.configuration)))
    maybeCheckpoint(spark, deltaPath, v, DefaultCheckpointInterval,
      prior.configuration)
    v
  }

  // ---------------- clustered tables (CLUSTER BY) ----------------

  /** The system domain real clustered Delta tables record their
    * clustering columns under. */
  val ClusteringDomain = "delta.clustering"

  /** The table's declared clustering columns (empty when not a
    * clustered table). Parsed from the `delta.clustering` domain's
    * `{"clusteringColumns":[["c1"],["c2"]]}` shape (arrays of name
    * parts — nested paths join with '.'). */
  def clusteringColumns(snap: Snapshot): Seq[String] =
    snap.domains.get(ClusteringDomain).toSeq.flatMap { cfg =>
      val M = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = Option(M.readTree(cfg).get("clusteringColumns"))
      import scala.jdk.CollectionConverters._
      node.toSeq.flatMap(_.elements().asScala.map(col =>
        col.elements().asScala.map(_.asText()).mkString(".")))
    }

  /** `ALTER TABLE … CLUSTER BY (c1, c2)` — declare (or change) the
    * table's clustering columns; `CLUSTER BY NONE` = empty `cols`.
    * The liquid-clustering shape: clustering is DECLARATIVE metadata
    * (the `delta.clustering` domain + the `clustering` and
    * `domainMetadata` writer features), and [[optimize]] applies it —
    * an OPTIMIZE with no explicit zorderBy Z-clusters on the declared
    * columns, so layout maintenance needs no per-job column lists.
    * Clustered tables are unpartitioned by definition (clustering
    * replaces hive partitioning as the layout strategy). */
  def setClusterBy(spark: SparkSession, deltaPath: String,
                   cols: Seq[String]): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    if (cols.isEmpty) {
      // CLUSTER BY NONE on a non-clustered table is a no-op
      if (!prior.domains.contains(ClusteringDomain))
        return listVersions(spark, deltaPath).last
      return commitCas(spark, deltaPath,
        prior.version + 1,
        Seq(domainMetadataLine(ClusteringDomain, "", removed = true)),
        scope = BlindAppend, operation = "CLUSTER BY NONE",
        ictHint = Some(ictOn(prior.configuration)))
    }
    require(cols.size <= 4,
      s"at most 4 clustering columns (got ${cols.size}) — past that, " +
        "Z-interleaving dilutes per-column locality until no column prunes")
    cols.foreach { c =>
      require(prior.schema.fieldNames.contains(c),
        s"unknown clustering column $c")
      require(!prior.partitionColumns.contains(c),
        s"clustering column $c is a partition column")
    }
    require(prior.partitionColumns.isEmpty,
      s"cannot CLUSTER BY a hive-partitioned table ($deltaPath) — " +
        "clustering replaces directory partitioning as the layout strategy")
    val cfg = cols.map(c => s"[${jsEscape(c)}]")
      .mkString("""{"clusteringColumns":[""", ",", "]}")
    val lines = writerFeatureLine(prior.protocol,
      Seq("domainMetadata", "clustering")).toSeq :+
      domainMetadataLine(ClusteringDomain, cfg, removed = false)
    val v = commitCas(spark, deltaPath,
      prior.version + 1, lines,
      scope = BlindAppend, operation = "CLUSTER BY",
      ictHint = Some(ictOn(prior.configuration)))
    maybeCheckpoint(spark, deltaPath, v, DefaultCheckpointInterval,
      prior.configuration)
    v
  }

  // ---------------- row tracking (PROTOCOL.md §Row Tracking) -------

  /** System domain carrying `{"rowIdHighWaterMark": N}`. */
  val RowTrackingDomain = "delta.rowTracking"
  private[sources] val MatRowIdColKey =
    "delta.rowTracking.materializedRowIdColumnName"
  private[sources] val MatRowVerColKey =
    "delta.rowTracking.materializedRowCommitVersionColumnName"

  private[sources] def rowTrackingEnabled(conf: Map[String, String]): Boolean =
    conf.get("delta.enableRowTracking").exists(_.trim.equalsIgnoreCase("true"))

  /** Highest row id ever assigned on the table (-1 before any). */
  def rowIdHighWaterMark(snap: Snapshot): Long =
    snap.domains.get(RowTrackingDomain).map { cfg =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(cfg).get("rowIdHighWaterMark").asLong()
    }.getOrElse(-1L)

  private def numRecordsOf(stats: Option[String]): Option[Long] =
    stats.flatMap { j =>
      try Option(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(j).get("numRecords")).map(_.asLong())
      catch { case _: Exception => None }
    }

  /** `,baseRowId:…,defaultRowCommitVersion:…` carried VERBATIM from an
    * existing [[AddFile]] — for re-adds whose rows did not move (DV
    * commits, restores, clones): their ids must not move either. */
  private def rtCarry(f: AddFile): String =
    f.baseRowId.map(b =>
      s""","baseRowId":$b,"defaultRowCommitVersion":${f.defaultRowCommitVersion.getOrElse(0L)}""")
      .getOrElse("")

  /** Fresh contiguous row-id suffixes for a batch of new files (one
    * per stats entry, sized by its numRecords), plus the advanced
    * high-watermark domain line. `("", …, None)` when the table is
    * not row-tracked — callers splice unconditionally. */
  private def rtFresh(snap: Snapshot, statsList: Seq[Option[String]],
                      v: Long): (Seq[String], Option[String]) =
    if (!rowTrackingEnabled(snap.configuration) || statsList.isEmpty)
      (statsList.map(_ => ""), None)
    else {
      var next = rowIdHighWaterMark(snap) + 1
      val parts = statsList.map { st =>
        val n = numRecordsOf(st).getOrElse(throw new IllegalStateException(
          "row tracking needs numRecords stats on rewritten files"))
        val p = s""","baseRowId":$next,"defaultRowCommitVersion":$v"""
        next += n; p
      }
      (parts, Some(domainMetadataLine(RowTrackingDomain,
        s"""{"rowIdHighWaterMark":${next - 1}}""", removed = false)))
    }

  /** Enable ROW TRACKING on an existing table — one commit carrying:
    * the `rowTracking` + `domainMetadata` writer features, the
    * property + the materialized-column names in metaData, a RE-ADD
    * of every live file with its assigned `baseRowId` and
    * `defaultRowCommitVersion` (dataChange=false — the backfill real
    * Delta performs at enablement), and the row-id high watermark
    * domain. From this commit on every writer assigns fresh row ids;
    * [[readWithRowIds]] serves them. Scope is ReadTable: the backfill
    * enumerated the file list, so a concurrent append must refuse
    * (its files would silently miss baseRowIds). */
  def enableRowTracking(spark: SparkSession, deltaPath: String): Long = {
    val prior = snapshot(spark, deltaPath)
    if (rowTrackingEnabled(prior.configuration))
      return listVersions(spark, deltaPath).last
    requireNotColumnMapped(prior, "row tracking enablement")
    val counts: Seq[(AddFile, Long)] = prior.files.map { f =>
      val n = numRecordsOf(f.stats).getOrElse(throw new IllegalStateException(
        s"row tracking needs per-file numRecords stats; ${f.path} has none"))
      (f, n)
    }
    val fs = new Path(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(new Path(deltaPath)).toString)
    val now = System.currentTimeMillis()
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val newConf = prior.configuration +
      ("delta.enableRowTracking" -> "true") +
      (MatRowIdColKey -> s"_row-id-col-$suffix") +
      (MatRowVerColKey -> s"_row-commit-version-col-$suffix")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines ++= writerFeatureLine(prior.protocol,
      Seq("rowTracking", "domainMetadata"))
    lines += metaDataLine(tableId, prior.schema.json,
      prior.partitionColumns, now, newConf)
    var next = rowIdHighWaterMark(prior) + 1
    val attemptV = prior.version + 1
    def pvJson(pv: Map[String, String]): String =
      pv.toSeq.sortBy(_._1).map { case (k, vv) =>
        s"${jsEscape(k)}:${if (vv == null) "null" else jsEscape(vv)}"
      }.mkString("{", ",", "}")
    counts.foreach { case (f, n) =>
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      val statsPart = f.stats.map(j => s""","stats":${jsEscape(j)}""").getOrElse("")
      val dvPart = f.dv.map(d =>
        s""","deletionVector":{"storageType":${jsEscape(d.storageType)},"pathOrInlineDv":${jsEscape(d.pathOrInlineDv)}${d.offset.map(o => s""","offset":$o""").getOrElse("")},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}""").getOrElse("")
      lines += s"""{"add":{"path":${jsEscape(rel)},"partitionValues":${pvJson(f.partitionValues)},"size":${f.size},"modificationTime":${f.modificationTime},"dataChange":false$statsPart$dvPart,"baseRowId":$next,"defaultRowCommitVersion":$attemptV}}"""
      next += n
    }
    lines += domainMetadataLine(RowTrackingDomain,
      s"""{"rowIdHighWaterMark":${next - 1}}""", removed = false)
    val v = commitCas(spark, deltaPath,
      attemptV, lines.toSeq,
      scope = ReadTable, operation = "ENABLE ROW TRACKING")
    maybeCheckpoint(spark, deltaPath, v, DefaultCheckpointInterval, newConf)
    v
  }

  /** Read a row-tracked table WITH its row lineage: every table
    * column plus `_row_id` and `_row_commit_version`. Fresh values
    * come from the file's `baseRowId + row_index` /
    * `defaultRowCommitVersion`; rows REWRITTEN by [[optimize]] keep
    * their original values through the materialized columns (written
    * physically into the compacted parquet under the names in table
    * configuration, preferred via coalesce — the spec's resolution
    * order). Deletion vectors apply before row ids attach, so a
    * DV-deleted row never surfaces a row id. */
  def readWithRowIds(spark: SparkSession, tablePath: String,
                     versionAsOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val snap = snapshot(spark, tablePath, versionAsOf)
    require(rowTrackingEnabled(snap.configuration),
      s"row tracking is not enabled on $tablePath")
    requireNotColumnMapped(snap, "readWithRowIds")
    // tables enabled by an external writer may lack the names —
    // fall back to stable defaults (files never carry them, so reads
    // coalesce straight to baseRowId + index)
    val matId = snap.configuration.getOrElse(MatRowIdColKey,
      "_row-id-col-default")
    val matVer = snap.configuration.getOrElse(MatRowVerColKey,
      "_row-commit-version-col-default")
    val dataSchema = StructType(snap.schema.filterNot(
      f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(snap.schema.fields ++ Seq(
          StructField("_row_id", LongType),
          StructField("_row_commit_version", LongType))))
    // files written before a compaction lack the materialized
    // columns — parquet schema-on-read serves them as null there
    val extSchema = StructType(dataSchema.fields ++ Seq(
      StructField(matId, LongType), StructField(matVer, LongType)))
    val scanned = scanLive(spark, tablePath, extSchema, snap.files,
      keepRowIndex = true)
    val baseDf = broadcast(snap.files.map { f =>
      (fileKeyOf(f.path),
        f.baseRowId.getOrElse(throw new IllegalStateException(
          s"row-tracked table has a file without baseRowId: ${f.path}")),
        f.defaultRowCommitVersion.getOrElse(0L),
        snap.partitionColumns.map(c => f.partitionValues.getOrElse(c, null)))
    }.toDF("__path", "__base", "__dcv", "__pv"))
    val joined = scanned.join(baseDf, Seq("__path"))
    val partCols = snap.partitionColumns.zipWithIndex.map { case (c, i) =>
      element_at(col("__pv"), i + 1).cast(snap.schema(c).dataType).as(c)
    }
    val cols = snap.schema.map(f =>
      if (snap.partitionColumns.contains(f.name))
        partCols(snap.partitionColumns.indexOf(f.name))
      else col(f.name)) ++ Seq(
      coalesce(col(matId), col("__base") + col("__ri")).as("_row_id"),
      coalesce(col(matVer), col("__dcv")).as("_row_commit_version"))
    joined.select(cols: _*)
  }

  /** Tombstone a domain (removed=true) — replay then drops it from
    * [[Snapshot.domains]]; checkpoints drop the tombstone entirely. */
  def removeDomainMetadata(spark: SparkSession, deltaPath: String,
                           domain: String): Long = {
    val prior = snapshot(spark, deltaPath)
    require(prior.domains.contains(domain),
      s"no domain '$domain' on $deltaPath (live: ${prior.domains.keys.toSeq.sorted.mkString(", ")})")
    require(!domain.startsWith("delta."),
      s"domain '$domain' is system-owned")
    val v = commitCas(spark, deltaPath,
      prior.version + 1,
      Seq(domainMetadataLine(domain, "", removed = true)),
      scope = BlindAppend, operation = "REMOVE DOMAIN METADATA",
      ictHint = Some(ictOn(prior.configuration)))
    maybeCheckpoint(spark, deltaPath, v, DefaultCheckpointInterval,
      prior.configuration)
    v
  }

  private val ColIdKey = "delta.columnMapping.id"

  /** Upgrade a table to NAME-mode column mapping — what real Delta
    * does when you `SET TBLPROPERTIES ('delta.columnMapping.mode' =
    * 'name')`: every top-level field gets a stable column id and a
    * `physicalName` EQUAL to its current name (existing parquet keeps
    * reading verbatim; only columns renamed AFTER the upgrade diverge),
    * `delta.columnMapping.maxColumnId` records the id watermark, and
    * the protocol bumps to what mapping-aware readers key on
    * (minReaderVersion 2 / minWriterVersion 5, or the `columnMapping`
    * feature on (3,7) tables). Nested struct fields stay unmapped
    * (reads gate loudly on nested physical renames — same boundary).
    * One metaData commit, no data I/O. */
  def enableColumnMapping(spark: SparkSession, deltaPath: String): Long = {
    val prior = snapshot(spark, deltaPath)
    require(prior.configuration.getOrElse("delta.columnMapping.mode", "none")
      == "none" && !isColumnMapped(prior.schema),
      s"$deltaPath already has column mapping enabled")
    require(!uniformEnabled(prior.configuration),
      s"cannot enable column mapping on UniForm table $deltaPath — the " +
        "Iceberg mirror resolves columns by parquet name")
    val newSchema = StructType(prior.schema.fields.zipWithIndex.map {
      case (f, i) =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(ColIdKey, i + 1L)
          .putString(PhysNameKey, f.name).build())
    })
    val newConf = prior.configuration +
      ("delta.columnMapping.mode" -> "name") +
      ("delta.columnMapping.maxColumnId" -> prior.schema.fields.length.toString)
    val (mrv, mwv, rf, wf) = prior.protocol
    val protoLine =
      if (mwv >= 7) {
        if (rf.contains("columnMapping")) None
        else {
          val rfOut = (rf :+ "columnMapping").distinct.sorted
          val wfOut = (wf :+ "columnMapping").distinct.sorted
          Some(s"""{"protocol":{"minReaderVersion":${math.max(mrv, 2)},"minWriterVersion":7,"readerFeatures":${rfOut.map(jsEscape).mkString("[", ",", "]")},"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}""")
        }
      } else if (mrv < 2 || mwv < 5)
        Some(s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
      else None
    commitMetaChange(spark, deltaPath, newSchema, prior.partitionColumns,
      newConf, protoLine)
  }

  /** `ALTER TABLE … RENAME COLUMN a TO b` — a pure LOGICAL rename on
    * a column-mapped (name or id mode) table: the field keeps its column id
    * and `physicalName`, so NO data file changes and every existing
    * parquet keeps serving the column; only the metaData's logical
    * name (and the partitionColumns list, when renaming a partition
    * column) moves. Time travel reads each version with ITS name.
    * Refuses on unmapped tables (enable mapping first — that is what
    * makes the rename free) and when a CHECK constraint references
    * the column (the stored SQL text would silently stop binding). */
  def renameColumn(spark: SparkSession, deltaPath: String,
                   from: String, to: String): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    require(prior.configuration.get("delta.columnMapping.mode")
      .exists(m => m == "name" || m == "id"),
      s"RENAME COLUMN needs column mapping on $deltaPath — " +
        "ALTER TABLE … SET TBLPROPERTIES " +
        "('delta.columnMapping.mode'='name') first")
    require(prior.schema.fieldNames.contains(from),
      s"no column $from on $deltaPath")
    require(!prior.schema.fieldNames.contains(to),
      s"column $to already exists on $deltaPath")
    requireNoConstraintOn(prior, from, "rename")
    val newSchema = StructType(prior.schema.fields.map { f =>
      if (f.name != from) f
      else f.copy(name = to, metadata = new MetadataBuilder()
        .withMetadata(f.metadata)
        // pin the physical name if the upgrade predates this field
        .putString(PhysNameKey, physName(f)).build())
    })
    val newPc = prior.partitionColumns.map(c => if (c == from) to else c)
    commitMetaChange(spark, deltaPath, newSchema, newPc,
      prior.configuration, None)
  }

  /** `ALTER TABLE … DROP COLUMN a` — metadata-only on a column-mapped
    * (name or id mode) table: the field leaves the schema, its column id
    * is never reused (`maxColumnId` stands), and the physical data
    * stays in the files — current reads simply never request it,
    * while time travel before the DROP still serves it. Partition
    * columns and constraint-referenced columns refuse; so does
    * dropping the last column. */
  def dropColumn(spark: SparkSession, deltaPath: String,
                 name: String): Long = {
    val prior = snapshot(spark, deltaPath)
    validateWritable(prior)
    require(prior.configuration.get("delta.columnMapping.mode")
      .exists(m => m == "name" || m == "id"),
      s"DROP COLUMN needs column mapping on $deltaPath — " +
        "ALTER TABLE … SET TBLPROPERTIES " +
        "('delta.columnMapping.mode'='name') first")
    require(prior.schema.fieldNames.contains(name),
      s"no column $name on $deltaPath")
    require(!prior.partitionColumns.contains(name),
      s"cannot drop partition column $name — rows live in its " +
        "directories; rewrite the layout with an overwrite instead")
    require(prior.schema.fields.length > 1,
      s"cannot drop the last column of $deltaPath")
    requireNoConstraintOn(prior, name, "drop")
    val newSchema = StructType(prior.schema.fields.filterNot(_.name == name))
    commitMetaChange(spark, deltaPath, newSchema, prior.partitionColumns,
      prior.configuration, None)
  }

  /** A stored CHECK constraint references columns by LOGICAL name in
    * SQL text — renaming or dropping one out from under it would turn
    * the constraint into a silent no-op (or an analysis error on the
    * next write). Word-boundary match errs toward refusing. */
  private def requireNoConstraintOn(snap: Snapshot, colName: String,
                                    op: String): Unit =
    snap.configuration.foreach { case (k, v) =>
      if (k.startsWith("delta.constraints.") &&
        ("""\b""" + java.util.regex.Pattern.quote(colName) + """\b""").r
          .findFirstIn(v).isDefined)
        throw new IllegalArgumentException(
          s"cannot $op column $colName: CHECK constraint " +
            s"${k.stripPrefix("delta.constraints.")} ($v) references it — " +
            "drop the constraint first")
    }

  /** metaData (+ optional protocol) commit with a NEW schema —
    * the shared tail of the column-mapping DDL. */
  private def commitMetaChange(spark: SparkSession, deltaPath: String,
                               newSchema: StructType, newPc: Seq[String],
                               newConf: Map[String, String],
                               protoLine: Option[String],
                               op: String = "ALTER TABLE"): Long = {
    val fs = new Path(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v = listVersions(spark, deltaPath).last + 1
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    protoLine.foreach(lines += _)
    lines += metaDataLine(tableId, newSchema.json, newPc,
      System.currentTimeMillis(), newConf)
    commitCas(spark, deltaPath, v, lines.toSeq, BlindAppend,
      operation = op)
  }

  private def commitConfigChange(spark: SparkSession, deltaPath: String,
                                 prior: Snapshot,
                                 newConf: Map[String, String],
                                 featureUpgrade: Option[(Int, String)],
                                 readerWriterFeature: Option[String] = None,
                                 scope: ReadScope = BlindAppend,
                                 op: String = "SET TBLPROPERTIES",
                                 writerOnlyFeature: Option[String] = None): Long = {
    val fs = new Path(deltaPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v = prior.version + 1
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val (mrv, mwv, rf, wf) = prior.protocol
    featureUpgrade.foreach { case (legacyWriter, feature) =>
      // the legacy writer version that introduced the feature; a table
      // already on table features declares the named feature instead
      if (mwv >= 7) {
        if (!wf.contains(feature)) {
          val wfOut = (wf :+ feature).distinct.sorted
          val rfJson = rf.map(jsEscape).mkString("[", ",", "]")
          lines += s"""{"protocol":{"minReaderVersion":$mrv,"minWriterVersion":7,"readerFeatures":$rfJson,"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}"""
        }
      } else if (mwv < legacyWriter) {
        lines += s"""{"protocol":{"minReaderVersion":$mrv,"minWriterVersion":$legacyWriter}}"""
      }
    }
    // a WRITER-ONLY table feature (inCommitTimestamp, domainMetadata,
    // clustering): force minWriterVersion 7, keep the reader side
    writerOnlyFeature.foreach { feature =>
      lines ++= writerFeatureLine((mrv, mwv, rf, wf), Seq(feature))
    }
    // a READER+WRITER table feature (v2Checkpoint): force (3,7),
    // enumerate legacy-implied features, add to both lists
    readerWriterFeature.foreach { feature =>
      if (mrv < 3 || mwv < 7 || !rf.contains(feature) || !wf.contains(feature)) {
        val (legacyRf, legacyWf) = legacyImpliedFeatures(mrv, mwv)
        val rfOut = (rf ++ legacyRf :+ feature).distinct.sorted
        val wfOut = (wf ++ legacyWf :+ feature).distinct.sorted
        lines += s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":${rfOut.map(jsEscape).mkString("[", ",", "]")},"writerFeatures":${wfOut.map(jsEscape).mkString("[", ",", "]")}}}"""
      }
    }
    lines += metaDataLine(tableId, prior.schema.json,
      prior.partitionColumns, System.currentTimeMillis(), newConf)
    commitCas(spark, deltaPath, v, lines.toSeq, scope, operation = op)
  }

  /** ZERO-COPY format mirror — publish the CURRENT snapshot of a real
    * Iceberg table as a Delta table WITHOUT touching a data file (the
    * shallow-clone shape: every live Iceberg data file is ADOPTED by
    * absolute path into `add` actions of a fresh `_delta_log` at
    * `deltaPath`; record counts come from the Iceberg manifests as
    * per-file stats JSON). `deltaPath` must be a SEPARATE directory —
    * an in-place dual-format dir would flip the catalog's flavor
    * detection (Delta wins) and silently change who owns SQL writes.
    * Re-mirror after new Iceberg snapshots to advance the Delta view:
    * one new Delta version commits the file-set DIFF (removes + adds),
    * so the Delta change feed across mirrors stays meaningful. The
    * mirror is marked `graft.mirrorOf` in table configuration and
    * [[vacuum]] REFUSES on it — physical cleanup must happen through
    * the owning Iceberg table. Merge-on-read delete files refuse
    * loudly ([[IcebergTable.rewriteDataFiles]] folds them away
    * first); partitioned Iceberg sources mirror as UNPARTITIONED
    * Delta — the Iceberg layout keeps identity-source columns IN the
    * data files, so rows stay correct and only partition pruning is
    * forgone. */
  def mirrorFromIceberg(spark: SparkSession, icebergPath: String,
                        deltaPath: String): Long = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    require(deScheme(fs.makeQualified(dst).toString) !=
      deScheme(fs.makeQualified(new Path(icebergPath)).toString),
      "mirrorFromIceberg needs a SEPARATE target directory — an " +
        "in-place dual-format dir would flip catalog flavor detection " +
        "to Delta and change who owns SQL writes")
    val isnap = IcebergTable.snapshot(spark, icebergPath)
    require(isnap.snapshotId != -1L,
      s"cannot mirror empty Iceberg table $icebergPath")
    require(isnap.deletes.isEmpty,
      s"$icebergPath carries merge-on-read delete files a Delta reader " +
        "of the raw files would ignore — IcebergTable.rewriteDataFiles " +
        "first (compaction folds the deletes away)")

    fs.mkdirs(logDir(deltaPath))
    val existing = fs.listStatus(logDir(deltaPath)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") =>
        n.stripSuffix(".json").toLong }.sorted
    val v = existing.lastOption.map(_ + 1).getOrElse(0L)
    val prior: Option[Snapshot] =
      if (existing.nonEmpty) Some(snapshot(spark, deltaPath)) else None
    prior.foreach(p => require(
      p.configuration.contains("graft.mirrorOf"),
      s"$deltaPath exists and is not a mirror — refusing to overwrite " +
        "a real table with mirror commits"))
    val now = System.currentTimeMillis()
    val tableId = java.util.UUID.nameUUIDFromBytes(
      ("delta-mirror:" + deltaPath).getBytes("UTF-8")).toString

    // adopted file set: absolute scheme-less paths, percent-encoded
    // exactly like every other log path (real readers resolve them
    // against the root via the Hadoop absolute-child rule)
    def keyOf(p: String): String =
      deScheme(fs.makeQualified(new Path(p)).toString)
    val current: Seq[(String, IcebergTable.DataFile)] =
      isnap.files.map(f => keyOf(f.path) -> f)
    val priorKeys: Set[String] = prior.toSeq.flatMap(_.files)
      .map(f => keyOf(f.path)).toSet
    val currentKeys = current.map(_._1).toSet

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (v == 0L) {
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      lines += metaDataLine(tableId, isnap.schema.json, Seq.empty, now,
        Map("graft.mirrorOf" -> icebergPath))
    } else if (prior.exists(_.schema != isnap.schema)) {
      lines += metaDataLine(tableId, isnap.schema.json, Seq.empty, now,
        prior.get.configuration)
    }
    priorKeys.diff(currentKeys).toSeq.sorted.foreach { gone =>
      lines += s"""{"remove":{"path":${jsEscape(encodePath(gone))},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    current.filterNot(c => priorKeys(c._1)).foreach { case (key, f) =>
      val stats = "{\"numRecords\":" + f.records + "}"
      lines += s"""{"add":{"path":${jsEscape(encodePath(key))},"partitionValues":{},"size":${f.sizeBytes},"modificationTime":$now,"dataChange":true,"stats":${jsEscape(stats)}}}"""
    }
    // nothing changed since the last mirror: no empty commit
    if (lines.isEmpty) return existing.last
    commitCas(spark, deltaPath, v, lines.toSeq, ReadTable,
      operation = "MIRROR",
      ictHint = prior.map(p => ictOn(p.configuration)))
  }

  /** The write-path invariant gate: PROTOCOL.md Column Invariants
    * (NOT NULL on the table schema) + CHECK Constraints
    * (`delta.constraints.*`), enforced on the INCOMING frame in ONE
    * job before anything is staged — a violating row vetoes the whole
    * commit. NULL constraint results pass, per the protocol; the
    * violation path (rare) pays per-check counts for the error
    * message. */
  private def enforceInvariants(spark: SparkSession, df: DataFrame,
                                snap: Snapshot, deltaPath: String,
                                enforceNotNull: Boolean): Unit = {
    val checks: Seq[(String, org.apache.spark.sql.Column)] =
      snap.configuration.toSeq.sortBy(_._1).collect {
        case (k, v) if k.startsWith("delta.constraints.") =>
          s"CHECK constraint ${k.stripPrefix("delta.constraints.")} ($v)" ->
            !coalesce(expr(v), lit(true))
      } ++ snap.schema.fields.toSeq
        // a PROVIDED generated column must equal its expression
        // (null-safe); omitted ones were computed upstream
        .filter(f => f.metadata.contains(GenerationExprKey) &&
          df.columns.contains(f.name))
        .map { f =>
          val e = f.metadata.getString(GenerationExprKey)
          s"GENERATED column ${f.name} AS ($e)" ->
            !(col(f.name) <=> expr(e).cast(f.dataType))
        } ++ snap.schema.fields.toSeq
        // old-style COLUMN INVARIANTS (PROTOCOL.md §Column
        // Invariants, the legacy writer-v2 feature): metadata key
        // `delta.invariants` holds {"expression":{"expression":"…"}}
        // — rows where it does not hold must veto the commit
        .filter(f => f.metadata.contains("delta.invariants") &&
          df.columns.contains(f.name))
        .map { f =>
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(f.metadata.getString("delta.invariants"))
          val e = Option(node.get("expression"))
            .flatMap(x => Option(x.get("expression"))).map(_.asText())
            .getOrElse(throw new UnsupportedOperationException(
              s"unparseable delta.invariants on ${f.name}: " +
                f.metadata.getString("delta.invariants")))
          s"INVARIANT on ${f.name} ($e)" -> !coalesce(expr(e), lit(true))
        } ++ (if (!enforceNotNull) Seq.empty
      else snap.schema.fields.toSeq
        // only when the incoming column CAN hold nulls — a frame whose
        // own type is non-nullable is proven clean by Spark's types,
        // so the common typed-Dataset append pays no extra scan
        .filter(f => !f.nullable &&
          df.schema.find(_.name == f.name).exists(_.nullable))
        .map(f => s"NOT NULL column ${f.name}" -> col(f.name).isNull))
    if (checks.isEmpty) return
    if (!df.where(checks.map(_._2).reduce(_ || _)).isEmpty) {
      val counts = checks.map { case (label, c) =>
        (label, df.where(c).count())
      }.filter(_._2 > 0)
      throw new IllegalArgumentException(
        s"write to $deltaPath rejected: " + counts.map { case (l, n) =>
          s"$n rows violate $l" }.mkString("; "))
    }
  }

  /** Author a classic single-file checkpoint at `version`:
    * `<v>.checkpoint.parquet` holding the reconciled state (protocol
    * + metaData + every live add action) plus the `_last_checkpoint`
    * pointer. Readers (ours and real Delta) then replay ONE parquet
    * read + the post-checkpoint JSON tail instead of every commit.
    * Idempotent — re-checkpointing a version overwrites the same
    * consolidated content. */
  def checkpoint(spark: SparkSession, deltaPath: String, version: Long): Unit = {
    import org.apache.spark.sql.Row
    val snap = snapshot(spark, deltaPath, versionAsOf = Some(version))
    val fsConf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deltaPath)
    val fs = dst.getFileSystem(fsConf)
    def deScheme(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")
    val root = deScheme(fs.makeQualified(dst).toString)
    val tableId = java.util.UUID.nameUUIDFromBytes(
      deltaPath.getBytes("UTF-8")).toString
    // the table's REAL protocol — a checkpoint that downgraded a
    // DV-bearing (3,7) table to (1,2) would make spec-compliant
    // readers ignore the vectors and serve deleted rows
    val (pMrv, pMwv, pRf, pWf) = snap.protocol
    val protoRow = Row(pMrv, pMwv,
      if (pRf.isEmpty) null else pRf, if (pWf.isEmpty) null else pWf)
    val metaRow = Row(tableId, null, snap.schema.json,
      snap.partitionColumns, snap.configuration, Row("parquet"))
    val addRows = snap.files.map { f =>
      val rel = encodePath(deScheme(new Path(f.path).toString)
        .stripPrefix(root + "/"))
      // deletion vectors MUST survive consolidation — a checkpoint
      // that dropped them would resurrect merge-on-read-deleted rows
      val dvRow = f.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(Int.box).orNull, d.sizeInBytes, d.cardinality)).orNull
      Row(rel, f.partitionValues, f.size, f.modificationTime,
        java.lang.Boolean.TRUE, f.stats.orNull, dvRow,
        f.baseRowId.map(Long.box).orNull,
        f.defaultRowCommitVersion.map(Long.box).orNull)
    }
    // txn watermarks MUST survive consolidation: a checkpoint that
    // dropped them would reset the streaming sink's idempotence gate
    // and duplicate replayed batches after a restart
    val txnRows = snap.txns.toSeq.sortBy(_._1).map { case (app, tv) =>
      Row(app, tv)
    }
    // live domain metadata MUST survive consolidation (clustering
    // columns, the row-id high watermark); removed-domain tombstones
    // may be dropped at checkpoint per the protocol.
    val domainRows = snap.domains.toSeq.sortBy(_._1).map { case (dom, cfg) =>
      Row(dom, cfg, java.lang.Boolean.FALSE)
    }
    // stage-then-adopt: the actions are DRIVER-BUILT rows already —
    // write the part with Spark's own ParquetWriteSupport on the
    // driver (same bytes a task writes, none of the one-task job per
    // part), then rename into place so a concurrent lister never sees
    // a torn checkpoint
    def adoptOne(rows: Seq[Row], schema: StructType, target: Path): Long = {
      val tmp = new Path(dst, s".tmp-cp-$version-${java.util.UUID.randomUUID()}")
      DriverParquet.write(spark, tmp, schema, rows)
      fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new IllegalStateException(s"rename failed for $target")
      fs.getFileStatus(target).getLen
    }
    def writeLastCheckpoint(size: Int): Unit = {
      val lc = new Path(logDir(deltaPath), "_last_checkpoint")
      val out = fs.create(lc, true) // pointer file: last-writer-wins
      try out.write(
        s"""{"version":$version,"size":$size}\n""".getBytes("UTF-8"))
      finally out.close()
    }

    if (snap.configuration.get("delta.checkpointPolicy").contains("v2")) {
      // V2 (sidecar) checkpoint — the modern form external readers
      // expect on big logs: file actions land in
      // `_delta_log/_sidecars/<uuid>.parquet`, the top file carries
      // the non-file actions + checkpointMetadata + the sidecar refs
      val uuid = java.util.UUID.randomUUID().toString
      val scDir = new Path(logDir(deltaPath), "_sidecars")
      fs.mkdirs(scDir)
      val scPath = new Path(scDir, s"$uuid.parquet")
      val scLen = adoptOne(addRows.map(a => Row(a)),
        StructType(Seq(ActionSchema("add"))), scPath)
      val scMod = fs.getFileStatus(scPath).getModificationTime
      val topSchema = StructType(ActionSchema.fields ++ Seq(
        StructField("checkpointMetadata", StructType(Seq(
          StructField("version", LongType)))),
        StructField("sidecar", StructType(Seq(
          StructField("path", StringType),
          StructField("sizeInBytes", LongType),
          StructField("modificationTime", LongType))))))
      def top(proto: Row = null, meta: Row = null, txn: Row = null,
              dm: Row = null, cpm: Row = null, sc: Row = null): Row =
        Row(proto, meta, null, null, txn, dm, null, cpm, sc)
      val topRows: Seq[Row] =
        Seq(top(cpm = Row(version)), top(proto = protoRow),
          top(meta = metaRow)) ++
          txnRows.map(t => top(txn = t)) ++
          domainRows.map(d => top(dm = d)) :+
          top(sc = Row(s"$uuid.parquet", scLen, scMod))
      adoptOne(topRows, topSchema, new Path(logDir(deltaPath),
        pad20(version) + s".checkpoint.$uuid.parquet"))
      writeLastCheckpoint(topRows.size + addRows.size)
      return
    }

    val rows: Seq[Row] =
      (Row(protoRow, null, null, null, null, null, null) +:
        Row(null, metaRow, null, null, null, null, null) +:
        (addRows.map(a => Row(null, null, a, null, null, null, null)) ++
          txnRows.map(t => Row(null, null, null, null, t, null, null)) ++
          domainRows.map(d => Row(null, null, null, null, null, d, null))))
    adoptOne(rows, StructType(ActionSchema.fields), new Path(logDir(deltaPath),
      pad20(version) + ".checkpoint.parquet"))
    writeLastCheckpoint(rows.size)
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
          schemaJson, Seq.empty, now)
      }
      prevFiles.foreach { case (rel, _) =>
        lines += s"""{"remove":{"path":${jsEscape(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
      }
      copied.foreach { case (rel, sz) =>
        lines += s"""{"add":{"path":${jsEscape(rel)},"partitionValues":{},"size":$sz,"modificationTime":$now,"dataChange":true}}"""
      }
      val commit = new Path(new Path(dst, "_delta_log"), pad20(v - 1) + ".json")
      // same exclusive-create primitive as commitCas — a raced
      // migration must fail loudly, not truncate the winner's commit
      if (!AtomicCas.createExclusive(fs, commit,
        (lines.mkString("\n") + "\n").getBytes("UTF-8")))
        throw new IllegalStateException(
          s"$dst: commit ${v - 1} already exists — a concurrent export " +
            "to the same destination won the race")
      prevFiles = copied
    }
    cur - 1 // top Delta version
  }
}
