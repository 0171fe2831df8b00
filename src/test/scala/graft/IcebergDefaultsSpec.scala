package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField}

import graft.sources.IcebergTable

/** Iceberg v3 COLUMN DEFAULTS (spec v3 §Default values):
  * `initial-default` serves the column for rows of files written
  * BEFORE the field existed, `write-default` fills it when a writer
  * omits the column, time travel keeps each snapshot's own defaults,
  * and ADD COLUMN … DEFAULT is the DDL that records both. */
class IcebergDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("icedefaults").toString + "/t"

  test("initial-default serves pre-evolution files; new writes carry real values") {
    val t = tmp()
    IcebergTable.write(spark,
      (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.addColumns(spark, t,
      Seq(StructField("score", LongType, nullable = true)),
      defaults = Map("score" -> "7"))
    // pre-evolution rows read the default, not null
    val before = IcebergTable.read(spark, t)
      .select("k", "score").as[(Long, Long)].collect().toMap
    assert(before.size === 10 && before.values.forall(_ === 7L))

    // an append CARRYING the column writes real values …
    IcebergTable.write(spark,
      Seq((100L, "x", 1L)).toDF("k", "v", "score"), t)
    // … and an append OMITTING it gets the write-default materialized
    IcebergTable.write(spark, Seq((200L, "y")).toDF("k", "v"), t)
    val after = IcebergTable.read(spark, t)
      .select("k", "score").as[(Long, Long)].collect().toMap
    assert(after(100L) === 1L)
    assert(after(200L) === 7L)
    assert(after(0L) === 7L) // old files still serve the default
  }

  test("string/required defaults; DML over defaulted tables keeps values") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // a REQUIRED column may be added only because it has a default
    IcebergTable.addColumns(spark, t,
      Seq(StructField("src", StringType, nullable = false)),
      defaults = Map("src" -> "'common-crawl'"))
    val got = IcebergTable.read(spark, t)
      .select("k", "src").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "common-crawl", 2L -> "common-crawl"))
    // without a default, a required add still refuses
    intercept[IllegalArgumentException] {
      IcebergTable.addColumns(spark, t,
        Seq(StructField("nope", LongType, nullable = false)))
    }
    // defaults need v3
    val t2 = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t2)
    intercept[IllegalArgumentException] {
      IcebergTable.addColumns(spark, t2,
        Seq(StructField("d", LongType, nullable = true)),
        defaults = Map("d" -> "1"))
    }
  }

  test("time travel keeps per-snapshot defaults; SQL DDL surface works") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    val preAlter = IcebergTable.snapshot(spark, t).snapshotId
    spark.sql(s"ALTER TABLE '$t' ADD COLUMN flag BIGINT DEFAULT 42")
    // current read serves the default for the pre-evolution file
    assert(IcebergTable.read(spark, t).select("flag")
      .as[Long].collect().toSeq === Seq(42L))
    // time travel to the pre-ALTER snapshot: its pinned schema has
    // no such column at all
    val tt = IcebergTable.read(spark, t, snapshotIdAsOf = Some(preAlter))
    assert(!tt.columns.contains("flag"))
    // an omitted-column append through the WRITE path fills 42
    IcebergTable.write(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val cur = IcebergTable.read(spark, t)
      .select("k", "flag").as[(Long, Long)].collect().toMap
    assert(cur === Map(1L -> 42L, 2L -> 42L))
  }

  test("external-shaped metadata: a foreign initial-default in the schema JSON reads correctly") {
    // simulate a table ANALYZEd/evolved by ANOTHER engine: craft the
    // defaults directly in the metadata JSON (no graft DDL involved)
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.addColumns(spark, t,
      Seq(StructField("w", LongType, nullable = true)))
    // splice initial-default/write-default into the CURRENT schema's
    // new field — the exact JSON shape a foreign v3 writer produces
    val mdir = new org.apache.hadoop.fs.Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metas = fs.globStatus(new org.apache.hadoop.fs.Path(mdir, "v*.metadata.json"))
      .map(_.getPath).sortBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt)
    val top = metas.last
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = {
      val in = fs.open(top)
      try M.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    val curId = root.get("current-schema-id").asInt()
    root.get("schemas").elements()
    val it = root.get("schemas").elements()
    while (it.hasNext) {
      val s = it.next()
      if (s.get("schema-id").asInt() == curId) {
        val fit = s.get("fields").elements()
        while (fit.hasNext) {
          val f = fit.next().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          if (f.get("name").asText() == "w") {
            f.put("initial-default", 99L)
            f.put("write-default", 99L)
          }
        }
      }
    }
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()

    val got = IcebergTable.read(spark, t)
      .select("k", "w").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 99L, 2L -> 99L))
  }

  // -- nested-field defaults (foreign-shaped v3 metadata) ------------

  private val M = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Splice a foreign-style schema evolution into the latest
    * metadata.json: clone the current schema under a fresh schema-id,
    * apply `mutate` to the clone, bump last-column-id by `newCols`,
    * point current-schema-id at it. The exact shape another engine's
    * ALTER TABLE leaves behind. */
  private def foreignEvolve(t: String, newCols: Int)(
    mutate: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    val mdir = new org.apache.hadoop.fs.Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.globStatus(new org.apache.hadoop.fs.Path(mdir, "v*.metadata.json"))
      .map(_.getPath).sortBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt).last
    val root = {
      val in = fs.open(top)
      try M.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    val curId = root.get("current-schema-id").asInt()
    val schemas = root.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val cur = schemas.elements().asScala
      .find(_.get("schema-id").asInt() == curId).get
    val clone = cur.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val newId = schemas.elements().asScala
      .map(_.get("schema-id").asInt()).max + 1
    clone.put("schema-id", newId)
    mutate(clone)
    schemas.add(clone)
    root.put("current-schema-id", newId)
    root.put("last-column-id", root.get("last-column-id").asInt() + newCols)
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
  }

  /** Rewrite the latest metadata JSON in place with an arbitrary
    * mutation — simulates a foreign engine's metadata maintenance. */
  private def mutateMetadata(t: String)(
    mutate: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    val mdir = new org.apache.hadoop.fs.Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.globStatus(new org.apache.hadoop.fs.Path(mdir, "v*.metadata.json"))
      .map(_.getPath).sortBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt).last
    val root = {
      val in = fs.open(top)
      try M.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    mutate(root)
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
  }

  private def structFieldNode(s: com.fasterxml.jackson.databind.JsonNode,
                              name: String) =
    s.get("fields").elements().asScala
      .find(_.get("name").asText() == name).get
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]

  test("NESTED initial-default: pre-evolution files serve the default inside the struct, never silent NULL") {
    import org.apache.spark.sql.functions.struct
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "g1")
        .select(col("k"), struct(col("g1")).as("s")), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // foreign ALTER: struct s gains g2 LONG DEFAULT 5 (id-bearing
    // nested field with initial-default + write-default, the spec's
    // ADD COLUMN shape)
    foreignEvolve(t, newCols = 1) { clone =>
      val lastId = clone.get("fields").elements().asScala
        .map(_.get("id").asInt()).max
      val sType = structFieldNode(clone, "s").get("type")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val g2 = sType.get("fields")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].addObject()
      g2.put("id", 100 + lastId); g2.put("name", "g2")
      g2.put("required", false); g2.put("type", "long")
      g2.put("initial-default", 5L); g2.put("write-default", 5L)
    }
    // pre-evolution file: s.g2 serves 5, s.g1 keeps stored values
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.nestedDefaults.map(_.path) === Seq(Seq("s", "g2")))
    val got = IcebergTable.read(spark, t)
      .select(col("k"), col("s.g1"), col("s.g2"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((10L, 5L)), 2L -> ((20L, 5L))))

    // a NEW file carrying real g2 values serves them; old files keep 5
    IcebergTable.write(spark,
      Seq((3L, 30L, 7L)).toDF("k", "g1", "g2")
        .select(col("k"), struct(col("g1"), col("g2")).as("s")), t)
    val got2 = IcebergTable.read(spark, t)
      .select(col("k"), col("s.g2")).as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 5L, 2L -> 5L, 3L -> 7L))
    // a NULL parent struct stays NULL — the default fills fields of
    // existing struct values, not missing structs
    IcebergTable.write(spark,
      Seq(4L).toDF("k").select(col("k"),
        org.apache.spark.sql.functions.lit(null)
          .cast(IcebergTable.read(spark, t).schema("s").dataType).as("s")), t)
    val withNull = IcebergTable.read(spark, t)
      .select(col("k"), col("s")).where(col("k") === 4L).collect()
    assert(withNull.length === 1 && withNull.head.isNullAt(1))
  }

  test("era-unresolvable file on a nested-defaulted table refuses loudly even when every RECORDED era has the field") {
    import org.apache.spark.sql.functions.struct
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L)).toDF("k", "g1")
        .select(col("k"), struct(col("g1")).as("s")), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    foreignEvolve(t, newCols = 1) { clone =>
      val lastId = clone.get("fields").elements().asScala
        .map(_.get("id").asInt()).max
      val sType = structFieldNode(clone, "s").get("type")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val g2 = sType.get("fields")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].addObject()
      g2.put("id", 100 + lastId); g2.put("name", "g2")
      g2.put("required", false); g2.put("type", "long")
      g2.put("initial-default", 5L); g2.put("write-default", 5L)
    }
    // sanity: while the era IS resolvable, the default serves
    assert(IcebergTable.read(spark, t).select(col("s.g2"))
      .as[Long].collect().toSeq === Seq(5L))
    // foreign METADATA CLEANUP: prune the pre-evolution schema from
    // the schemas list and the adding snapshot's schema-id pointer —
    // every recorded era now contains s.g2, yet the existing file
    // predates the field and owes the initial-default. An identity
    // read would serve silent NULL; the read must refuse instead.
    mutateMetadata(t) { root =>
      val schemas = root.get("schemas")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      val curId = root.get("current-schema-id").asInt()
      val keep = schemas.elements().asScala
        .filter(_.get("schema-id").asInt() == curId).toSeq
      schemas.removeAll(); keep.foreach(schemas.add)
      root.get("snapshots").elements().asScala.foreach(s =>
        s.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("schema-id"))
    }
    val ex = intercept[UnsupportedOperationException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(ex.getMessage.contains("NESTED"), ex.getMessage)
  }

  test("ADD COLUMN parent.child DEFAULT: the DDL twin of the foreign nested default") {
    import org.apache.spark.sql.functions.struct
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "g1")
        .select(col("k"), struct(col("g1")).as("s")), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    IcebergTable.addColumns(spark, t,
      Seq(StructField("s.g2", LongType, nullable = true)),
      defaults = Map("s.g2" -> "5"))
    val got = IcebergTable.read(spark, t)
      .select(col("k"), col("s.g2")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 5L, 2L -> 5L))
    // a new write carrying the evolved struct serves real values
    IcebergTable.write(spark,
      Seq((3L, 30L, 9L)).toDF("k", "g1", "g2")
        .select(col("k"),
          struct(col("g1"), col("g2")).as("s")), t)
    val got2 = IcebergTable.read(spark, t)
      .select(col("k"), col("s.g2")).as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 5L, 2L -> 5L, 3L -> 9L))
    // the SQL surface routes dotted names too
    spark.sql(s"ALTER TABLE '$t' ADD COLUMN s.g3 BIGINT DEFAULT 8")
    assert(IcebergTable.read(spark, t).select(col("s.g3"))
      .as[Long].collect().toSet === Set(8L))
    // unknown parent / non-struct parent refuse
    intercept[IllegalArgumentException] {
      IcebergTable.addColumns(spark, t,
        Seq(StructField("nope.x", LongType, nullable = true)))
    }
    intercept[IllegalArgumentException] {
      IcebergTable.addColumns(spark, t,
        Seq(StructField("k.x", LongType, nullable = true)))
    }
    // a BACKTICKED name is a literal top-level column with a dot in
    // its name — added verbatim, never misrouted as a struct path
    IcebergTable.addColumns(spark, t,
      Seq(StructField("`dot.ted`", LongType, nullable = true)))
    val sch = IcebergTable.read(spark, t).schema
    assert(sch.fieldNames.contains("dot.ted"), sch.fieldNames.mkString(","))
    assert(IcebergTable.read(spark, t).select(col("`dot.ted`"))
      .collect().forall(_.isNullAt(0)))
  }

  test("NESTED rename drift refuses loudly: pre-evolution files would silently read null (name-based struct resolution)") {
    import org.apache.spark.sql.functions.struct
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L)).toDF("k", "g1")
        .select(col("k"), struct(col("g1")).as("s")), t)
    val preRename = IcebergTable.snapshot(spark, t).snapshotId
    // foreign ALTER: rename the struct-INNER field g1 → h1 (same id)
    foreignEvolve(t, newCols = 0) { clone =>
      val sType = structFieldNode(clone, "s").get("type")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val g1 = sType.get("fields").elements().asScala.next()
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      g1.put("name", "h1")
    }
    val ex = intercept[UnsupportedOperationException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(ex.getMessage.contains("NESTED"))
    // the DSv2 scan gates on the same drift (routes to the resolving
    // reader, which refuses)
    val ex2 = intercept[Exception] {
      spark.read.format("graft-iceberg").load(t).collect()
    }
    assert(ex2.toString.contains("NESTED") ||
      ex2.toString.contains("renamed"), ex2.toString)
    // time travel to the PRE-rename snapshot pins the old era — the
    // file matches it, so the read serves fine
    val tt = IcebergTable.read(spark, t, snapshotIdAsOf = Some(preRename))
      .select(col("k"), col("s.g1")).as[(Long, Long)].collect()
    assert(tt.toSeq === Seq((1L, 10L)))
  }

  test("NESTED drop + re-add refuses loudly: the old physical column must not resurrect") {
    import org.apache.spark.sql.functions.struct
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L)).toDF("k", "g1")
        .select(col("k"), struct(col("g1")).as("s")), t)
    // foreign ALTER: drop s.g1, then re-add s.g1 under a FRESH id —
    // one evolved schema where the name points at a different field
    foreignEvolve(t, newCols = 1) { clone =>
      val sType = structFieldNode(clone, "s").get("type")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val fields = sType.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("fields")
      val oldId = fields.elements().asScala.next().get("id").asInt()
      fields.removeAll()
      val re = fields.addObject()
      re.put("id", 1000 + oldId); re.put("name", "g1")
      re.put("required", false); re.put("type", "long")
    }
    val ex = intercept[UnsupportedOperationException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(ex.getMessage.contains("NESTED"))
  }

  test("NESTED default under a list/map refuses loudly for pre-evolution files (never silent NULL)") {
    import org.apache.spark.sql.functions.array
    val t = tmp()
    IcebergTable.write(spark,
      Seq((1L, 10L)).toDF("k", "e1")
        .select(col("k"),
          array(org.apache.spark.sql.functions.struct(col("e1"))).as("a")), t)
    IcebergTable.upgradeFormatVersion(spark, t, 3)
    // foreign ALTER: the list ELEMENT struct gains e2 with a default —
    // un-fillable by struct projection, must refuse for old files
    foreignEvolve(t, newCols = 1) { clone =>
      val lastId = clone.get("fields").elements().asScala
        .map(_.get("id").asInt()).max
      val aType = structFieldNode(clone, "a").get("type")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val elem = aType.get("element")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val e2 = elem.get("fields")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].addObject()
      e2.put("id", 100 + lastId); e2.put("name", "e2")
      e2.put("required", false); e2.put("type", "long")
      e2.put("initial-default", 9L)
    }
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.nestedDefaults.exists(_.underCollection))
    val ex = intercept[UnsupportedOperationException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(ex.getMessage.contains("crosses a list/map"))
  }
}
