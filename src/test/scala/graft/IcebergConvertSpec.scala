package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.IcebergTable

/** `CONVERT TO ICEBERG` — in-place adoption of a plain parquet dir
  * (the `migrate` shape): snapshot 1 adopts the files by absolute
  * path with `schema.name-mapping.default` recorded (spec §Name
  * Mapping Serialization), reads serve hash-equal rows, the adopted
  * table takes DML / appends / OPTIMIZE like any real table, and the
  * name mapping keeps pre-adoption field-id-less files resolvable
  * after a rename even when their schema era is pruned. */
class IcebergConvertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-iceconv").toString + "/t"

  private def seed(dir: String): Unit = {
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c", 30.0)).toDF("id", "s", "v")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("adopt: read hash-equal to plain parquet, name mapping recorded, stats feed pruning") {
    val t = freshDir()
    seed(t)
    val plain = spark.read.parquet(t)
      .as[(Long, String, Double)].collect().toSet
    val snapId = spark.sql(s"CONVERT TO ICEBERG '$t'")
      .collect()(0).getLong(1)
    assert(snapId === 1L)
    assert(IcebergTable.read(spark, t)
      .as[(Long, String, Double)].collect().toSet === plain)
    // the name mapping is in table properties, one entry per field
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/v1.metadata.json")), "UTF-8")
    assert(meta.contains("schema.name-mapping.default"), meta.take(400))
    assert(meta.contains("field-id"))
    // manifest-recorded footer stats serve (bounds present)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.files.size === 2)
    assert(snap.files.forall(_.records > 0))
    assert(snap.files.exists(_.bounds.nonEmpty))
  }

  test("the adopted table is a REAL table: append, MOR DELETE, OPTIMIZE") {
    val t = freshDir()
    seed(t)
    IcebergTable.convertFrom(spark, t)
    IcebergTable.write(spark,
      Seq((4L, "d", 40.0)).toDF("id", "s", "v"), t)
    IcebergTable.delete(spark, t, col("id") === 2L)
    assert(IcebergTable.read(spark, t)
      .select("id", "s").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (3L, "c"), (4L, "d")))
    // compaction folds the adopted pile + the delete away
    IcebergTable.rewriteDataFiles(spark, t, targetFileBytes = 1L << 30)
    assert(IcebergTable.snapshot(spark, t).files.size === 1)
    assert(IcebergTable.read(spark, t)
      .select("id", "s").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (3L, "c"), (4L, "d")))
  }

  test("name mapping honored: pre-adoption files read through it after a rename even with the adoption-era schema pruned") {
    val t = freshDir()
    seed(t)
    IcebergTable.convertFrom(spark, t)
    IcebergTable.renameColumn(spark, t, "s", "label")
    // era projection serves the rename already; now strip the
    // snapshot schema-id pointers (a foreign metadata-maintenance
    // shape) so era resolution fails while the RECORDED eras still
    // witness the rename — the name mapping must carry the read
    val mdir = new org.apache.hadoop.fs.Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.globStatus(new org.apache.hadoop.fs.Path(mdir,
      "v*.metadata.json")).map(_.getPath)
      .sortBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt).last
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = {
      val in = fs.open(top)
      try M.readTree(in)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    import scala.jdk.CollectionConverters._
    root.get("snapshots").elements().asScala.foreach(s =>
      s.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("schema-id"))
    val out = fs.create(top, true)
    try out.write(M.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()

    val got = IcebergTable.read(spark, t)
      .select("id", "label").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // and WITHOUT the mapping the same shape refuses (the r15 drift
    // gate) — strip the property to prove the mapping is load-bearing
    Option(root.get("properties")).foreach(
      _.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("schema.name-mapping.default"))
    val out2 = fs.create(top, true)
    try out2.write(M.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out2.close()
    val e = intercept[UnsupportedOperationException] {
      IcebergTable.read(spark, t).select("id", "label").collect()
    }
    assert(e.getMessage.contains("renamed"), e.getMessage)
  }

  test("HIVE-layout adoption: k=v dirs become identity partition columns served from the paths; pruning + DML work") {
    val t = Files.createTempDirectory("graft-iceconv-hv").toString + "/t"
    // two partition levels, typed: ds (string date) and region (long)
    Seq((1L, "a", "2024-01-01", 3L), (2L, "b", "2024-01-01", 3L),
      (3L, "c", "2024-01-02", 5L), (4L, "d", "2024-01-02", 7L))
      .toDF("id", "s", "ds", "region")
      .write.partitionBy("ds", "region").parquet(t)
    val plain = spark.read.parquet(t)
      .select("id", "s", "ds", "region")
      .as[(Long, String, String, Long)].collect().toSet
    IcebergTable.convertFrom(spark, t)
    val snap = IcebergTable.snapshot(spark, t)
    // identity spec recorded; tuples in the manifests
    assert(snap.specFields.map(f => (f.name, f.transform))
      === Seq(("ds", "identity"), ("region", "identity")))
    assert(snap.files.forall(f =>
      f.partitionTuple.contains("ds") && f.partitionTuple.contains("region")))
    // the read serves the partition columns FROM THE PATHS, typed
    assert(IcebergTable.read(spark, t)
      .select("id", "s", "ds", "region")
      .as[(Long, String, String, Long)].collect().toSet === plain)
    assert(IcebergTable.read(spark, t).schema("region").dataType
      === org.apache.spark.sql.types.LongType)
    // identity partition PRUNING works from the adopted tuples
    val pruned = IcebergTable.prunedFiles(spark, snap, col("ds") === "2024-01-01")
    assert(pruned.size < snap.files.size && pruned.nonEmpty)
    // filters over partition columns answer correctly
    assert(IcebergTable.read(spark, t).where(col("region") === 3L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    // the DSv2 scan gates to the resolving reader (name-based scans
    // cannot serve path-partition columns)
    val eg = intercept[Exception] {
      spark.read.format("graft-iceberg").load(t).collect()
    }
    assert(eg.toString.contains("IcebergTable.read"), eg.toString)
    // the adopted table is REAL: a post-adoption append (written
    // with columns IN the files) unions with path-served files
    IcebergTable.write(spark,
      Seq((9L, "z", "2024-01-03", 9L)).toDF("id", "s", "ds", "region"), t,
      partitionBy = IcebergTable.defaultSpecNames(spark, t))
    assert(IcebergTable.read(spark, t).count() === 5L)
    assert(IcebergTable.read(spark, t).where(col("ds") === "2024-01-03")
      .select("id").as[Long].collect().toSeq === Seq(9L))
    // MOR DELETE composes: kills a path-served row exactly
    IcebergTable.delete(spark, t, col("id") === 2L)
    assert(IcebergTable.read(spark, t)
      .select("id", "s", "ds", "region")
      .as[(Long, String, String, Long)].collect().toSet
      === plain - ((2L, "b", "2024-01-01", 3L)) +
      ((9L, "z", "2024-01-03", 9L)))
    // renaming a partition SOURCE refuses (the existing conservative
    // gate — repartition first); a data column renames fine and the
    // path-served partition columns keep serving
    intercept[IllegalArgumentException] {
      IcebergTable.renameColumn(spark, t, "region", "zone")
    }
    IcebergTable.renameColumn(spark, t, "s", "name")
    assert(IcebergTable.read(spark, t).where(col("region") === 3L)
      .select("id", "name").as[(Long, String)].collect().toSet
      === Set((1L, "a")))
  }

  test("refusals: existing Iceberg metadata, Delta dirs, partition column duplicated inside the files") {
    val p = Files.createTempDirectory("graft-iceconv-h").toString + "/t"
    // partition col ALSO inside the files → ambiguous, refuse
    val amb = Files.createTempDirectory("graft-iceconv-amb").toString + "/t"
    Seq((1L, "x", "a")).toDF("id", "s", "p")
      .coalesce(1).write.parquet(s"$amb/p=a")
    val e1 = intercept[IllegalArgumentException] {
      IcebergTable.convertFrom(spark, amb)
    }
    assert(e1.getMessage.contains("also lives inside"), e1.getMessage)

    val t2 = freshDir()
    seed(t2)
    IcebergTable.convertFrom(spark, t2)
    val e2 = intercept[IllegalArgumentException] {
      IcebergTable.convertFrom(spark, t2)
    }
    assert(e2.getMessage.contains("IS an Iceberg table"), e2.getMessage)

    val t3 = freshDir()
    graft.sources.DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t3)
    val e3 = intercept[IllegalArgumentException] {
      IcebergTable.convertFrom(spark, t3)
    }
    assert(e3.getMessage.contains("_delta_log"), e3.getMessage)
  }
}
