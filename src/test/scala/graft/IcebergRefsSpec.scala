package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot REFS (branches/tags), WRITE-AUDIT-PUBLISH, and TYPE
  * PROMOTION — the production-lifecycle surface of the Iceberg spec:
  * refs pin snapshots by name (`VERSION AS OF 'tag'` resolves them,
  * expire keeps them), a wap.id-staged append stays invisible to main
  * reads until published, and `int→long` / `float→double` /
  * decimal-precision widenings read old files without a rewrite. */
class IcebergRefsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-refs").toString + "/t"

  test("tags and branches pin snapshots; VERSION AS OF resolves them; expire keeps them") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    val v1 = IcebergTable.snapshot(spark, t).snapshotId
    IcebergTable.createTag(spark, t, "release-1", v1)
    IcebergTable.write(spark, Seq((2, "b")).toDF("id", "s"), t)
    IcebergTable.write(spark, Seq((3, "c")).toDF("id", "s"), t)
    val v3 = IcebergTable.snapshot(spark, t).snapshotId
    IcebergTable.createBranch(spark, t, "dev", v3)

    assert(IcebergTable.refs(spark, t) ===
      Map("release-1" -> ((v1, "tag")), "dev" -> ((v3, "branch"))))
    assert(IcebergTable.refSnapshotId(spark, t, "release-1") === v1)
    // the ref-resolved read serves the PINNED state
    val pinned = IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(IcebergTable.refSnapshotId(spark, t, "release-1")))
    assert(pinned.count() === 1L)
    // SQL: VERSION AS OF 'release-1' through the catalog
    spark.conf.set("spark.sql.catalog.graftrefs",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftrefs.root",
      new java.io.File(t).getParent)
    val viaSql = spark.sql(
      s"SELECT * FROM graftrefs.t VERSION AS OF 'release-1'")
    assert(viaSql.count() === 1L)

    // tags are immutable; branches move
    intercept[IllegalArgumentException] {
      IcebergTable.createTag(spark, t, "release-1", v3)
    }
    IcebergTable.fastForwardBranch(spark, t, "dev", v1)
    assert(IcebergTable.refSnapshotId(spark, t, "dev") === v1)

    // expire keeps the ref-pinned snapshot alive
    IcebergTable.expireSnapshots(spark, t, keepSnapshots = 1)
    val ids = IcebergTable.snapshotIds(spark, t).toSet
    assert(ids.contains(v1), "ref-pinned snapshot survives expire")
    assert(IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(v1)).count() === 1L)

    IcebergTable.dropRef(spark, t, "release-1")
    assert(!IcebergTable.refs(spark, t).contains("release-1"))
  }

  test("branch writes: commits land on the branch, main untouched, publish fast-forwards") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "main1")).toDF("id", "s"), t)
    val fork = IcebergTable.snapshot(spark, t).snapshotId
    IcebergTable.createBranch(spark, t, "dev", fork)
    // two appends ON the branch
    IcebergTable.write(spark, Seq((2, "dev1")).toDF("id", "s"), t,
      toBranch = Some("dev"))
    val head = IcebergTable.write(spark, Seq((3, "dev2")).toDF("id", "s"), t,
      toBranch = Some("dev"))
    // main reads are untouched
    assert(IcebergTable.read(spark, t).as[(Int, String)].collect().toSet ===
      Set((1, "main1")))
    // the branch head accumulates BOTH branch commits
    assert(IcebergTable.refSnapshotId(spark, t, "dev") === head)
    val branchRows = IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(head)).as[(Int, String)].collect().toSet
    assert(branchRows === Set((1, "main1"), (2, "dev1"), (3, "dev2")))
    // SQL reads resolve the branch by name
    spark.conf.set("spark.sql.catalog.graftbr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftbr.root",
      new java.io.File(t).getParent)
    assert(spark.sql("SELECT * FROM graftbr.t VERSION AS OF 'dev'")
      .count() === 3L)
    // publish: main fast-forwards to the branch head
    val pub = spark.sql(s"CALL graft.system.publish_branch('$t', 'dev')")
      .head.getString(1).toLong
    assert(pub === head)
    assert(IcebergTable.read(spark, t).count() === 3L)
    // writing to a TAG refuses
    IcebergTable.createTag(spark, t, "rel", head)
    intercept[IllegalArgumentException] {
      IcebergTable.write(spark, Seq((9, "x")).toDF("id", "s"), t,
        toBranch = Some("rel"))
    }
  }

  test("publish refuses when main diverged from the branch fork point") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "a")).toDF("id", "s"), t)
    IcebergTable.createBranch(spark, t, "dev",
      IcebergTable.snapshot(spark, t).snapshotId)
    IcebergTable.write(spark, Seq((2, "dev")).toDF("id", "s"), t,
      toBranch = Some("dev"))
    IcebergTable.write(spark, Seq((3, "main")).toDF("id", "s"), t) // diverge
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.publishBranch(spark, t, "dev")
    }
    assert(e.kind === "ConcurrentWrite")
    // main keeps its own history
    assert(IcebergTable.read(spark, t).as[(Int, String)].collect().toSet ===
      Set((1, "a"), (3, "main")))
  }

  test("write-audit-publish: staged snapshot invisible until publish") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "prod")).toDF("id", "s"), t)
    IcebergTable.setProperties(spark, t, Map("write.wap.enabled" -> "true"))
    spark.conf.set("spark.wap.id", "audit-42")
    val stagedId =
      try IcebergTable.write(spark, Seq((2, "audit")).toDF("id", "s"), t)
      finally spark.conf.unset("spark.wap.id")
    // main reads see ONLY the published state
    assert(IcebergTable.read(spark, t).as[(Int, String)].collect().toSet ===
      Set((1, "prod")))
    // the auditor reads the staged snapshot by id
    assert(IcebergTable.read(spark, t, snapshotIdAsOf = Some(stagedId))
      .as[(Int, String)].collect().toSet === Set((1, "prod"), (2, "audit")))
    // expire never reaps an unpublished audit snapshot
    IcebergTable.expireSnapshots(spark, t, keepSnapshots = 1)
    assert(IcebergTable.snapshotIds(spark, t).contains(stagedId))
    // publish fast-forwards main to it
    val pub = IcebergTable.publishWap(spark, t, "audit-42")
    assert(pub === stagedId)
    assert(IcebergTable.read(spark, t).as[(Int, String)].collect().toSet ===
      Set((1, "prod"), (2, "audit")))
    // double publish refuses
    intercept[IllegalArgumentException] {
      IcebergTable.publishWap(spark, t, "audit-42")
    }
  }

  test("publish refuses when the table advanced past the staged parent") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, "prod")).toDF("id", "s"), t)
    IcebergTable.setProperties(spark, t, Map("write.wap.enabled" -> "true"))
    spark.conf.set("spark.wap.id", "audit-9")
    try IcebergTable.write(spark, Seq((2, "audit")).toDF("id", "s"), t)
    finally spark.conf.unset("spark.wap.id")
    IcebergTable.write(spark, Seq((3, "raced")).toDF("id", "s"), t)
    val e = intercept[IcebergTable.CommitConflictException] {
      IcebergTable.publishWap(spark, t, "audit-9")
    }
    assert(e.kind === "ConcurrentWrite")
  }

  test("type promotion: int→long reads old files; time travel keeps the narrow type") {
    val t = tmp()
    IcebergTable.write(spark, Seq((1, 10), (2, 20)).toDF("id", "qty"), t)
    val v1 = IcebergTable.snapshot(spark, t).snapshotId
    IcebergTable.updateColumnType(spark, t, "qty", LongType)
    val widened = IcebergTable.read(spark, t)
    assert(widened.schema("qty").dataType === LongType)
    assert(widened.as[(Int, Long)].collect().toSet === Set((1, 10L), (2, 20L)))
    // new appends write the widened type; old + new read together
    IcebergTable.write(spark,
      Seq((3, 5000000000L)).toDF("id", "qty"), t)
    assert(IcebergTable.read(spark, t).as[(Int, Long)].collect().toSet ===
      Set((1, 10L), (2, 20L), (3, 5000000000L)))
    // time travel serves the PRE-promotion snapshot with the old type
    val old = IcebergTable.read(spark, t, snapshotIdAsOf = Some(v1))
    assert(old.schema("qty").dataType === IntegerType)
    // illegal changes refuse
    intercept[IllegalArgumentException] {
      IcebergTable.updateColumnType(spark, t, "id", DoubleType)
    }
    intercept[IllegalArgumentException] {
      IcebergTable.updateColumnType(spark, t, "qty",
        IntegerType) // narrowing target isn't even a legal promotion type
    }
  }

  test("type promotion: float→double and decimal precision widening") {
    val t = tmp()
    val df = Seq((1, 1.5f, BigDecimal("12.34")), (2, 2.5f, BigDecimal("56.78")))
      .toDF("id", "ratio", "amt")
      .withColumn("amt", col("amt").cast(DecimalType(10, 2)))
    IcebergTable.write(spark, df, t)
    IcebergTable.updateColumnType(spark, t, "ratio", DoubleType)
    IcebergTable.updateColumnType(spark, t, "amt", DecimalType(20, 2))
    val got = IcebergTable.read(spark, t)
    assert(got.schema("ratio").dataType === DoubleType)
    assert(got.schema("amt").dataType === DecimalType(20, 2))
    assert(got.select(sum(col("ratio"))).head.getDouble(0) === 4.0)
    assert(got.select(sum(col("amt"))).head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("69.12")) === 0)
    // scale change refuses (not a spec promotion)
    intercept[IllegalArgumentException] {
      IcebergTable.updateColumnType(spark, t, "amt", DecimalType(22, 4))
    }
  }
}
