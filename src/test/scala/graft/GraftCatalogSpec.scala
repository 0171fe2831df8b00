package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLog, IcebergTable, VersionedTable}

/** Three-level SQL naming over the DSv2 catalog: plain parquet,
  * VersionedTable and native-Delta table flavors all resolve as
  * `graft_t.<schema>.<table>`, with time-travel SQL on the flavors
  * that version. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.graft_t", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_t.root", r)
    r
  }

  test("gold-layer tables resolve by name for all three storage flavors") {
    // plain parquet directory
    Seq((1L, "ann"), (2L, "bob")).toDF("c_key", "c_name")
      .write.parquet(s"$root/gold/dim_customers")
    // versioned table
    VersionedTable.write(Seq((10L, "p1"), (20L, "p2")).toDF("p_key", "p_name"),
      s"$root/gold/dim_parts")
    // real Delta log (via the export writer)
    val vt = Files.createTempDirectory("graft-cat-vt").toString + "/t"
    VersionedTable.write(Seq((100L, 5L)).toDF("o_key", "qty"), vt)
    DeltaLog.exportFromVersioned(spark, vt, s"$root/gold/fact_sales")

    assert(spark.sql("SELECT c_name FROM graft_t.gold.dim_customers ORDER BY c_key")
      .as[String].collect().toSeq === Seq("ann", "bob"))
    assert(spark.sql("SELECT p_name FROM graft_t.gold.dim_parts ORDER BY p_key")
      .as[String].collect().toSeq === Seq("p1", "p2"))
    assert(spark.sql("SELECT qty FROM graft_t.gold.fact_sales")
      .as[Long].collect().toSeq === Seq(5L))
    // joins across flavors through pure SQL
    assert(spark.sql(
      """SELECT c.c_name FROM graft_t.gold.dim_customers c
        |JOIN graft_t.gold.dim_parts p ON c.c_key * 10 = p.p_key
        |ORDER BY c.c_key""".stripMargin).as[String].collect().toSeq
      === Seq("ann", "bob"))
    // catalog surface
    assert(spark.sql("SHOW TABLES IN graft_t.gold").count() === 3)
    assert(spark.sql("SHOW NAMESPACES IN graft_t").as[String].collect()
      .contains("gold"))
  }

  test("VERSION AS OF travels versioned and delta flavors; filters push down") {
    VersionedTable.write(Seq((1L, "v1")).toDF("k", "v"), s"$root/silver/events")
    VersionedTable.write(Seq((1L, "v2")).toDF("k", "v"), s"$root/silver/events",
      overwrite = true)
    assert(spark.sql("SELECT v FROM graft_t.silver.events").as[String].head()
      === "v2")
    assert(spark.sql("SELECT v FROM graft_t.silver.events VERSION AS OF 1")
      .as[String].head() === "v1")
    // delta flavor time travel (delta versions are 0-based)
    val vt = Files.createTempDirectory("graft-cat-tt").toString + "/t"
    VersionedTable.write(Seq(Tuple1("a")).toDF("x"), vt)
    VersionedTable.write(Seq(Tuple1("b")).toDF("x"), vt, overwrite = true)
    DeltaLog.exportFromVersioned(spark, vt, s"$root/silver/delta_ev")
    assert(spark.sql("SELECT x FROM graft_t.silver.delta_ev VERSION AS OF 0")
      .as[String].head() === "a")
    assert(spark.sql("SELECT x FROM graft_t.silver.delta_ev").as[String].head()
      === "b")
    // native parquet scan: the filter reaches the file format
    val plan = spark.sql(
      "SELECT k FROM graft_t.silver.events WHERE k = 1").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,1)]"), plan)
  }

  test("saveAsTable + INSERT INTO create and extend catalog tables") {
    root // force catalog registration
    // the pure-V2 writer API needs no conf
    Seq((1L, "x")).toDF("id", "s").writeTo("graft_t.bronze.raw_v2").create()
    assert(spark.sql("SELECT s FROM graft_t.bronze.raw_v2").as[String].head()
      === "x")
    // DataFrameWriter.saveAsTable (the reference's API) only routes
    // file sources to a V2 catalog when parquet is off the V1
    // fallback list — scope the toggle to this test
    val old = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      Seq((1L, "x")).toDF("id", "s").write.saveAsTable("graft_t.bronze.raw")
      spark.sql("INSERT INTO graft_t.bronze.raw VALUES (2, 'y')")
      assert(spark.sql("SELECT s FROM graft_t.bronze.raw ORDER BY id")
        .as[String].collect().toSeq === Seq("x", "y"))
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", old)
    // drop removes the directory
    spark.sql("DROP TABLE graft_t.bronze.raw")
    assert(!new java.io.File(s"$root/bronze/raw").exists())
  }

  test("ALTER TABLE ADD COLUMN: versioned, delta and plain flavors") {
    // versioned flavor: DDL commits a schema-evolving version
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      s"$root/ddl/vt")
    spark.sql("ALTER TABLE graft_t.ddl.vt ADD COLUMN score DOUBLE")
    assert(spark.sql("SELECT k, v, score FROM graft_t.ddl.vt ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq
      === Seq((1L, "a", None), (2L, "b", None)))
    // old snapshot still reads with its own schema
    assert(spark.sql("SELECT * FROM graft_t.ddl.vt VERSION AS OF 1")
      .columns.toSeq === Seq("k", "v"))
    // new writes carry the column (writeEvolve machinery)
    VersionedTable.writeEvolve(Seq((3L, "c", 0.5)).toDF("k", "v", "score"),
      s"$root/ddl/vt")
    assert(spark.sql("SELECT score FROM graft_t.ddl.vt WHERE k = 3")
      .as[Double].head() === 0.5)

    // delta flavor: DDL commits a metaData-only version
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), s"$root/ddl/dt")
    spark.sql("ALTER TABLE graft_t.ddl.dt ADD COLUMN n BIGINT")
    // existing files read the column as null via schema-on-read
    assert(spark.sql("SELECT k, v, n FROM graft_t.ddl.dt")
      .as[(Long, String, Option[Long])].collect().toSeq
      === Seq((1L, "a", None)))
    // the pre-DDL version still reads narrow
    assert(spark.sql("SELECT * FROM graft_t.ddl.dt VERSION AS OF 0")
      .columns.toSeq === Seq("k", "v"))
    // appends are now gated on the widened schema...
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), s"$root/ddl/dt")
    }
    // ...and a widened append round-trips
    DeltaLog.write(spark, Seq((2L, "b", 7L)).toDF("k", "v", "n"), s"$root/ddl/dt")
    assert(spark.sql("SELECT k, n FROM graft_t.ddl.dt ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq
      === Seq((1L, None), (2L, Some(7L))))

    // iceberg flavor: DDL appends a new schema-id (real evolution)
    IcebergTable.write(spark, Seq((1L, "a")).toDF("k", "v"),
      s"$root/ddl/it")
    spark.sql("ALTER TABLE graft_t.ddl.it ADD COLUMN w DOUBLE")
    assert(spark.sql("SELECT k, v, w FROM graft_t.ddl.it")
      .as[(Long, String, Option[Double])].collect().toSeq
      === Seq((1L, "a", None)))
    // the pre-DDL snapshot still reads narrow via time travel
    val snap1 = IcebergTable.snapshotIds(spark, s"$root/ddl/it").head
    assert(spark.sql(s"SELECT * FROM graft_t.ddl.it VERSION AS OF $snap1")
      .columns.toSeq === Seq("k", "v"))
    // a widened INSERT round-trips through the committing writer
    spark.sql("INSERT INTO graft_t.ddl.it VALUES (2, 'b', 0.5)")
    assert(spark.sql("SELECT k, w FROM graft_t.ddl.it ORDER BY k")
      .as[(Long, Option[Double])].collect().toSeq
      === Seq((1L, None), (2L, Some(0.5))))

    // plain flavor: sidecar records the widened schema
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$root/ddl/pt")
    spark.sql("ALTER TABLE graft_t.ddl.pt ADD COLUMN extra STRING")
    assert(spark.sql("SELECT id, s, extra FROM graft_t.ddl.pt")
      .as[(Long, String, Option[String])].collect().toSeq
      === Seq((1L, "x", None)))
    // duplicate column is a loud error on every flavor
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.ddl.pt ADD COLUMN extra STRING")
    }
    // non-AddColumn changes stay loudly unsupported
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.ddl.pt DROP COLUMN extra")
    }
  }

  test("log-backed flavors take committing SQL writes, never a bare parquet dump") {
    // a raw DSv2 write into a Delta/versioned/Iceberg directory would
    // dump files the log never references — instead INSERT routes
    // through the flavor's committing writer, and the new rows are
    // visible to the NATIVE reader (i.e. the log references them)
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), s"$root/ro/vt")
    val vt2 = java.nio.file.Files.createTempDirectory("cat-ro").toString + "/t"
    VersionedTable.write(Seq((2L, "b")).toDF("k", "v"), vt2)
    DeltaLog.exportFromVersioned(spark, vt2, s"$root/ro/dt")
    IcebergTable.exportFromVersioned(spark, vt2, s"$root/ro/it")
    for (t <- Seq("vt", "dt", "it")) {
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_t.ro.$t")
        .as[Long].head() === 1L)
      spark.sql(s"INSERT INTO graft_t.ro.$t VALUES (9, 'z')")
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_t.ro.$t")
        .as[Long].head() === 2L)
    }
    // native readers see the committed rows (the log references them)
    assert(VersionedTable.read(spark, s"$root/ro/vt")
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (9L, "z")))
    assert(DeltaLog.read(spark, s"$root/ro/dt")
      .as[(Long, String)].collect().toSet === Set((2L, "b"), (9L, "z")))
    assert(IcebergTable.read(spark, s"$root/ro/it")
      .as[(Long, String)].collect().toSet === Set((2L, "b"), (9L, "z")))
    // the versioned + delta INSERTs committed a NEW version (history)
    assert(VersionedTable.currentVersion(spark, s"$root/ro/vt") === 2L)
    assert(DeltaLog.snapshot(spark, s"$root/ro/dt").version === 1L)
  }
}
