package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Driver-side position-delete parquet I/O ([[PosDeleteIo]]): the MOR
  * commit path writes the gate-bounded (file_path, pos) list with
  * parquet-mr on the driver (no Spark job), and delete-file compaction
  * merges gate-bounded piles the same way. The files must stay
  * bit-compatible consumers-side: Spark's vectorized reader serves
  * them through the normal MOR read, and foreign `required`-repetition
  * files read back through the projection support. */
class PosDeleteIoSpec extends graft.SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  test("writeSorted round-trips through Spark, spec-sorted, snappy") {
    val dir = Files.createTempDirectory("graft-pdio").toString
    val dst = new Path(dir, "pd-0.parquet")
    // deliberately unsorted input with a duplicate-free mixed order
    val rows = Seq(("file:/b.parquet", 7L), ("file:/a.parquet", 9L),
      ("file:/a.parquet", 2L), ("file:/b.parquet", 1L))
    assert(PosDeleteIo.writeSorted(conf, dst, rows) === 4L)
    val back = spark.read.parquet(dst.toString)
    assert(back.schema.fieldNames.toSeq === Seq("file_path", "pos"))
    // file order IS the spec order (file_path utf8, then pos)
    val inFileOrder = back.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(inFileOrder.toSeq === Seq(("file:/a.parquet", 2L),
      ("file:/a.parquet", 9L), ("file:/b.parquet", 1L),
      ("file:/b.parquet", 7L)))
  }

  test("readAll serves optional (ours) and required (foreign) repetitions + extra columns") {
    val dir = Files.createTempDirectory("graft-pdio2").toString
    val ours = new Path(dir, "ours.parquet")
    PosDeleteIo.writeSorted(conf, ours, Seq(("f1", 1L), ("f2", 2L)))
    // a foreign-engine-shaped file: required repetitions + an extra
    // trailing column (the spec's optional `row` payload stand-in)
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      "message iceberg_delete { required binary file_path (UTF8); " +
        "required int64 pos; optional int32 extra; }")
    val foreign = new Path(dir, "foreign.parquet")
    val c = new org.apache.hadoop.conf.Configuration(conf)
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(foreign, c))
      .withConf(c).withType(schema).build()
    val fac = new SimpleGroupFactory(schema)
    try Seq(("f3", 3L), ("f4", 4L)).foreach { case (p, ri) =>
      val g = fac.newGroup()
      g.append("file_path", p); g.append("pos", ri); g.append("extra", 1)
      w.write(g)
    } finally w.close()
    val got = PosDeleteIo.readAll(conf,
      Seq(ours.toString, foreign.toString)).sorted
    assert(got === Seq(("f1", 1L), ("f2", 2L), ("f3", 3L), ("f4", 4L)))
  }

  test("MOR DELETE stages a driver-written file; read + time travel unchanged") {
    val t = Files.createTempDirectory("graft-pdio3").toString + "/t"
    val df = (1 to 300).map(i => (i, s"r$i")).toDF("id", "s")
    IcebergTable.write(spark, df.repartition(3), t)
    IcebergTable.delete(spark, t, col("id") % 5 === 0)
    val snap = IcebergTable.snapshot(spark, t)
    val del = snap.deletes.filter(_.content == 1)
    assert(del.size === 1 && del.head.records === 60L)
    assert(del.head.pathBounds.isDefined)
    val got = IcebergTable.read(spark, t).as[(Int, String)].collect().toSet
    assert(got === (1 to 300).filter(_ % 5 != 0)
      .map(i => (i, s"r$i")).toSet)
    // the staged file itself is spec-shaped and Spark-readable
    val raw = spark.read.parquet(del.head.path)
      .as[(String, Long)].collect()
    assert(raw.length === 60 && raw.map(_._2).forall(_ >= 0L))
  }

  test("delete-file compaction: driver merge (under gate) == distributed merge (forced)") {
    def build(): String = {
      val t = Files.createTempDirectory("graft-pdio4").toString + "/t"
      val df = (1 to 400).map(i => (i, s"r$i", i % 7)).toDF("id", "s", "g")
      IcebergTable.write(spark, df.repartition(4), t)
      IcebergTable.delete(spark, t, col("id") % 11 === 0)
      IcebergTable.delete(spark, t, col("id") % 13 === 0)
      IcebergTable.delete(spark, t, col("id") % 11 === 0 || col("id") % 3 === 0)
      t
    }
    def fold(t: String): (Long, Set[(Int, String, Int)], Seq[(String, String)]) = {
      IcebergTable.rewritePositionDeleteFiles(spark, t)
      val after = IcebergTable.snapshot(spark, t)
      val dels = after.deletes.filter(_.content == 1)
      assert(dels.size === 1)
      (dels.head.records,
        IcebergTable.read(spark, t).as[(Int, String, Int)].collect().toSet,
        dels.map(_.pathBounds.get))
    }
    val (nD, rowsD, _) = fold(build())            // driver path (under gate)
    val t2 = build()
    spark.conf.set("spark.graft.mor.maxDeleteRows", "10") // force distributed
    val (nX, rowsX, _) =
      try fold(t2)
      finally spark.conf.unset("spark.graft.mor.maxDeleteRows")
    assert(nD === nX, "merged row count must not depend on the merge path")
    assert(rowsD === rowsX)
  }
}
