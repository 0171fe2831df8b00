package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.IcebergTable

/** Post-commit metadata cleanup (`write.metadata.delete-after-commit
  * .enabled` + `write.metadata.previous-versions-max`): superseded
  * `v<N>.metadata.json` files reap after each commit, the directory
  * stays bounded, and everything that matters — reads, appends,
  * snapshot time travel — keeps working. */
class IcebergMetadataCleanupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("icemeta").toString + "/t"

  private def metaFiles(t: String): Seq[Long] = {
    val mdir = new Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new Path(mdir, "v*.metadata.json")).toSeq
      .map(_.getPath.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong).sorted
  }

  test("metadata files stay bounded under the property; disabled keeps everything") {
    val t = tmp()
    IcebergTable.write(spark, Seq((0L, "seed")).toDF("k", "v"), t)
    // DISABLED (default): every commit keeps its metadata file
    (1 to 5).foreach(i =>
      IcebergTable.write(spark, Seq((i.toLong, s"r$i")).toDF("k", "v"), t))
    assert(metaFiles(t).size === 6)

    IcebergTable.setProperties(spark, t, Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "3"))
    (6 to 15).foreach(i =>
      IcebergTable.write(spark, Seq((i.toLong, s"r$i")).toDF("k", "v"), t))
    val vs = metaFiles(t)
    // previous-versions-max = 3 PREVIOUS files + the current one
    assert(vs.size === 4, s"expected 4 retained metadata files, got $vs")
    // the retained set is the newest tail
    assert(vs === (vs.max - 3 to vs.max))

    // reads, appends and SNAPSHOT time travel all survive the reap
    assert(IcebergTable.read(spark, t).count() === 16L)
    val earlySnap = IcebergTable.snapshotIds(spark, t).head
    assert(IcebergTable.read(spark, t,
      snapshotIdAsOf = Some(earlySnap)).count() === 1L)
    IcebergTable.write(spark, Seq((99L, "z")).toDF("k", "v"), t)
    assert(IcebergTable.read(spark, t).count() === 17L)
    assert(metaFiles(t).size === 4)

    // the metadata-log inside the current file trims to the bound too
    val mdir = new Path(t, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = new Path(mdir, s"v${metaFiles(t).max}.metadata.json")
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = { val in = fs.open(top)
      try M.readTree(in) finally in.close() }
    import scala.jdk.CollectionConverters._
    val logSize = Option(root.get("metadata-log")).toSeq
      .flatMap(_.elements().asScala).size
    assert(logSize <= 3, s"metadata-log kept $logSize entries")
  }
}
