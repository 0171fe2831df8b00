package graft.sources

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

/** Executor-side MOR serving contracts that don't need a table. */
class MorServingSpec extends graft.SparkSpec {

  test("an equality column set unseen at factory build refuses with a restart pointer (never a silent miss)") {
    val factory = new MorReaderFactory(null, null,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val fp = FilePartition(0, Array(PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString("/nope.parquet"), 0L, 1L,
      Array.empty[String], 0L, 1L, Map.empty)))
    val e = intercept[UnsupportedOperationException] {
      factory.createReader(IcebergRowDiffPartition(fp, "/nope.parquet",
        select = false, Nil, Nil,
        selEq = Seq(EqDeleteRef("/eq.parquet", 1L, Seq("k")))))
    }
    assert(e.getMessage.contains("restart"), e.getMessage)
  }
}
