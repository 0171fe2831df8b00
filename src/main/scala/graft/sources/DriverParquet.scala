package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.OutputFile
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** DRIVER-side parquet writing of DRIVER-HELD Spark rows through
  * Spark's OWN [[ParquetWriteSupport]] — the bytes match what a Spark
  * task writes for the same rows (same schema conversion, same
  * encodings, same footer metadata keys), without the one-task Spark
  * job (task-binary broadcast + launch + commit) that
  * `createDataFrame(rows).coalesce(1).write.parquet` costs per call.
  * Used for METADATA-sized artifacts the commit path builds on the
  * driver anyway (Delta checkpoint parts); callers own the bound. */
private[sources] object DriverParquet {
  private final class IRBuilder(out: OutputFile)
    extends ParquetWriter.Builder[InternalRow, IRBuilder](out) {
    override def self(): IRBuilder = this
    override def getWriteSupport(conf: Configuration)
    : WriteSupport[InternalRow] = new ParquetWriteSupport
  }

  /** Write `rows` (external Rows matching `schema`) as ONE parquet
    * file at `dest` (snappy — Spark's default codec). */
  def write(spark: SparkSession, dest: Path, schema: StructType,
            rows: Seq[Row]): Unit = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // the session knobs ParquetFileFormat.prepareWrite publishes for
    // the task-side writer — same values, same output
    val sql = spark.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    val variantKey = "spark.sql.parquet.variant.annotateLogicalType.enabled"
    conf.set(variantKey, sql.getConfString(variantKey, "false"))
    ParquetWriteSupport.setSchema(schema, conf)
    val toInternal = CatalystTypeConverters.createToCatalystConverter(schema)
    val writer = new IRBuilder(HadoopOutputFile.fromPath(dest, conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach(r => writer.write(toInternal(r).asInstanceOf[InternalRow]))
    finally writer.close()
  }
}
