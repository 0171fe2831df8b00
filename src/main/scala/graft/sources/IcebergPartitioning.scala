package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{IcebergBucket, IcebergTransforms}

/** Iceberg HIDDEN PARTITIONING (spec §"Partition Transforms"): a
  * partition field is `transform(source column)`, so writers lay data
  * out by derived values (`day(ts)`, `bucket(16, id)`, …) and readers
  * prune on the SOURCE column's predicates without the query ever
  * naming the partition field — the property that makes real Iceberg
  * tables skip-scan time ranges at 100 TB.
  *
  * `partitionBy` specs parse from the engine-conventional strings:
  * `col` (identity), `year(col)`/`years(col)`, `month(col)`,
  * `day(col)`/`days(col)`, `hour(col)`/`hours(col)`,
  * `bucket(N, col)`, `truncate(W, col)`. Field names follow the Java
  * implementation's defaults (`<col>_day`, `<col>_bucket`, …).
  *
  * Pruning soundness: the time transforms and `truncate` are
  * MONOTONE — `src >= v` implies `T(src) >= T(v)` — so comparison
  * conjuncts keep exactly the files whose transformed tuple can
  * satisfy them; `bucket` prunes equality/IN only. Foreign transforms
  * (unknown names) read correctly UNpruned. */
private[graft] object IcebergPartitioning {

  /** One partition-spec field. `transform` is the spec-JSON name
    * (`identity`, `year`, `month`, `day`, `hour`, `bucket[N]`,
    * `truncate[W]`); `param` the N/W; `fieldId` the spec's partition
    * field id (1000+ per the Iceberg convention; -1 = not yet
    * assigned — writers then stamp positional 1000+i). Field ids are
    * STABLE across spec evolution: a field keeps its id in every
    * spec that carries it. */
  final case class PartField(name: String, transform: String,
                             source: String, param: Int = 0,
                             fieldId: Int = -1) {
    def isIdentity: Boolean = transform == "identity"
    /** The canonical partitionBy string that parses back to this. */
    def canonical: String = transform match {
      case "identity" => source
      case "year" | "month" | "day" | "hour" => s"$transform($source)"
      case t if t.startsWith("bucket[") => s"bucket($param, $source)"
      case t if t.startsWith("truncate[") => s"truncate($param, $source)"
      case t => s"$t($source)" // foreign — survives round trips, never written
    }
  }

  private val TimeRe = "(?i)(years?|months?|days?|hours?)\\(\\s*(\\w+)\\s*\\)".r
  private val BucketRe = "(?i)bucket\\(\\s*(\\d+)\\s*,\\s*(\\w+)\\s*\\)".r
  private val TruncRe = "(?i)truncate\\(\\s*(\\d+)\\s*,\\s*(\\w+)\\s*\\)".r

  def parse(s: String): PartField = s.trim match {
    case TimeRe(t, c) =>
      val tf = t.toLowerCase.stripSuffix("s")
      PartField(s"${c}_$tf", tf, c)
    case BucketRe(n, c) => PartField(s"${c}_bucket", s"bucket[$n]", c, n.toInt)
    case TruncRe(w, c) => PartField(s"${c}_trunc", s"truncate[$w]", c, w.toInt)
    case c => PartField(c, "identity", c)
  }

  /** Rebuild a PartField from the metadata spec JSON's
    * (name, transform, source column name[, field id]). */
  def fromJson(name: String, transform: String, source: String,
               fieldId: Int = -1): PartField = {
    val BucketJ = "bucket\\[(\\d+)\\]".r
    val TruncJ = "truncate\\[(\\d+)\\]".r
    transform match {
      case BucketJ(n) => PartField(name, transform, source, n.toInt, fieldId)
      case TruncJ(w) => PartField(name, transform, source, w.toInt, fieldId)
      case t => PartField(name, t, source, fieldId = fieldId)
    }
  }

  /** A transform this module can compute (stage + prune). Foreign
    * transforms still READ (generic tuple decode), just never prune. */
  def isKnown(pf: PartField): Boolean = pf.transform match {
    case "identity" | "year" | "month" | "day" | "hour" => true
    case t => t.startsWith("bucket[") || t.startsWith("truncate[")
  }

  /** The partition FIELD's type (what manifests record): time
    * transforms and bucket produce int; identity/truncate keep the
    * source type. */
  def resultType(pf: PartField, srcType: DataType): DataType = pf.transform match {
    case "identity" => srcType
    case "year" | "month" | "day" | "hour" => IntegerType
    case t if t.startsWith("bucket[") => IntegerType
    case t if t.startsWith("truncate[") => srcType
    case t => throw new UnsupportedOperationException(s"unknown transform $t")
  }

  /** Validate the source type for the transform — loud at write time,
    * per the spec's allowed-types table. */
  def requireSupported(pf: PartField, srcType: DataType): Unit = {
    def fail() = throw new UnsupportedOperationException(
      s"partition transform ${pf.canonical} does not support source type " +
        srcType.simpleString)
    pf.transform match {
      case "identity" => IcebergTable.partitionAvroType(srcType)
      case "year" | "month" | "day" => srcType match {
        case DateType | TimestampType => ()
        case _ => fail()
      }
      case "hour" => srcType match {
        case TimestampType => ()
        case _ => fail()
      }
      case t if t.startsWith("bucket[") => srcType match {
        case IntegerType | LongType | StringType | DateType | TimestampType => ()
        case _ => fail()
      }
      case t if t.startsWith("truncate[") => srcType match {
        case IntegerType | LongType | StringType => ()
        case _ => fail()
      }
      case t => throw new UnsupportedOperationException(s"unknown transform $t")
    }
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** The staging Column computing the transformed value — pure
    * builtin functions plus the codegen'd [[IcebergBucket]]; all
    * time math on the epoch timeline (zone-independent). */
  def stagingColumn(pf: PartField, srcType: DataType): Column = {
    val c = col(pf.source)
    def epochDay: Column = srcType match {
      case DateType => datediff(c, to_date(lit("1970-01-01")))
      case TimestampType =>
        floor(unix_micros(c).cast("double") / lit(MicrosPerDay.toDouble))
          .cast("int")
      case other => throw new UnsupportedOperationException(
        s"${pf.canonical}: unsupported source ${other.simpleString}")
    }
    def asDate: Column = srcType match {
      case DateType => c
      case _ => date_add(to_date(lit("1970-01-01")), epochDay)
    }
    pf.transform match {
      case "identity" => c
      case "day" => epochDay
      case "hour" =>
        floor(unix_micros(c).cast("double") / lit(MicrosPerHour.toDouble))
          .cast("int")
      case "year" => (year(asDate) - lit(1970)).cast("int")
      case "month" =>
        ((year(asDate) - lit(1970)) * lit(12) + month(asDate) - lit(1))
          .cast("int")
      case t if t.startsWith("bucket[") =>
        ColumnBridge.column(
          IcebergBucket(ColumnBridge.expression(c), pf.param))
      case t if t.startsWith("truncate[") => srcType match {
        case StringType => substring(c, 1, pf.param)
        case IntegerType =>
          (c - ((c % lit(pf.param)) + lit(pf.param)) % lit(pf.param))
            .cast("int")
        case LongType =>
          (c - ((c % lit(pf.param.toLong)) + lit(pf.param.toLong))
            % lit(pf.param.toLong)).cast("long")
        case other => throw new UnsupportedOperationException(
          s"truncate does not support ${other.simpleString}")
      }
      case t => throw new UnsupportedOperationException(s"unknown transform $t")
    }
  }

  /** Apply the transform to one CATALYST-internal literal value
    * (Int days for dates, Long micros for timestamps, UTF8String for
    * strings) — the driver-side pruning twin of [[stagingColumn]].
    * Returns the transformed value in tuple space. */
  def applyValue(pf: PartField, srcType: DataType, v: Any): Any = {
    if (v == null) return null
    def micros: Long = v match {
      case l: Long => l
      case i: Int => i.toLong * MicrosPerDay // date → micros at midnight
      case other => throw new IllegalArgumentException(s"bad time value $other")
    }
    def epochDay: Int = srcType match {
      case DateType => v.asInstanceOf[Int]
      case _ => Math.floorDiv(micros, MicrosPerDay).toInt
    }
    pf.transform match {
      case "identity" => v
      case "day" => epochDay
      case "hour" => Math.floorDiv(micros, MicrosPerHour).toInt
      case "year" =>
        java.time.LocalDate.ofEpochDay(epochDay.toLong).getYear - 1970
      case "month" =>
        val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case t if t.startsWith("bucket[") => srcType match {
        case IntegerType | DateType =>
          IcebergTransforms.bucketLong(v.asInstanceOf[Int].toLong, pf.param)
        case LongType | TimestampType =>
          IcebergTransforms.bucketLong(v.asInstanceOf[Long], pf.param)
        case StringType =>
          IcebergTransforms.bucketUtf8(v.asInstanceOf[UTF8String], pf.param)
        case other => throw new UnsupportedOperationException(
          s"bucket does not support ${other.simpleString}")
      }
      case t if t.startsWith("truncate[") => srcType match {
        case IntegerType =>
          val x = v.asInstanceOf[Int]; x - Math.floorMod(x, pf.param)
        case LongType =>
          val x = v.asInstanceOf[Long]; x - Math.floorMod(x, pf.param.toLong)
        case StringType =>
          val s = v.asInstanceOf[UTF8String].toString
          s.substring(0, math.min(pf.param, s.length))
        case other => throw new UnsupportedOperationException(
          s"truncate does not support ${other.simpleString}")
      }
      case t => throw new UnsupportedOperationException(s"unknown transform $t")
    }
  }

  /** Order-preserving transforms: `src cmp v` implies
    * `T(src) cmp T(v)` (weakened to >= / <=) — comparison pruning is
    * sound. Bucket is NOT monotone (equality/IN only). */
  def isMonotone(pf: PartField): Boolean = pf.transform match {
    case "year" | "month" | "day" | "hour" => true
    case t => t.startsWith("truncate[")
  }

  /** Total order on tuple-space values for monotone-transform
    * pruning (ints/longs/strings — the result types above). */
  def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    case (x, y) => x.toString.compareTo(y.toString)
  }
}
