package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ONE parquet-Group → Spark-internal value decode matrix, shared by
  * every record-API reader in the engine ([[GraftRowReader]] — the
  * catalog's DV/debug path — and [[TxnTailReader]] — the streaming tail
  * and batch change feed). Covers the full flat type surface the catalog
  * serves: integral/floating/boolean/string/binary, DATE (INT32 epoch
  * days), TIMESTAMP and TIMESTAMP_NTZ (INT96 julian or annotated INT64 in
  * millis/micros/nanos → epoch micros), and DECIMAL (INT32/INT64/binary
  * unscaled at the FILE's declared scale, rescaled to the table's), plus
  * the narrow-file up-conversions type widening leaves behind
  * (INT32→long, FLOAT→double). */
private[sources] object GroupDecode {

  /** One parsed Hadoop configuration per JVM (core-default/core-site XML
    * parse is milliseconds); every reader takes a cheap COPY — at
    * thousands of tasks per scan, per-reader re-parsing is pure waste. */
  private lazy val baseConf = new org.apache.hadoop.conf.Configuration()
  private[sources] def freshConf(): org.apache.hadoop.conf.Configuration =
    new org.apache.hadoop.conf.Configuration(baseConf)


  /** Decode field `fi` (repetition already checked non-empty) of `g` under
    * requested Spark type `dt`; `prim` is the FILE's primitive type for
    * that field (physical encoding + logical annotation). */
  def value(g: Group, fi: Int, prim: PrimitiveType, dt: DataType): Any = {
    def p = prim.getPrimitiveTypeName
    dt match {
      case LongType =>
        if (p == PrimitiveTypeName.INT32) g.getInteger(fi, 0).toLong
        else g.getLong(fi, 0)
      case IntegerType => g.getInteger(fi, 0)
      case ShortType   => g.getInteger(fi, 0).toShort
      case ByteType    => g.getInteger(fi, 0).toByte
      case DoubleType =>
        if (p == PrimitiveTypeName.FLOAT) g.getFloat(fi, 0).toDouble
        else g.getDouble(fi, 0)
      case FloatType   => g.getFloat(fi, 0)
      case BooleanType => g.getBoolean(fi, 0)
      case StringType  => UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
      case BinaryType  => g.getBinary(fi, 0).getBytes
      case DateType    => g.getInteger(fi, 0) // INT32 epoch days
      case TimestampType | TimestampNTZType =>
        // Spark internal = Long epoch micros for both; the file carries
        // INT96 (legacy julian) or INT64 in its annotation's unit
        if (p == PrimitiveTypeName.INT96) {
          val buf = java.nio.ByteBuffer.wrap(g.getInt96(fi, 0).getBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = buf.getLong
          val julianDay = buf.getInt
          (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
        } else {
          val v = g.getLong(fi, 0)
          prim.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => Math.multiplyExact(v, 1000L)
                case LogicalTypeAnnotation.TimeUnit.MICROS => v
                case LogicalTypeAnnotation.TimeUnit.NANOS  => Math.floorDiv(v, 1000L)
              }
            case _ => v // unannotated INT64: stored micros (our writer)
          }
        }
      case d: DecimalType =>
        // unscaled value at the FILE's declared scale (equal to the table
        // scale for graft-written files; honoring the annotation keeps
        // widened/foreign files exact)
        val fScale = prim.getLogicalTypeAnnotation match {
          case a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => a.getScale
          case _ => d.scale
        }
        val jbd = p match {
          case PrimitiveTypeName.INT32 =>
            java.math.BigDecimal.valueOf(g.getInteger(fi, 0).toLong, fScale)
          case PrimitiveTypeName.INT64 =>
            java.math.BigDecimal.valueOf(g.getLong(fi, 0), fScale)
          case _ => new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(fi, 0).getBytes), fScale)
        }
        Decimal(jbd.setScale(d.scale), d.precision, d.scale)
      case other => sys.error(s"graft: unsupported column type $other")
    }
  }
}
