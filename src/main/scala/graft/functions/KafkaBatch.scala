package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.streaming.KafkaFraming

/** `kafka_batch_encode(records, base_offset)` — pack an ordered
  * array<struct<ts: bigint, key: binary, value: binary>> into ONE Kafka
  * RecordBatch v2 frame (binary), offsets `base_offset + position`.
  *
  * Why an Expression (guide preference (b)) and not a driver loop: framing
  * runs WHERE the grouped records live — the batch assembly is a per-row
  * kernel over the grouped relation, so producing a 100 TB corpus's frames
  * is embarrassingly parallel and never funnels through the driver.
  * CodegenFallback: the kernel is byte-buffer assembly per BATCH (not per
  * field), so interpreter dispatch is amortized across the whole frame —
  * codegen would inline nothing useful.
  */
case class KafkaBatchEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def okElem(t: DataType): Boolean = t match {
    case StructType(fs) =>
      fs.length == 3 && fs(0).dataType == LongType &&
        fs(1).dataType == BinaryType && fs(2).dataType == BinaryType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(et, _) if okElem(et) && right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<bigint,binary,binary>>, bigint), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kafka_batch_encode"

  override def nullSafeEval(a: Any, o: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val recs = (0 until n).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0),
        if (r.isNullAt(1)) null else r.getBinary(1),
        if (r.isNullAt(2)) null else r.getBinary(2))
    }
    KafkaFraming.encodeBatch(o.asInstanceOf[Long], recs)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KafkaBatchEncode =
    copy(left = newLeft, right = newRight)
}

/** `kafka_batch_decode(frame)` — unpack Kafka RecordBatch v2 frames
  * (binary, possibly several batches back-to-back) into
  * array<struct<offset, ts_ms, key, value>>. CRC32C-validated; fails
  * loudly on corruption or compressed batches (see
  * [[graft.streaming.KafkaFraming]]). */
case class KafkaBatchDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kafka_batch_decode"

  override def nullSafeEval(input: Any): Any = {
    val recs = KafkaFraming.decode(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(recs.map(r =>
      InternalRow(r.offset, r.timestampMs, r.key, r.value)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): KafkaBatchDecode =
    copy(child = newChild)
}
