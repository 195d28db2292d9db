package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.sources.AvroOcf

/** `avro_ocf_encode(records)` — pack an ordered array<struct<...>> into ONE
  * complete Avro Object Container File (binary): magic, schema metadata,
  * deterministic sync marker, one data block. The Avro schema is derived
  * from the Catalyst element type (see [[graft.sources.AvroOcf]] for the
  * supported subset).
  *
  * Why an Expression (guide preference (b)) and not a driver loop: file
  * assembly runs WHERE the grouped records live — producing a 100 TB
  * corpus's archive files is embarrassingly parallel and never funnels
  * through the driver. CodegenFallback: the kernel is byte-buffer assembly
  * per FILE, amortized across every record in it — codegen would inline
  * nothing useful.
  */
case class AvroOcfEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<...>>, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "avro_ocf_encode"

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val rows = (0 until n).iterator.map(i => arr.getStruct(i, elemType.length))
    AvroOcf.encodeFile(elemType, rows)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroOcfEncode =
    copy(child = newChild)
}

/** `avro_ocf_decode(file_bytes, 'ddl')` — unpack a complete Avro OCF into
  * array<struct<...>> shaped by the DDL string literal (the `from_json`
  * convention: schema-on-read is declared, never inferred — inference at
  * 100 TB means reading the corpus twice). The file's embedded schema must
  * agree on field names/order/types or the decode fails loudly; its unions
  * drive null parsing. `null` and `deflate` codecs accepted. */
case class AvroOcfDecode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private lazy val declared: StructType = StructType.fromDDL(
    right.eval(InternalRow.empty).toString)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable string DDL schema as its 2nd argument")
    else TypeCheckResult.TypeCheckSuccess

  // every field nullable in the OUTPUT type: the file's unions decide
  // per-file; a reader must not promise tighter than the declaration
  override def dataType: DataType = ArrayType(
    StructType(declared.fields.map(_.copy(nullable = true))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "avro_ocf_decode"

  override def nullSafeEval(input: Any, ddl: Any): Any = {
    val rows = AvroOcf.decodeFile(declared, input.asInstanceOf[Array[Byte]])
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AvroOcfDecode =
    copy(left = newLeft, right = newRight)
}
