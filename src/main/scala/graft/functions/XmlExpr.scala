package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.XmlCorpus

/** `xml_encode(records)` — serialize an ordered array<struct<all-string>>
  * into ONE XML document (binary): `<records><doc>…</doc>…</records>`,
  * one `<doc>` per struct, one child element per NON-NULL field (null =
  * element omitted, the XML idiom for absent), `@`-prefixed field names
  * become record attributes. The StAX writer escapes text, so `&<>` and
  * quotes survive — the whole point of the round-trip gate. Runs where
  * the grouped records live (the avro_ocf_encode contract). */
case class XmlEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _) if fs.nonEmpty && fs.forall(_.dataType == StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<all string fields>>, got " +
        child.dataType.simpleString)
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xml_encode"

  private lazy val fieldNames =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fieldNames.toSeq

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val recs = (0 until n).map { i =>
      val row = arr.getStruct(i, fieldNames.length)
      fieldNames.zipWithIndex.map { case (fn, j) =>
        fn -> (if (row.isNullAt(j)) null else row.getUTF8String(j).toString)
      }
    }
    XmlCorpus.writeRecords(recs, "records", "doc")
  }

  override protected def withNewChildInternal(newChild: Expression): XmlEncode =
    copy(child = newChild)
}

/** `xml_records(document, 'recordTag')` — parse one XML document (binary)
  * into array<map<string,string>>: one map per `<recordTag>` element,
  * immediate child elements as `name → descendant text` entries, record
  * attributes as `@name` entries (the xlsx_records untyped-map contract —
  * schema-on-read, the caller casts). DTD/external entities are disabled
  * in the parser (no XXE from untrusted dumps). Runs WHERE the document
  * bytes live — a directory of dump files parses with per-file
  * parallelism via `binaryFile`, never on the driver. */
case class XmlRecords(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable string record tag as its 2nd argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(MapType(StringType, StringType, valueContainsNull = false),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xml_records"

  override def nullSafeEval(input: Any, tag: Any): Any = {
    val recs = XmlCorpus.readRecords(input.asInstanceOf[Array[Byte]], tag.toString)
    new GenericArrayData(recs.map { m =>
      val ks = m.keys.toArray[String]
      new ArrayBasedMapData(
        new GenericArrayData(ks.map(k => UTF8String.fromString(k): Any)),
        new GenericArrayData(ks.map(k => UTF8String.fromString(m(k)): Any)))
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XmlRecords =
    copy(left = newLeft, right = newRight)
}
