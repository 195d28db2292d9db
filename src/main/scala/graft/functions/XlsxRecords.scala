package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `xlsx_records(workbook)` — parse an .xlsx binary (first sheet) into
  * array<map<string,string>>: one map per data row keyed by the header
  * row's cell values (trailing cells a row lacks are absent from its
  * map). Runs the [[graft.sources.Xlsx]] JDK-only codec WHERE the file
  * bytes live, so a directory of thousands of workbooks (the real shape
  * of spreadsheet ingest) parses with per-file parallelism via
  * `spark.read.format("binaryFile")` — never on the driver.
  * CodegenFallback: one zip+XML parse per FILE, nothing for codegen to
  * inline (the kafka_batch_decode precedent). */
case class XlsxRecords(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    ArrayType(MapType(StringType, StringType, valueContainsNull = false),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xlsx_records"

  override def nullSafeEval(input: Any): Any = {
    val rows = graft.sources.Xlsx.readSheetRows(input.asInstanceOf[Array[Byte]])
    require(rows.nonEmpty, "workbook has no header row")
    val header = rows.head.map(h => UTF8String.fromString(h))
    val recs = rows.tail.map { cells =>
      val n = math.min(header.length, cells.length)
      new ArrayBasedMapData(
        new GenericArrayData(header.take(n).toArray[Any]),
        new GenericArrayData(cells.take(n).map(c =>
          UTF8String.fromString(c)).toArray[Any]))
    }
    new GenericArrayData(recs.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): XlsxRecords =
    copy(child = newChild)
}
