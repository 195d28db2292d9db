package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sources, Xlsx}

/** Native XLSX ingest (S5 binary path): the JDK-only zip+StAX codec reads
  * real workbook bytes — shared-string and inline-string layouts, sparse
  * rows, accented French headers — through the distributed binaryFile +
  * xlsx_records pipeline into the typed HR schema. */
class XlsxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val header = Sources.hrHeaderMap.map(_._1)
  private val row1 = Seq("1", "Amélie", "Durand", "1990-04-12", "Tech",
    "2020-01-15", "52000", "CDI", "12 rue de la Paix, Paris", "Vélo", "25")
  private val row2 = Seq("2", "Jean", "Müller", "1985-11-30", "Ops",
    "2018-06-01", "61000", "CDD", "3 avenue Foch, Lyon", "Métro", "30")

  private def writeTmp(bytes: Array[Byte], name: String = "hr.xlsx"): String = {
    val dir = Files.createTempDirectory("xlsx_spec")
    Files.write(dir.resolve(name), bytes)
    dir.resolve(name).toString
  }

  test("shared-strings workbook round-trips into the typed HR schema") {
    val path = writeTmp(Xlsx.writeSheet(header +: Seq(row1, row2), sharedStrings = true))
    val df = Sources.hrXlsx(spark, path).orderBy("id_employee")
    assert(df.schema("id_employee").dataType.typeName == "integer")
    assert(df.schema("hire_date").dataType.typeName == "date")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("first_name") == "Amélie")
    assert(rows(0).getAs[Int]("gross_salary") == 52000)
    assert(rows(0).getAs[java.sql.Date]("hire_date").toString == "2020-01-15")
    assert(rows(1).getAs[String]("transport_mode") == "Métro")
    assert(rows(1).getAs[Int]("paid_leaved_days") == 30)
  }

  test("inline-string workbook parses identically") {
    val path = writeTmp(Xlsx.writeSheet(header +: Seq(row1), sharedStrings = false))
    val rows = Sources.hrXlsx(spark, path).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("last_name") == "Durand")
    assert(rows(0).getAs[String]("address") == "12 rue de la Paix, Paris")
  }

  test("sparse rows: cells a row lacks become NULL after the typed projection") {
    val short = row1.take(7) // drops contract type, address, transport, CP days
    val path = writeTmp(Xlsx.writeSheet(header +: Seq(short)))
    val r = Sources.hrXlsx(spark, path).collect()(0)
    assert(r.getAs[Int]("gross_salary") == 52000)
    assert(r.isNullAt(r.fieldIndex("transport_mode")))
    assert(r.isNullAt(r.fieldIndex("paid_leaved_days")))
  }

  test("a directory of workbooks parses per-file (the distributed shape)") {
    val dir = Files.createTempDirectory("xlsx_many")
    Files.write(dir.resolve("a.xlsx"), Xlsx.writeSheet(header +: Seq(row1)))
    Files.write(dir.resolve("b.xlsx"), Xlsx.writeSheet(header +: Seq(row2), sharedStrings = false))
    val df = Sources.hrXlsx(spark, dir.toString).orderBy("id_employee")
    assert(df.count() == 2)
    assert(df.collect().map(_.getAs[String]("first_name")).toSeq == Seq("Amélie", "Jean"))
  }

  test("A1-ref column arithmetic handles multi-letter columns") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("AB2") == 27)
  }

  test("not-a-workbook bytes fail loudly, never yield rows") {
    intercept[Exception](Xlsx.readSheetRows("not a zip at all".getBytes("UTF-8")))
    // a real zip with no sheet part is rejected too
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("hello.txt"))
    z.write("hi".getBytes("UTF-8")); z.closeEntry(); z.close()
    val e = intercept[IllegalArgumentException](Xlsx.readSheetRows(bos.toByteArray))
    assert(e.getMessage.contains("sheet"))
  }
}
