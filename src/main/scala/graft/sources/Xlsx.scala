package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Native XLSX codec — no spark-excel/POI jar (both offline-unresolvable;
  * the attempt is documented at [[Sources.hrCsv]]): an .xlsx is a ZIP of
  * XML parts (ECMA-376 / ISO 29500 SpreadsheetML, a public standard), and
  * the JDK ships both the ZIP codec and a StAX pull parser, so the binary
  * workbook path needs no dependency at all.
  *
  * Reader scope (what an HR-workbook ingest needs): first worksheet, shared
  * strings (plain and rich-text runs), inline strings, numeric/boolean
  * cells as their raw lexical value, sparse rows (missing cells become "").
  * Date cells stored as Excel serials surface as the raw serial string —
  * convert with `date_add('1899-12-30', cast(v as int))`; the HR contract
  * ships ISO date strings. The parser fails loudly on a workbook with no
  * sheet part — a codec must reject, not fabricate.
  *
  * The writer emits a minimal valid workbook (content types, rels,
  * workbook, one sheet; shared-strings or inline-string cells) so specs
  * exercise the reader against REAL zip+XML bytes they build themselves.
  */
object Xlsx {

  private val xif = {
    val f = XMLInputFactory.newInstance()
    // hygiene: no DTD/external-entity resolution inside untrusted zips
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Parse a workbook's first sheet into rows of cell strings. */
  def readSheetRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    var shared: Vector[String] = Vector.empty
    var sheetXml: Array[Byte] = null
    var sheetName: String = null
    var sharedXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") sharedXml = zin.readAllBytes()
        // first sheet = lexicographically smallest part name (sheet1.xml)
        else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml") &&
          (sheetName == null || name < sheetName)) {
          sheetName = name; sheetXml = zin.readAllBytes()
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, "not a workbook: no xl/worksheets/sheet*.xml part")
    if (sharedXml != null) shared = parseSharedStrings(sharedXml)
    parseSheet(sheetXml, shared)
  }

  private def parseSharedStrings(xml: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    var inSi = false
    val cur = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => cur.append(r.getElementText) // rich runs concat
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += cur.toString; inSi = false
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  /** Column index from an A1-style ref: A→0, Z→25, AA→26… */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(xml: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellValue: String = null
    var inIs = false
    val isText = new StringBuilder
    def put(col: Int, v: String): Unit = {
      while (row.length < col) row += ""
      if (row.length == col) row += v else row(col) = v
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref == null) row.length else colIndex(ref)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellValue = null; inIs = false; isText.clear()
            case "is" => inIs = true
            case "t" if inIs => isText.append(r.getElementText)
            case "v" => cellValue = r.getElementText
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "c" =>
              val v = cellType match {
                case "s" =>
                  require(cellValue != null, "shared-string cell without index")
                  shared(cellValue.trim.toInt)
                case "inlineStr" => isText.toString
                case _ => if (cellValue == null) "" else cellValue
              }
              put(cellCol, v)
            case "row" => rows += row.toSeq; row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** Write a minimal valid single-sheet workbook. `sharedStrings = true`
    * routes every cell through the shared-string table (the layout real
    * producers emit); false uses inline strings — both reader paths. */
  def writeSheet(rows: Seq[Seq[String]], sharedStrings: Boolean = true): Array[Byte] = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val d = (n - 1) % 26; sb.insert(0, ('A' + d).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val (cellsXml, sharedXmlOpt) =
      if (sharedStrings) {
        val table = scala.collection.mutable.LinkedHashMap.empty[String, Int]
        def idx(s: String) = table.getOrElseUpdate(s, table.size)
        val body = rows.zipWithIndex.map { case (cells, ri) =>
          val cs = cells.zipWithIndex.map { case (v, ci) =>
            s"""<c r="${colRef(ci)}${ri + 1}" t="s"><v>${idx(v)}</v></c>"""
          }.mkString
          s"""<row r="${ri + 1}">$cs</row>"""
        }.mkString
        val sst = table.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
        (body, Some(
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${table.size}" uniqueCount="${table.size}">$sst</sst>""".stripMargin))
      } else {
        val body = rows.zipWithIndex.map { case (cells, ri) =>
          val cs = cells.zipWithIndex.map { case (v, ci) =>
            s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
          }.mkString
          s"""<row r="${ri + 1}">$cs</row>"""
        }.mkString
        (body, None)
      }
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$cellsXml</sheetData></worksheet>""".stripMargin
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
         |${if (sharedXmlOpt.isDefined) """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" else ""}
         |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
         |${if (sharedXmlOpt.isDefined) """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" else ""}
         |</Relationships>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    }
    part("[Content_Types].xml", contentTypes)
    part("_rels/.rels", rels)
    part("xl/workbook.xml", workbook)
    part("xl/_rels/workbook.xml.rels", wbRels)
    sharedXmlOpt.foreach(part("xl/sharedStrings.xml", _))
    part("xl/worksheets/sheet1.xml", sheet)
    z.close()
    bos.toByteArray
  }
}
