package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import javax.xml.stream.{XMLInputFactory, XMLOutputFactory, XMLStreamConstants}

/** XML corpus codec (JDK StAX — no extra jar): the dump format large text
  * corpora actually arrive in (Wikipedia/Stack Exchange dumps, TEI
  * archives, RSS/sitemap feeds). One XML DOCUMENT holds many record
  * elements; [[readRecords]] streams it and emits one map per record —
  * immediate child elements become `name → text` entries (all descendant
  * text of that child, document order) and record-element attributes
  * become `@name` entries. First occurrence wins for repeated child
  * names. [[writeRecords]] emits the inverse shape with writer-side
  * escaping, so the pair is a true round-trip.
  *
  * Same ingestion contract as the XLSX codec: untyped string maps, the
  * caller casts (schema-on-read). Distributed the same way too — each
  * document parses where its bytes land, via the `xml_records` expression
  * over `binaryFile` blobs or any binary column. Parser hygiene matches
  * Xlsx: DTD and external-entity resolution disabled (no XXE against
  * untrusted dumps).
  */
object XmlCorpus {

  private val xif = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }
  private val xof = XMLOutputFactory.newInstance()

  /** Stream one XML document; emit a (key → text) map per `recordTag`
    * element. */
  def readRecords(bytes: Array[Byte], recordTag: String): Seq[Map[String, String]] = {
    val out = Seq.newBuilder[Map[String, String]]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      var rec: scala.collection.mutable.LinkedHashMap[String, String] = null
      var childName: String = null // immediate child of the record being read
      var childDepth = 0 // element depth below the child (descendant text concats)
      val text = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (rec == null) {
              if (name == recordTag) {
                rec = scala.collection.mutable.LinkedHashMap.empty
                var i = 0
                while (i < r.getAttributeCount) {
                  val k = "@" + r.getAttributeLocalName(i)
                  if (!rec.contains(k)) rec(k) = r.getAttributeValue(i)
                  i += 1
                }
              }
            } else if (childName == null) { // an immediate child begins
              childName = name; childDepth = 0; text.clear()
            } else childDepth += 1 // nested under the child: keep its text
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if rec != null && childName != null =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (rec != null) {
              if (childName != null) {
                if (childDepth > 0) childDepth -= 1
                else {
                  if (!rec.contains(childName)) rec(childName) = text.toString
                  childName = null
                }
              } else if (r.getLocalName == recordTag) {
                out += rec.toMap; rec = null
              }
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** Write records (ordered key → nullable text maps) as one XML document
    * `<root><tag><k>v</k>…</tag>…</root>`. Null values OMIT the element
    * (the XML idiom for absent — read back as a missing map key); `@`-
    * prefixed keys become attributes of the record element. The StAX
    * writer escapes text and attribute content. */
  def writeRecords(records: Seq[Seq[(String, String)]], rootTag: String,
      recordTag: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = xof.createXMLStreamWriter(bos, "UTF-8")
    try {
      w.writeStartDocument("UTF-8", "1.0")
      w.writeStartElement(rootTag)
      records.foreach { rec =>
        w.writeStartElement(recordTag)
        rec.foreach { case (k, v) =>
          if (k.startsWith("@") && v != null) w.writeAttribute(k.substring(1), v)
        }
        rec.foreach { case (k, v) =>
          if (!k.startsWith("@") && v != null) {
            w.writeStartElement(k)
            if (v.nonEmpty) w.writeCharacters(v)
            w.writeEndElement()
          }
        }
        w.writeEndElement()
      }
      w.writeEndElement()
      w.writeEndDocument()
      w.flush()
    } finally w.close()
    bos.toByteArray
  }
}
