package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.XmlCorpus

/** JDK StAX XML corpus codec: escaping survival, the absent-element null
  * idiom, attributes, nested/repeated children, parser hygiene on hostile
  * input, and the distributed SQL surface. The reader is additionally
  * proved against HAND-WRITTEN XML (entities, CDATA, comments) so its
  * semantics do not depend on our own writer. */
class XmlCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val nasty = "a & b < c > \"d\" 'e' — 世界\nline2\ttabbed"

  test("writer→reader round-trips escaping, attributes, and null omission") {
    val recs = Seq(
      Seq("@id" -> "1", "title" -> nasty, "lang" -> "fr", "body" -> ""),
      Seq("@id" -> "2", "title" -> "plain", "lang" -> null, "body" -> "x & y"))
    val bytes = XmlCorpus.writeRecords(recs, "records", "doc")
    val back = XmlCorpus.readRecords(bytes, "doc")
    assert(back.length == 2)
    assert(back(0)("@id") == "1")
    assert(back(0)("title") == nasty)
    assert(back(0)("body") == "")
    assert(back(1)("@id") == "2")
    assert(!back(1).contains("lang")) // null wrote no element → key absent
    assert(back(1)("body") == "x & y")
  }

  test("reader semantics on hand-written XML: entities, CDATA, comments, nesting") {
    val xml = """<?xml version="1.0"?>
      |<dump>
      |  <page id="7" rev="2">
      |    <title>A &amp; B &lt;tag&gt;</title>
      |    <text>before<![CDATA[ raw & <stuff> ]]>after</text>
      |    <meta><inner>deep</inner> tail</meta>
      |    <!-- a comment between records -->
      |    <title>second title is ignored (first wins)</title>
      |  </page>
      |  <notapage><title>skip</title></notapage>
      |  <page><title>minimal</title></page>
      |</dump>""".stripMargin
    val recs = XmlCorpus.readRecords(xml.getBytes(UTF_8), "page")
    assert(recs.length == 2) // <notapage> is not a record
    assert(recs(0)("@id") == "7" && recs(0)("@rev") == "2")
    assert(recs(0)("title") == "A & B <tag>")
    assert(recs(0)("text") == "before raw & <stuff> after")
    assert(recs(0)("meta") == "deep tail") // descendant text concatenates
    assert(recs(1) == Map("title" -> "minimal"))
  }

  test("parser hygiene: DTD in a hostile document is rejected, not resolved") {
    val evil = """<?xml version="1.0"?>
      |<!DOCTYPE records [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
      |<records><doc><t>&xxe;</t></doc></records>""".stripMargin
    intercept[Exception](XmlCorpus.readRecords(evil.getBytes(UTF_8), "doc"))
  }

  test("SQL surface: encode/decode expressions round-trip distributed") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"t<$i> & co", if (i % 3 == 0) null else s"l${i % 5}"))
      .toDF("id", "title", "lang")
      .groupBy(expr("id % 4").as("g"))
      .agg(sort_array(collect_list(struct($"id", $"title", $"lang"))).as("rs"))
      .selectExpr(
        """xml_encode(transform(rs, r -> struct(
          |  cast(r.id as string) AS `@id`, r.title AS title, r.lang AS lang))) AS x""".stripMargin)
      .selectExpr("explode(xml_records(x, 'doc')) AS m")
      .selectExpr("cast(m['@id'] as bigint) AS id", "m['title'] AS title",
        "element_at(m, 'lang') AS lang")
    assert(df.count() == 200)
    assert(df.agg(sum($"id")).head.getLong(0) == 200L * 201 / 2)
    assert(df.filter($"title" === "t<42> & co").count() == 1)
    assert(df.filter($"lang".isNull).count() == 66) // multiples of 3 in 1..200
  }
}
