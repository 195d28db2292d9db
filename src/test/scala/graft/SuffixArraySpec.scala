package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SubstrDedup

/** The prefix-doubling suffix-array machinery behind q_substr_sa:
  * rank tables must order suffixes exactly like a brute-force sort, and
  * the two duplicate-substring engines (gram hash vs suffix-array ranks)
  * must produce identical reports. */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
  }

  test("rank table orders suffixes like a brute-force suffix sort") {
    val texts = Seq(
      "b a n a n a",
      "a n a b a n a n a s",
      "the quick brown fox jumps over the quick brown dog",
      "x")
    val docs = docsOf(texts)
    for (upTo <- Seq(1, 2, 4, 8, 16)) {
      val got = SubstrDedup.rankTable(docs, upTo).collect()
        .map(r => (r.getLong(0), r.get(1).toString.toInt) -> r.getLong(2)).toMap
      // brute force: every suffix truncated at upTo tokens, sorted
      // lexicographically token-wise (shorter-prefix sorts first)
      val suffixes = texts.zipWithIndex.flatMap { case (t, d) =>
        val toks = t.trim.split("\\s+").toSeq
        (1 to toks.size).map(p => (d.toLong, p) -> toks.drop(p - 1).take(upTo))
      }
      import scala.math.Ordering.Implicits._
      val sorted = suffixes.sortBy(_._2)(
        scala.math.Ordering.Implicits.seqOrdering[Seq, String])
      // equal truncated suffixes must share a rank; order must agree
      sorted.sliding(2).foreach {
        case Seq((ka, sa), (kb, sb)) =>
          val (ra, rb) = (got(ka), got(kb))
          if (sa == sb) assert(ra == rb, s"$ka/$kb equal suffixes, ranks differ")
          else assert(ra < rb, s"$ka ($sa, rank $ra) must sort before $kb ($sb, rank $rb)")
        case _ => ()
      }
    }
  }

  test("gram-hash and suffix-array engines agree on the whole report") {
    val a = SparkEntry.queries("q_substr_dedup")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = SparkEntry.queries("q_substr_sa")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.length == b.length && a.length == 500)
    a.zip(b).foreach { case (ra, rb) => assert(ra == rb) }
    // and the corpus genuinely contains variable-length spans (the thing
    // the fixed-window q_span_dedup cannot represent)
    val spans = SparkEntry.queries("q_substr_dedup")(spark, "/root/testdata/sf0.001")
      .agg(max("max_span_tokens"), sum("n_spans")).head
    assert(spans.getLong(0) > 15L, "expected a duplicated span longer than L")
    assert(spans.getLong(1) > 0L)
  }
}
