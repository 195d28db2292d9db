package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  import graft.operators.{Dedup, TextAnalysis}
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("exact dedup keeps one id per content hash") {
    import spark.implicits._
    val d = Dedup.dedupExact(spark, sf).cache()
    assert(d.select($"content_hash").distinct().count() == d.count())
    assert(d.filter($"n_dups" < 1).count() == 0)
    d.unpersist()
  }

  test("minhash signatures are stable universal-hash values in [0, p)") {
    import spark.implicits._
    val sig = Dedup.minhashSignatures(spark, sf)
    val row = sig.orderBy($"doc_id").first()
    assert(row.getAs[Long]("sig0") >= 0 && row.getAs[Long]("sig0") < 1000000007L)
    // deterministic across runs
    val again = Dedup.minhashSignatures(spark, sf).orderBy($"doc_id").first()
    assert(row == again)
  }

  test("short docs (<3 tokens) are excluded from minhash, not mis-bucketed") {
    import spark.implicits._
    import java.nio.file.Files
    // fixture: two identical real docs (must pair), several short docs
    // (must neither sign nor pair), one empty-ish doc
    val dir = Files.createTempDirectory("shortdocs").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 1L),
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 1L),
      (2L, "hi", "en", "s", 1L),
      (3L, "yo yo", "en", "s", 1L),
      (4L, " ", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = graft.operators.Dedup.minhashSignatures(spark, dir)
    assert(sigs.count() == 2) // only the two shingle-able docs
    val pairs = graft.operators.Dedup.dedupMinhashLsh(spark, dir).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 0L && pairs(0).getLong(1) == 1L)
    assert(pairs(0).getDouble(2) == 1.0) // identical docs: jaccard exactly 1
  }

  test("lsh near-dup pairs are symmetric-free and above threshold") {
    import spark.implicits._
    val p = Dedup.dedupMinhashLsh(spark, sf).cache()
    assert(p.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(p.filter($"jaccard" < 0.8).count() == 0)
    p.unpersist()
  }

  test("simhash is 16-bit and identical docs collide") {
    import spark.implicits._
    val sh = Dedup.simhash(spark, sf)
    assert(sh.filter($"simhash16" < 0 || $"simhash16" > 65535).count() == 0)
  }

  test("text stats ratios are in range") {
    import spark.implicits._
    val t = TextAnalysis.textStats(spark, sf).cache()
    assert(t.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(t.filter($"quality_score" < 0 || $"quality_score" > 1).count() == 0)
    assert(t.filter($"n_tokens" <= 0).count() == 0)
    t.unpersist()
  }

  test("lang id picks a deterministic label") {
    import spark.implicits._
    val l = TextAnalysis.langId(spark, sf)
    val labels = l.select($"lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "fr", "de", "es", "unknown")))
  }

  test("fingerprints are deterministic and collision-free on unique texts") {
    import spark.implicits._
    val f = TextAnalysis.fingerprint(spark, sf).cache()
    assert(f.select($"fp_md5").distinct().count() == f.count())
    assert(f.filter($"fp_roll" < 0).count() == 0)
    f.unpersist()
  }
}
