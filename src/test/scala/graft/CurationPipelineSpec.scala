package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.CurationPipeline

/** The end-to-end curation recipe drops exact dups, drops non-canonical
  * near-dups, scrubs PII, gates on quality, and splits deterministically. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("curation keeps one canonical, scrubbed, quality doc per content") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog while twenty other animals watch from the fence line every single morning"
    val dir = Files.createTempDirectory("curation").toString
    val pii = "please mail me at a.b@example.org about the forthcoming expedition reports from the northern observatory stations next week and autumn season"
    Seq(
      (0L, good, "en", "s", 1L),
      (1L, good, "en", "s", 1L),                      // exact dup of 0 -> dropped
      (2L, good + " stretched", "en", "s", 1L),       // near-dup (jaccard 0.9) -> non-canonical, dropped
      (3L, pii, "en", "s", 1L),                       // unique content: kept, scrubbed
      (4L, "too short", "en", "s", 1L))               // fails quality gate
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationPipeline.curate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(out.keySet == Set(0L, 3L), out.keySet)
    assert(!out(3L)._2.contains("@") && out(3L)._2.contains("[EMAIL]"))
    assert(Set("train", "val").contains(out(0L)._1))
    // deterministic end to end
    val again = CurationPipeline.curate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(out == again)
  }
}
