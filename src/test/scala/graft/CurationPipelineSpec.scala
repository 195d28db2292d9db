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

  val sf = "/root/testdata/sf0.001"

  test("curation funnel is monotone and lands exactly on the recipe outputs") {
    import org.apache.spark.sql.functions._
    val f = CurationPipeline.curationFunnel(spark, sf).head
    val names = Seq("n_total", "n_after_exact", "n_after_neardup",
      "n_after_quality", "n_after_span", "n_after_diversity")
    val vals = names.map(n => f.getAs[Long](n))
    assert(vals == vals.sorted.reverse, s"funnel must be non-increasing: $vals")
    // the funnel's stage-3 and stage-5 counts ARE the v1/v2 recipe outputs
    assert(vals(3) == CurationPipeline.curate(spark, sf).count())
    assert(vals(5) == CurationPipeline.curateV2(spark, sf).count())
  }

  test("curation shards partition the curated corpus with balanced tokens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = CurationPipeline.curationShards(spark, sf).cache()
    val curated = CurationPipeline.curateV2(spark, sf)
      .groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySplit = p.groupBy($"split").agg(sum($"n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit == curated, "every curated doc lands in exactly one shard")
    // within the train split, token totals stay balanced
    val mm = p.filter($"split" === "train")
      .agg(min($"n_tokens"), max($"n_tokens")).head
    assert(mm.getLong(1) <= mm.getLong(0) * 3 / 2,
      s"train shards should balance within 50%: [${mm.getLong(0)}, ${mm.getLong(1)}]")
    p.unpersist()
  }

  test("recipe diff reconciles with the funnel: kept = after-diversity, total = after-quality") {
    val sf = "/root/testdata/sf0.001"
    val diff = CurationPipeline.curationDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val f = CurationPipeline.curationFunnel(spark, sf).collect().head
    val (afterQuality, afterDiversity) =
      (f.getAs[Long]("n_after_quality"), f.getAs[Long]("n_after_diversity"))
    // every v1 survivor is attributed to exactly one outcome
    assert(diff.values.sum == afterQuality,
      s"diff rows ${diff.values.sum} != v1 survivors $afterQuality")
    // the docs both gates keep are exactly the funnel's final stage
    assert(diff.getOrElse("kept", 0L) == afterDiversity,
      s"kept ${diff.get("kept")} != funnel final $afterDiversity")
    // v2 dropped something on this corpus (the gates are not vacuous)
    assert(diff.keys.exists(_.startsWith("dropped")), diff.toString)
  }
}
