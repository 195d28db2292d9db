package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** End-to-end corpus curation recipe — the composition a training-data team
  * actually ships, built entirely from the library's oracle-gated operators:
  *
  *   1. exact dedup: keep one doc per content hash (min doc_id wins);
  *   2. near-dup resolution: drop every non-canonical member of an
  *      LSH-verified duplicate cluster;
  *   3. PII scrub: redact emails/phones in the surviving text;
  *   4. quality gate: length/stopword-based `is_quality` filter;
  *   5. deterministic train/val split on the stable doc_id.
  *
  * Everything is ONE declarative plan per stage over the same corpus scan
  * lineage — no driver loops, no RNG; re-running yields byte-identical
  * output, and an incremental delta run slots `Dedup.dedupIncremental` in
  * for stage 2 unchanged. Returned rows: (doc_id, split, quality_score,
  * clean_text).
  */
object CurationPipeline {

  def curate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // stage 1+2 keep-list: exact winners minus non-canonical near-dups
    val exactKeep = Dedup.dedupExact(s, dir).select($"keep_id".as("doc_id"))
    val nonCanonical = Dedup.dedupClusters(s, dir)
      .filter(!$"is_canonical").select($"doc_id")
    val keep = exactKeep.join(nonCanonical, Seq("doc_id"), "left_anti")
    // stage 3-5 over the survivors only
    val scrubbed = TextAnalysis.piiScrub(s, dir)
      .join(keep, Seq("doc_id"), "left_semi")
    val quality = TextAnalysis.textStats(s, dir)
      .select($"doc_id", $"quality_score", $"is_quality")
    val split = TextAnalysis.trainSplit(s, dir).select($"doc_id", $"split")
    scrubbed
      .join(quality, "doc_id")
      .filter($"is_quality")
      .join(split, "doc_id")
      .select($"doc_id", $"split", $"quality_score", $"clean_text")
  }

  /** The oracle is the same composition over the stage oracles — each
    * already-hash-matched stage SQL becomes a CTE, so the recipe is gated
    * end-to-end, not just stage-by-stage. */
  val curateSql: String =
    s"""WITH exact_keep AS (SELECT keep_id AS doc_id FROM (${Dedup.dedupExactSql.trim}) e),
       |noncanon AS (SELECT doc_id FROM (${Dedup.dedupClustersSql.trim}) c WHERE NOT is_canonical),
       |keep AS (SELECT doc_id FROM exact_keep WHERE doc_id NOT IN (SELECT doc_id FROM noncanon)),
       |pii AS (${TextAnalysis.piiScrubSql.trim}),
       |quality AS (SELECT doc_id, quality_score, is_quality FROM (${TextAnalysis.textStatsSql.trim}) t),
       |sp AS (SELECT doc_id, split FROM (${TextAnalysis.trainSplitSql.trim}) t)
       |SELECT p.doc_id, sp.split, q.quality_score, p.clean_text
       |FROM pii p
       |JOIN keep k ON p.doc_id = k.doc_id
       |JOIN quality q ON p.doc_id = q.doc_id
       |JOIN sp ON p.doc_id = sp.doc_id
       |WHERE q.is_quality
       |""".stripMargin

  /** Recipe v2 — the v1 composition extended with the round-6 signals,
    * showing how the pipeline evolves as new curation operators land:
    *
    *   6. span-dup gate: drop docs whose duplicated-8-token-span ratio
    *      exceeds 0.5 (boilerplate-heavy even when not whole-doc dups);
    *   7. diversity gate: drop the most repetitive docs (unigram Gini
    *      impurity below 0.9 — bottom ~5% of this corpus).
    *
    * Both gates are LEFT SEMI joins against already-oracle-gated operator
    * outputs, so v2 stays one declarative plan and the oracle composes the
    * same two CTEs onto the v1 SQL. */
  def curateV2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spanOk = graft.operators.Dedup.spanDedup(s, dir)
      .filter($"dup_ratio" <= 0.5).select($"doc_id")
    val diverseOk = TextAnalysis.giniDiversity(s, dir)
      .filter($"gini" >= 0.9).select($"doc_id")
    curate(s, dir)
      .join(spanOk, Seq("doc_id"), "left_semi")
      .join(diverseOk, Seq("doc_id"), "left_semi")
  }
  val curateV2Sql: String =
    s"""WITH base AS (SELECT * FROM (${curateSql.trim}) v1),
       |span_ok AS (SELECT doc_id FROM (${Dedup.spanDedupSql.trim}) sdd WHERE dup_ratio <= 0.5),
       |diverse_ok AS (SELECT doc_id FROM (${TextAnalysis.giniDiversitySql.trim}) gd WHERE gini >= 0.9)
       |SELECT base.* FROM base
       |JOIN span_ok USING (doc_id)
       |JOIN diverse_ok USING (doc_id)
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation"    -> curate _,
    "q_curation_v2" -> curateV2 _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_curation"    -> curateSql,
    "q_curation_v2" -> curateV2Sql,
  )
}
