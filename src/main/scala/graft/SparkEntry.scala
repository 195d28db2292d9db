package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.CurationPipeline
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is an entry in `queries`; each SQL-expressible one
  * has a DuckDB oracle in `oracleSql` with identical column aliases.
  */
object SparkEntry {

  /** Flagship query (README.md:141-164 bonus computation re-expressed over
    * the testdata star schema) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagshipBonus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++ SubstrDedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Skew.queries ++
      Temporal.queries ++ CurationPipeline.queries ++ DecisionSupport.queries ++
      Collections.queries ++ Graph.queries ++ ZOrder.queries ++
      Eval.queries ++ Selection.queries ++ Classify.queries ++
      Lakehouse.queries ++ Governance.queries ++ graft.sources.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++ SubstrDedup.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++ Skew.oracleSql ++
      Temporal.oracleSql ++ CurationPipeline.oracleSql ++ DecisionSupport.oracleSql ++
      Collections.oracleSql ++ Graph.oracleSql ++ ZOrder.oracleSql ++
      Eval.oracleSql ++ Selection.oracleSql ++ Classify.oracleSql ++
      Lakehouse.oracleSql ++ Governance.oracleSql ++ graft.sources.Sources.oracleSql
}
