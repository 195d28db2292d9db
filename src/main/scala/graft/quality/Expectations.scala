package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Great-Expectations-style declarative data-quality checks, executed as ONE
  * aggregation pass (ref: airflow/dags/data_validation_dag.py:306-320 — the
  * four expectations over sport_activities; checkpoint fail-on-violation
  * :360-361).
  *
  * Scale: N expectations over any table cost a single scan + scalar hash
  * aggregate (`sum(when(violated,1))` per expectation) — no per-expectation
  * passes, no collect of row data.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    /** True on rows violating the expectation. */
    def violation: Column
  }

  /** expect_column_values_to_not_be_null */
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null_$column"
    def violation: Column = col(column).isNull
  }

  /** expect_column_values_to_be_between (nulls ignored, per GE). */
  final case class Between(
      column: String,
      min: Option[Double] = None,
      max: Option[Double] = None) extends Expectation {
    val name = s"between_$column"
    def violation: Column = {
      val lo = min.map(col(column) < _).getOrElse(lit(false))
      val hi = max.map(col(column) > _).getOrElse(lit(false))
      col(column).isNotNull && (lo || hi)
    }
  }

  /** Arbitrary SQL predicate expectation (CHECK-constraint analogue,
    * ref: data_validation_dag.py:118-125 fallback DDL). */
  final case class Satisfies(name: String, predicate: Column) extends Expectation {
    def violation: Column = !predicate || predicate.isNull
  }

  /** The reference's suite for sport_activities. */
  val sportActivitySuite: Seq[Expectation] = Seq(
    NotNull("start_datetime"),
    NotNull("sport_type"),
    Between("activity_duration", min = Some(0)),
    Between("distance", min = Some(0)))

  /** One row: total_rows + one violation count per expectation. */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val aggs = suite.map(e =>
      sum(when(e.violation, lit(1)).otherwise(lit(0))).cast("long").as(e.name))
    df.agg(count(lit(1)).as("total_rows"), aggs: _*)
  }

  /** One-pass COLUMN PROFILER — the deequ/GE "profile" companion to the
    * expectation suite: per column, row/null/distinct counts and typed
    * min/max from ONE scan (the naive per-column loop scans the table once
    * per column — at 100 TB that is |columns| jobs vs one).
    *
    * Plan shape: the scan is MELTED to (column_id, value) long form —
    * |columns| narrow rows per input row, built map-side — and profiled
    * with a two-level aggregate: level 1 groups by (column, value) with
    * map-side partial counts (the shuffle carries one row per DISTINCT
    * value per column, not per input row), level 2 rolls distinct counts /
    * nulls / min / max up per column. This is the same two-level shape the
    * IVF trainer uses for means. The naive alternative — N
    * `count(distinct col)` in one aggregate — makes Catalyst EXPAND every
    * input row N+1 ways through a single un-combined exchange (measured
    * 14.5 s vs DuckDB's 0.1 s at sf0.1; this plan is ~0.9 s). Stats are
    * raw column values (no arithmetic), so both engines render them
    * identically; n_distinct excludes nulls like COUNT(DISTINCT). */
  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String]): DataFrame = {
    val melted = (numeric.map(c =>
      s"named_struct('column', '$c', 'vn', cast(`$c` as double), 'vs', cast(null as string))") ++
      strings.map(c =>
        s"named_struct('column', '$c', 'vn', cast(null as double), 'vs', `$c`)"))
      .mkString("array(", ", ", ")")
    df.selectExpr(s"inline($melted)")
      .groupBy(col("column"), col("vn"), col("vs"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("column"))
      .agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        sum(when(col("vn").isNull && col("vs").isNull, col("cnt")).otherwise(lit(0L)))
          .cast("long").as("n_null"),
        count(when(col("vn").isNotNull || col("vs").isNotNull, lit(1)))
          .cast("long").as("n_distinct"),
        min(col("vn")).as("min_num"), max(col("vn")).as("max_num"),
        min(col("vs")).as("min_str"), max(col("vs")).as("max_str"))
      // string columns of an all-numeric row yield vn nulls and vice versa,
      // so the per-family min/max are already null in the other family
      .select(col("column"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** Run and throw on any violation (the DAG's fail-the-job semantics). */
  def assertAll(df: DataFrame, suite: Seq[Expectation]): Unit = {
    val row = run(df, suite).collect()(0)
    val bad = suite.map(e => e.name -> row.getAs[Long](e.name)).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "data-quality violations: " + bad.map { case (n, c) => s"$n=$c" }.mkString(", "))
  }
}
