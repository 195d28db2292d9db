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
    * min/max, computed in a SINGLE aggregate over one scan (the naive
    * per-column loop scans the table once per column — at 100 TB that is
    * the difference between one job and |columns| jobs). The wide one-row
    * aggregate is exploded into the long (column, stats) form AFTER
    * aggregation, so the explode touches one row. Numeric min/max surface
    * as doubles, string min/max as strings (null in the other family);
    * values are raw column values — no arithmetic — so both engines render
    * them identically. n_distinct is exact (null counted as a value by
    * neither engine's COUNT(DISTINCT)). */
  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      numeric.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"))) ++
      strings.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__mn"),
        max(col(c)).as(s"${c}__mx")))
    val wide = df.agg(count(lit(1)).as("n"), aggs: _*)
    val numStructs = numeric.map(c =>
      s"named_struct('column', '$c', 'n_null', `${c}__nn`, 'n_distinct', `${c}__nd`, " +
        s"'min_num', `${c}__mn`, 'max_num', `${c}__mx`, " +
        "'min_str', cast(null as string), 'max_str', cast(null as string))")
    val strStructs = strings.map(c =>
      s"named_struct('column', '$c', 'n_null', `${c}__nn`, 'n_distinct', `${c}__nd`, " +
        "'min_num', cast(null as double), 'max_num', cast(null as double), " +
        s"'min_str', `${c}__mn`, 'max_str', `${c}__mx`)")
    wide.selectExpr("n",
      s"explode(array(${(numStructs ++ strStructs).mkString(", ")})) AS p")
      .selectExpr("p.column AS column", "n AS n_rows", "p.n_null AS n_null",
        "p.n_distinct AS n_distinct", "p.min_num AS min_num", "p.max_num AS max_num",
        "p.min_str AS min_str", "p.max_str AS max_str")
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
