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

  /** Run and throw on any violation (the DAG's fail-the-job semantics). */
  def assertAll(df: DataFrame, suite: Seq[Expectation]): Unit = {
    val row = run(df, suite).collect()(0)
    val bad = suite.map(e => e.name -> row.getAs[Long](e.name)).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "data-quality violations: " + bad.map { case (n, c) => s"$n=$c" }.mkString(", "))
  }
}
