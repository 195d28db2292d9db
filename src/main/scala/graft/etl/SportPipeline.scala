package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch ETL + analytics pipeline over reference-shaped
  * tables (ref: airflow/config/read_delta.py + README.md:141-164 + the
  * Superset dashboard aggregates). The testdata-mapped oracle versions of
  * these operators live in [[graft.operators.Relational]]; this module is the
  * faithful reference-shaped composition, exercised by ScalaTest on
  * [[graft.gen.ActivityGen]] data.
  */
object SportPipeline {

  /** A1 — activities per employee (ref: read_delta.py:123-127).
    * Partial+final hash agg; shuffle carries one row per employee. */
  def activityAgg(activities: DataFrame): DataFrame =
    activities.groupBy(col("id_employee")).agg(
      count(col("id_employee")).as("count_activity"),
      avg(col("activity_duration")).as("mean_duration"))

  /** P5 + P6 + J1 + J2 — the `final` table (ref: read_delta.py:258-290).
    * Both right sides are employee-keyed and small relative to the fact that
    * produced `agg`; the dims broadcast, so no shuffle of the aggregate. */
  def finalJoin(employees: DataFrame, validations: DataFrame, agg: DataFrame): DataFrame = {
    val emp = employees.select( // P5: manual pruning, as the reference does
      col("id_employee").cast("int").as("id_employee"), // P6: explicit align
      col("gross_salary"), col("business_unity"), col("constract_type"))
    emp
      .join(validations.withColumn("id_employee", col("id_employee").cast("int")),
        Seq("id_employee"))
      .join(agg.withColumn("id_employee", col("id_employee").cast("int")),
        Seq("id_employee"), "left")
  }

  /** P7-P10 + J3 — the README bonus analytics dataset (README.md:141-164).
    * The prime CTE is kept as a self-join for fidelity to the reference SQL;
    * NULL `count_activity` (left-join miss) lands in the FALSE branch of the
    * threshold CASE, per Trino semantics (SURVEY §7.4 risk 1). */
  def primeDataset(finalDf: DataFrame): DataFrame = {
    val prime = finalDf.select(
      col("id_employee").as("p_id"),
      when(col("is_valid"),
        round(col("gross_salary").cast("decimal(13,2)") * lit(new java.math.BigDecimal("0.05")), 2))
        .otherwise(lit(java.math.BigDecimal.ZERO))
        .cast("decimal(13,2)").as("commute_prime"))
    finalDf.join(prime, finalDf("id_employee") === prime("p_id"))
      .select(
        col("id_employee"), col("gross_salary"), col("business_unity"),
        col("constract_type"), col("calculed_distance"),
        col("is_valid").as("commute_valid"),
        when(col("count_activity") >= 15, lit(true)).otherwise(lit(false))
          .as("is_valid_activities"),
        col("count_activity"), col("mean_duration"), col("commute_prime"),
        (col("gross_salary").cast("decimal(13,2)") + col("commute_prime"))
          .cast("decimal(14,2)").as("total_salary"))
  }

  /** End-to-end: employees + validations + activities → analytics dataset. */
  def run(employees: DataFrame, validations: DataFrame, activities: DataFrame): DataFrame =
    primeDataset(finalJoin(employees, validations, activityAgg(activities)))

  // --- Dashboard aggregates (Superset slices; SURVEY §2.4 A2/A4/A5/A6) ---

  /** A2 — top-5 sports by activity count (ref: SaveDelta.scala:236-242). */
  def topSports(activities: DataFrame, k: Int = 5): DataFrame =
    activities.groupBy(col("sport_type")).count()
      .orderBy(desc("count"), asc("sport_type")).limit(k)

  /** A4 — big-number totals over the analytics dataset. */
  def salaryTotals(analytics: DataFrame): DataFrame =
    analytics.agg(
      sum(col("total_salary")).as("sum_total_salary"),
      sum(col("gross_salary")).cast("long").as("sum_gross_salary"),
      sum(col("commute_prime")).as("sum_commute_prime"))

  /** A5 — pie-chart counts by validity flags. */
  def validityCounts(analytics: DataFrame): DataFrame =
    analytics.groupBy(col("commute_valid"), col("is_valid_activities"))
      .agg(count(lit(1)).as("cnt"))
}
