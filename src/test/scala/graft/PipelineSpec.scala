package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-shaped pipeline: generator → validation → joins → analytics. */
class PipelineSpec extends AnyFunSuite {
  import graft.etl.{CommuteValidation, SportPipeline}
  import graft.gen.ActivityGen
  import graft.mask.Masking
  import graft.quality.Expectations

  lazy val spark: SparkSession = SparkTestSession.spark

  lazy val employees = ActivityGen.employees(spark, n = 161).cache()
  lazy val activities =
    ActivityGen.activities(spark, employees, start = "2024-01-01", days = 120).cache()
  lazy val validations = CommuteValidation.validate(employees).cache()

  test("generator is deterministic and respects reference distributions") {
    import spark.implicits._
    val a2 = ActivityGen.activities(spark, employees, start = "2024-01-01", days = 120)
    assert(activities.exceptAll(a2).isEmpty && a2.exceptAll(activities).isEmpty)
    // distance ranges per sport (ref sport_generation.py:42-72)
    assert(activities.filter($"sport_type" === "Vélo" &&
      ($"distance" < 10000 || $"distance" > 50000)).count() == 0)
    assert(activities.filter($"sport_type" === "Natation" &&
      ($"distance" < 500 || $"distance" > 3000)).count() == 0)
    // non-distance sports have NULL distance and 1800-7200s duration
    assert(activities.filter($"sport_type" === "Yoga" && $"distance".isNotNull).count() == 0)
    assert(activities.filter($"distance".isNull &&
      ($"activity_duration" < 1800 || $"activity_duration" > 7200)).count() == 0)
    // ~71% of comments null (30/42)
    val nullFrac = activities.filter($"comment".isNull).count().toDouble / activities.count()
    assert(nullFrac > 0.6 && nullFrac < 0.8, s"comment null fraction $nullFrac")
    // hours within 6-21
    assert(activities.filter(hour($"start_datetime") < 6 || hour($"start_datetime") > 21).count() == 0)
  }

  test("weekend participation is boosted") {
    import spark.implicits._
    val byDay = activities
      .withColumn("we", dayofweek($"start_datetime").isin(1, 7))
      .groupBy($"we").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // 120 days ≈ 86 weekdays / 34 weekend days; rates 0.05 vs 0.15
    val weekdayRate = byDay(false) / (161.0 * 86)
    val weekendRate = byDay(true) / (161.0 * 34)
    assert(weekendRate > 2 * weekdayRate, s"weekday $weekdayRate weekend $weekendRate")
  }

  test("commute validation mirrors the reference's three outcomes") {
    import spark.implicits._
    // non-sporty modes are invalid with the 'non sportif' message
    assert(validations.join(employees, "id_employee")
      .filter(!$"transport_mode".isin("Marche/running", "Vélo/Trottinette/Autres"))
      .filter($"is_valid" || !$"error_message".contains("non sportif")).count() == 0)
    // valid rows have no message; invalid sporty rows have distance or API message
    assert(validations.filter($"is_valid" && $"error_message".isNotNull).count() == 0)
    assert(validations.filter(!$"is_valid" && $"error_message".isNull).count() == 0)
  }

  test("analytics dataset: prime is 5% when valid, totals add up") {
    import spark.implicits._
    val analytics = SportPipeline.run(employees, validations, activities).cache()
    assert(analytics.count() == 161)
    // P7: valid → round(5%), invalid → 0
    assert(analytics.filter($"commute_valid" &&
      $"commute_prime" =!= round($"gross_salary" * 0.05, 2).cast("decimal(13,2)")).count() == 0)
    assert(analytics.filter(!$"commute_valid" && $"commute_prime" =!= 0).count() == 0)
    // P9: total = gross + prime
    assert(analytics.filter(
      $"total_salary" =!= ($"gross_salary".cast("decimal(13,2)") + $"commute_prime")).count() == 0)
    // P8 null semantics: no-activity employees must be false, not null
    assert(analytics.filter($"is_valid_activities".isNull).count() == 0)
    analytics.unpersist()
  }

  test("dashboard aggregates") {
    val top = SportPipeline.topSports(activities).collect()
    assert(top.length == 5)
    assert(top.map(_.getLong(1)).sameElements(top.map(_.getLong(1)).sorted.reverse))
    val analytics = SportPipeline.run(employees, validations, activities)
    assert(SportPipeline.salaryTotals(analytics).count() == 1)
    assert(SportPipeline.validityCounts(analytics).count() <= 4)
  }

  test("expectations suite passes on generated activities, catches violations") {
    Expectations.assertAll(activities, Expectations.sportActivitySuite)
    import spark.implicits._
    val poisoned = activities.limit(5)
      .withColumn("activity_duration", lit(-1))
      .union(activities.limit(10))
    val ex = intercept[IllegalStateException] {
      Expectations.assertAll(poisoned, Expectations.sportActivitySuite)
    }
    assert(ex.getMessage.contains("between_activity_duration=5"))
  }

  test("masking nulls PII for the BI role only") {
    import spark.implicits._
    val masked = Masking.maskedView(employees, isBiUser = true)
    assert(masked.filter($"first_name".isNotNull || $"address".isNotNull).count() == 0)
    assert(masked.filter($"gross_salary".isNull).count() == 0)
    val open = Masking.maskedView(employees, isBiUser = false)
    assert(open.filter($"first_name".isNull).count() == 0)
  }
}
