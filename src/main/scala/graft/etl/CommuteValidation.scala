package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commute-declaration validation (ref: commute_validation/
  * commute_validation.py — TRANSPORT_LIMITS :15-18, non-sporty rejection
  * :84-91, threshold check + message :108-112).
  *
  * The reference calls the Google Distance Matrix API per row; that external
  * effect is isolated behind [[DistanceProvider]] (SURVEY §7.4 risk 5) with a
  * deterministic hash-based default, so tests and benchmarks never leave the
  * JVM. The provider is applied as a column expression — the validation
  * itself is pure, codegen'd `when/otherwise` logic (P12-P14).
  */
object CommuteValidation {

  /** Sporty transport modes and their distance limits in meters
    * (ref: commute_validation.py:15-18). */
  val TransportLimits: Map[String, Int] = Map(
    "Marche/running" -> 15000,
    "Vélo/Trottinette/Autres" -> 25000)

  /** External distance computation, modeled as a pure column transform:
    * given (address, transport_mode) produce meters + seconds, or null on
    * "API failure". */
  trait DistanceProvider {
    def distanceMeters(address: org.apache.spark.sql.Column,
                       mode: org.apache.spark.sql.Column): org.apache.spark.sql.Column
    def durationSeconds(distance: org.apache.spark.sql.Column): org.apache.spark.sql.Column
  }

  /** Deterministic stand-in for the Distance Matrix API: distance in
    * [1, 30) km derived from a hash of the address; ~2% simulated failures
    * (null), mirroring the reference's "Impossible de calculer la distance"
    * path (commute_validation.py:95-101). */
  object HashDistanceProvider extends DistanceProvider {
    def distanceMeters(address: org.apache.spark.sql.Column,
                       mode: org.apache.spark.sql.Column) = {
      val uu = pmod(xxhash64(address, mode), lit(1048576L)).cast("double") / 1048576.0
      when(uu < 0.02, lit(null).cast("double"))
        .otherwise(round(lit(1000.0) + uu * 29000.0, 2))
    }
    def durationSeconds(distance: org.apache.spark.sql.Column) =
      round(distance / 1.25, 2) // walking-ish m/s, deterministic
  }

  /** employees → commute_validations (FIXTURES.md A2 shape). */
  def validate(
      employees: DataFrame,
      provider: DistanceProvider = HashDistanceProvider,
      createdAt: String = "2024-01-01 00:00:00"): DataFrame = {
    val sportyModes = TransportLimits.keys.toSeq
    val limit = TransportLimits.foldLeft(lit(null).cast("int")) {
      case (acc, (mode, lim)) => when(col("transport_mode") === mode, lit(lim)).otherwise(acc)
    }
    val dist = provider.distanceMeters(col("address"), col("transport_mode"))
    employees
      .withColumn("calculed_distance_raw", dist)
      .select(
        col("id_employee").as("id_validate"), // serial == employee id: one pass
        col("id_employee"),
        when(col("transport_mode").isin(sportyModes: _*),
          col("calculed_distance_raw").cast("decimal(10,2)"))
          .otherwise(lit(null).cast("decimal(10,2)")).as("calculed_distance"),
        when(col("transport_mode").isin(sportyModes: _*),
          provider.durationSeconds(col("calculed_distance_raw")).cast("decimal(10,2)"))
          .otherwise(lit(null).cast("decimal(10,2)")).as("calculed_duration"),
        when(!col("transport_mode").isin(sportyModes: _*), lit(false))
          .when(col("calculed_distance_raw").isNull, lit(false))
          .when(col("calculed_distance_raw") <= limit, lit(true))
          .otherwise(lit(false)).as("is_valid"),
        when(!col("transport_mode").isin(sportyModes: _*),
          concat(lit("Mode de transport '"), col("transport_mode"), lit("' non sportif")))
          .when(col("calculed_distance_raw").isNull, lit("Impossible de calculer la distance"))
          .when(col("calculed_distance_raw") <= limit, lit(null).cast("string"))
          .otherwise(format_string("Distance (%.1f km) > limite (%d km)",
            col("calculed_distance_raw") / 1000.0, (limit / 1000).cast("int")))
          .as("error_message"),
        lit(createdAt).cast("timestamp").as("created_at"))
  }
}
