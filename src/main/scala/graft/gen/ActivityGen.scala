package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Spark-native re-implementation of the reference's stochastic
  * workload generators (ref: activity_generator/sport_generation.py — sport
  * vocabulary :18-23, comments :26-39, distance ranges :42-72, speed bands
  * :75-113, time-of-day :115-134, Bernoulli participation :174-181; employee
  * attributes per the HR workbook domains, SURVEY §1.2).
  *
  * Differences from the reference, by design (SURVEY §7.4 risk 4):
  *   - seed- and epoch-parameterized instead of unseeded `random` + "today";
  *   - uniform draws come from `xxhash64(row-key, draw-index)` rather than
  *     `rand()`, so results are identical regardless of partitioning,
  *     parallelism, or re-execution — a requirement for replayable pipelines;
  *   - the reference's weekday bug (it tests the WINDOW START's weekday, so
  *     the weekend boost applies to all days or none) is not reproduced: we
  *     test each activity day's weekday, the evident intent.
  *
  * Scale: both generators are `spark.range`-driven — embarrassingly parallel,
  * no shuffle, no driver-side loops; generating 10^12 rows is just a bigger
  * range.
  */
object ActivityGen {

  val SportTypes: Seq[String] = Seq(
    "Course à pied", "Marche", "Vélo", "Natation", "Randonnée", "Trottinette",
    "Escalade", "Tennis", "Yoga", "Musculation", "Corde à sauter", "Badminton",
    "Tennis de table", "Triathlon", "Équitation", "Voile", "Football",
    "Basketball", "Judo", "Box", "Rugby")

  val Comments: Seq[String] = Seq(
    "Super séance aujourd'hui !",
    "Je me sens en pleine forme !",
    "Nouveau record personnel !",
    "Belle journée pour faire du sport !",
    "J'adore ce parcours !",
    "Reprise du sport :)",
    "Session intense mais gratifiante",
    "Un peu difficile mais ça fait du bien",
    "Parfait pour se vider la tête après le travail",
    "Je progresse chaque jour !",
    "Belle découverte de ce nouveau parcours",
    "Je vous recommande cet endroit, c'est magnifique")

  private val firstNames = Seq("Audrey", "Marc", "Julie", "Thomas", "Camille",
    "Nicolas", "Sophie", "Pierre", "Emma", "Lucas", "Léa", "Hugo", "Chloé",
    "Louis", "Manon", "Jules")
  private val lastNames = Seq("Martin", "Bernard", "Dubois", "Thomas",
    "Robert", "Richard", "Petit", "Durand", "Leroy", "Moreau", "Simon",
    "Laurent", "Lefebvre", "Michel", "Garcia", "David")
  private val businessUnits = Seq("Marketing", "R&D", "Ventes", "Support", "Finance")
  private val transportModes = Seq("Transports en commun",
    "véhicule thermique/électrique", "Marche/running", "Vélo/Trottinette/Autres")

  /** Uniform double in [0,1) from a deterministic 64-bit hash of (key, k) —
    * partitioning-independent, unlike rand(seed). */
  private def u(key: org.apache.spark.sql.Column, k: Int, seed: Long) =
    (pmod(xxhash64(key, lit(k), lit(seed)), lit(1048576L)).cast("double") / 1048576.0)

  private def pick(arr: Seq[String], idx: org.apache.spark.sql.Column) =
    element_at(array(arr.map(lit): _*), (idx + 1).cast("int"))

  /** Employees dimension (FIXTURES.md A1); n defaults to the reference's 161. */
  def employees(spark: SparkSession, n: Int = 161, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val df = spark.range(1, n + 1).select($"id".cast("int").as("id_employee"))
    val key = $"id_employee".cast("long")
    df
      .withColumn("first_name", pick(firstNames, (u(key, 1, seed) * firstNames.size).cast("int")))
      .withColumn("last_name", pick(lastNames, (u(key, 2, seed) * lastNames.size).cast("int")))
      .withColumn("birthday",
        date_add(lit(java.sql.Date.valueOf("1960-01-01")), (u(key, 3, seed) * 15706).cast("int")))
      .withColumn("business_unity", pick(businessUnits, (u(key, 4, seed) * businessUnits.size).cast("int")))
      // hire at age 18y + up to ~20y after birthday
      .withColumn("hire_date", date_add($"birthday", (lit(6574) + (u(key, 5, seed) * 7300).cast("int"))))
      .withColumn("gross_salary", lit(20000) + (u(key, 6, seed) * 60000).cast("int"))
      .withColumn("constract_type", when(u(key, 7, seed) < 0.8, "CDI").otherwise("CDD"))
      .withColumn("address",
        concat((u(key, 8, seed) * 200).cast("int") + 1, lit(" rue de la République, "),
          when(u(key, 9, seed) < 0.5, "Montpellier").otherwise("Nîmes")))
      .withColumn("transport_mode", pick(transportModes, (u(key, 10, seed) * transportModes.size).cast("int")))
      .withColumn("paid_leaved_days", (u(key, 11, seed) * 36).cast("int"))
      .select("id_employee", "first_name", "last_name", "birthday",
        "business_unity", "hire_date", "gross_salary", "constract_type",
        "address", "transport_mode", "paid_leaved_days")
  }

  /** Sport activities over a [start, start+days) window — Postgres shape
    * (FIXTURES.md A3). Bernoulli per employee-day: participate iff
    * u > 0.95 weekday / 0.85 weekend (ref :174-181); distances, speeds,
    * time-of-day and comment-null mix per the reference's distributions. */
  def activities(
      spark: SparkSession,
      employeesDf: DataFrame,
      start: String = "2024-01-01",
      days: Int = 366,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val n = employeesDf.selectExpr("max(id_employee)").first().getInt(0)
    // `id` keeps the reference's INT shape (init-db.sql:38 SERIAL); guard the
    // range rather than silently wrapping — at >2^31 employee-days switch the
    // id columns to LongType (one-line change, FIXTURES shape deviation).
    require(n.toLong * days <= Int.MaxValue,
      s"activity id space exceeds Int: $n employees x $days days")
    val base = spark.range(n.toLong * days).select(
      ($"id" / days).cast("int").plus(1).as("id_employee"),
      pmod($"id", lit(days.toLong)).cast("int").as("day_off"),
      $"id".as("key"))
    val k = $"key"
    val dated = base
      .withColumn("activity_date", date_add(lit(java.sql.Date.valueOf(start)), $"day_off"))
      .withColumn("is_weekend", dayofweek($"activity_date").isin(1, 7))
      .withColumn("u_part", u(k, 0, seed))
      .filter(when($"is_weekend", $"u_part" > 0.85).otherwise($"u_part" > 0.95))
      .withColumn("sport_type", pick(SportTypes, (u(k, 1, seed) * SportTypes.size).cast("int")))

    def range(lo: Int, hi: Int) = (lit(lo) + u(k, 2, seed) * (hi - lo)).cast("int")
    def speed(lo: Double, hi: Double) = lit(lo) + u(k, 3, seed) * (hi - lo)

    val withDistance = dated.withColumn("distance",
      when($"sport_type" === "Course à pied", range(3000, 15000))
        .when($"sport_type" === "Marche", range(2000, 8000))
        .when($"sport_type" === "Randonnée", range(5000, 20000))
        .when($"sport_type" === "Vélo", range(10000, 50000))
        .when($"sport_type" === "Trottinette", range(5000, 15000))
        .when($"sport_type" === "Natation", range(500, 3000))
        .otherwise(lit(null).cast("int")))
    val withDuration = withDistance.withColumn("activity_duration",
      when($"distance".isNotNull,
        ($"distance" / when($"sport_type" === "Course à pied", speed(2.2, 3.3))
          .when($"sport_type" === "Marche", speed(1.1, 1.7))
          .when($"sport_type" === "Randonnée", speed(0.8, 1.4))
          .when($"sport_type" === "Vélo", speed(4.2, 6.9))
          .when($"sport_type" === "Trottinette", speed(2.8, 4.2))
          .otherwise(speed(0.6, 1.1))
          * (lit(0.9) + u(k, 4, seed) * 0.2)).cast("int"))
        .otherwise((lit(1800) + u(k, 4, seed) * 5400).cast("int")))
    val withTime = withDuration
      .withColumn("hour", when(u(k, 5, seed) < 0.3, (lit(6) + u(k, 6, seed) * 4).cast("int"))
        .otherwise((lit(10) + u(k, 6, seed) * 12).cast("int")))
      .withColumn("start_datetime", to_timestamp(
        concat(date_format($"activity_date", "yyyy-MM-dd"), lit(" "),
          format_string("%02d:%02d:%02d", $"hour",
            (u(k, 7, seed) * 60).cast("int"), (u(k, 8, seed) * 60).cast("int")))))
      .withColumn("comment", {
        val i = (u(k, 9, seed) * (Comments.size + 30)).cast("int")
        when(i < Comments.size, pick(Comments, i)).otherwise(lit(null).cast("string"))
      })
    withTime
      .join(broadcast(employeesDf.select($"id_employee", $"first_name", $"last_name")), "id_employee")
      .select(($"key" + 1).cast("int").as("id"), $"id_employee", $"first_name",
        $"last_name", $"start_datetime", $"sport_type", $"distance",
        $"activity_duration", $"comment")
  }
}
