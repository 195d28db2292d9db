package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Source operators — the reference's complete ingest surface (SURVEY §2.1)
  * as Spark readers. Everything is a thin declarative builder: Catalyst owns
  * pushdown/pruning; these functions own the reference's option sets and
  * schema contracts.
  */
object Sources {

  /** S1 — Kafka CDC stream source with the reference's exact options
    * (ref: spark/SaveDelta.scala:104-112: earliest offsets, tolerate data
    * loss, consumer group). Requires the spark-sql-kafka connector jar on
    * the cluster classpath. Resolution of
    * `org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2` was attempted in
    * this build and fails offline ("Not found" in every configured repo —
    * the zero-egress dependency cache holds only the test libraries), and
    * no connector jar ships in /opt/spark/jars, so a live `format("kafka")`
    * load cannot run here: the call is the documented production seam
    * (tests use file/rate/memory sources — as does the reference's own
    * fallback). */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
                  groupId: String = "spark-graft-cdc"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .option("kafka.group.id", groupId)
      .load()

  /** S2 — rate fallback source, 1 row/s (ref: SaveDelta.scala:123-127). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** S3 — columnar batch table scan (Delta in the reference, parquet here —
    * ref: read_delta.py:51). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S4/S6 — JDBC full-table scan (ref: read_delta.py:87-103 — employees_
    * masked + commute_validations over PostgreSQL). The production target
    * is PostgreSQL (default driver); the same path is exercised end-to-end
    * in SourcesSpec against embedded Derby (on every Spark classpath), so
    * the read/write contract is TESTED, not just declared.
    * `partitionColumn` enables parallel reads at scale — the reference read
    * single-threaded; a 1000-executor cluster must not. */
  def jdbcTable(spark: SparkSession, url: String, dbtable: String,
                user: String, password: String,
                partitionColumn: Option[(String, Long, Long, Int)] = None,
                driver: String = "org.postgresql.Driver"): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("user", user).option("password", password)
      .option("driver", driver)
    partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }

  /** French HR-workbook header → canonical employees schema
    * (ref: commute_validation.py:193-203; Données+RH.xlsx). */
  val hrHeaderMap: Seq[(String, String)] = Seq(
    "ID salarié" -> "id_employee",
    "Prénom" -> "first_name",
    "Nom" -> "last_name",
    "Date de naissance" -> "birthday",
    "BU" -> "business_unity",
    "Date d'embauche" -> "hire_date",
    "Salaire brut" -> "gross_salary",
    "Type de contrat" -> "constract_type",
    "Adresse du domicile" -> "address",
    "Moyen de déplacement" -> "transport_mode",
    "Nombre de jours de CP" -> "paid_leaved_days")

  /** S5 — HR workbook ingest. The reference reads Excel via pandas
    * (ref: commute_validation.py:187-209); the columnar equivalent is a
    * header CSV export read with the same French→canonical column mapping
    * and explicit types. Real `.xlsx` needs the spark-excel connector:
    * resolution of `com.crealytics:spark-excel_2.13:3.5.1_0.20.4` was
    * attempted in this build and fails offline ("Not found" in every
    * configured repository — the zero-egress dependency cache holds only
    * the test libraries), and no such jar ships in /opt/spark/jars. On a
    * cluster with the jar, swap `.csv(path)` for
    * `.format("com.crealytics.spark.excel").option("header", "true")
    * .load(path)` — the header map and typed projection below are
    * format-independent. */
  def hrCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(path)
    val renamed = hrHeaderMap.foldLeft(raw) { case (df, (fr, canon)) =>
      if (df.columns.contains(fr)) df.withColumnRenamed(fr, canon) else df
    }
    renamed.select(
      col("id_employee").cast("int"),
      col("first_name"), col("last_name"),
      to_date(col("birthday"), "yyyy-MM-dd").as("birthday"),
      col("business_unity"),
      to_date(col("hire_date"), "yyyy-MM-dd").as("hire_date"),
      col("gross_salary").cast("int"),
      col("constract_type"),
      col("address"), col("transport_mode"),
      col("paid_leaved_days").cast("int"))
  }

  /** S13 — catalog registration (Trino `register_table` analogue): expose a
    * parquet path as a queryable name for `spark.sql`. */
  def registerTable(spark: SparkSession, name: String, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(name)
}
