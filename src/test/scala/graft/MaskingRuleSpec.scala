package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** Engine-level masking rule, exercised through a session built WITH the
  * extensions (the shared test session has none, so this spec swaps the
  * active session against the same SparkContext and restores it). */
class MaskingRuleSpec extends AnyFunSuite {

  test("masking rule NULLs protected columns for the BI role at every query path") {
    val base = SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      graft.gen.ActivityGen.employees(spark, n = 20)
        .createOrReplaceTempView("employees_sec")
      spark.conf.set("graft.mask.tables", "employees_sec")
      spark.conf.set("graft.mask.columns", "first_name,last_name,address")

      // non-BI role: data visible
      spark.conf.set("graft.mask.biuser", "false")
      assert(spark.sql("SELECT first_name FROM employees_sec WHERE first_name IS NOT NULL")
        .count() == 20)

      // BI role: every path over the view is masked — SQL and DataFrame alike
      spark.conf.set("graft.mask.biuser", "true")
      val viaSql = spark.sql(
        "SELECT first_name, last_name, address, gross_salary FROM employees_sec")
      assert(viaSql.filter($"first_name".isNotNull || $"last_name".isNotNull ||
        $"address".isNotNull).count() == 0)
      assert(viaSql.filter($"gross_salary".isNull).count() == 0) // unprotected intact
      val viaDf = spark.table("employees_sec").select($"first_name")
      assert(viaDf.filter($"first_name".isNotNull).count() == 0)

      // masked column in a predicate folds to no rows, not an error
      assert(spark.sql(
        "SELECT count(*) FROM employees_sec WHERE first_name = 'Audrey'")
        .first().getLong(0) == 0)

      // unprotected tables untouched even for the BI role
      graft.gen.ActivityGen.employees(spark, n = 5)
        .createOrReplaceTempView("employees_open")
      assert(spark.sql("SELECT first_name FROM employees_open WHERE first_name IS NOT NULL")
        .count() == 5)
    } finally {
      spark.conf.set("graft.mask.biuser", "false")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
