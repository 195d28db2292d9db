package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-mechanics checks: salting equivalence and bucketed co-located joins. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plain = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("sum"))
    val salted = Skew.saltedCountSum(orders, "o_custkey",
      $"o_totalprice".cast("decimal(18,2)"), $"o_orderkey", buckets = 8)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join equals plain inner join") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customers = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customers, "o_custkey")
      .select($"o_orderkey", $"c_name")
    val salted = Skew.saltedJoin(orders, customers, "o_custkey",
      $"o_orderkey", buckets = 4)
      .select($"o_orderkey", $"c_name")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("bucketed tables join without a shuffle (co-located 100 TB join shape)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("buckets")
    val a = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    a.write.option("path", s"$dir/t_orders").mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("t_orders")
    b.withColumnRenamed("c_custkey", "o_custkey")
      .write.option("path", s"$dir/t_cust").mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("t_cust")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_orders").join(spark.table("t_cust"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == a.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_orders")
      spark.sql("DROP TABLE IF EXISTS t_cust")
    }
  }
}
