package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("approximate aggregates land within tolerance of exact") {
    import spark.implicits._
    val rows = graft.operators.Relational.approxStats(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
      assert(!r.isNullAt(r.fieldIndex("approx_p50")))
    }
  }
}
