package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("approximate aggregates land within their documented error bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relational.approxStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_bounds"),
        s"${r.getAs[String]("event_type")}: HLL estimate outside 3·rsd")
      assert(r.getAs[Boolean]("p50_within_bounds"),
        s"${r.getAs[String]("event_type")}: approx p50 outside rank bound")
    }
    // the emitted exacts really are exact: independent recomputation
    val expect = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("e"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (e, c) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("exact_users") == e && r.getAs[Long]("cnt") == c)
    }
    // the sketch itself stays inside its tighter advertised rsd at this sf
    val tight = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("a"), countDistinct($"user_id").as("e"))
      .collect()
    tight.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
    }
  }
}
