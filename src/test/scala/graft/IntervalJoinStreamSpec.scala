package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IntervalJoin

/** Stream-stream interval join: matches agree with the batch range join's
  * window semantics ([ts, ts+1h), same-user only) on a live two-stream run. */
object IntervalJoinStreamSpec {
  case class Ev(event_id: Long, user_id: Long, ts: Timestamp)
}

class IntervalJoinStreamSpec extends AnyFunSuite {
  import IntervalJoinStreamSpec.Ev
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("two live streams join within the hour window; boundary is exclusive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[Ev]
    val purch = MemoryStream[Ev]
    val q = IntervalJoin.errorPurchases(errs.toDS().toDF(), purch.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      errs.addData(
        Ev(7, 3, ts("2024-01-01 10:00:00")),   // window [10:00, 11:00)
        Ev(11, 4, ts("2024-01-01 10:00:00")))  // no purchases for user 4
      purch.addData(
        Ev(8, 3, ts("2024-01-01 10:00:00")),   // inclusive lower bound
        Ev(9, 3, ts("2024-01-01 10:59:59")),   // inside
        Ev(10, 3, ts("2024-01-01 11:00:00")),  // exclusive upper bound
        Ev(20, 9, ts("2024-01-01 10:30:00")))  // different user
      q.processAllAvailable()
      val got = spark.sql("select * from ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((7L, 3L, 8L), (7L, 3L, 9L)), got.mkString("; "))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches a live stream from a dimension table") {
    // the standard streaming-enrichment shape: the static side broadcasts,
    // the stream never shuffles, no state is kept (unlike stream-stream)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((3L, "gold"), (4L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val joined = mem.toDS().toDF()
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    try {
      mem.addData(Ev(1, 3, ts("2024-01-01 10:00:00")),
        Ev(2, 9, ts("2024-01-01 10:01:00"))) // user 9 not in dim -> null tier
      q.processAllAvailable()
      val got = spark.sql("select event_id, tier from ss_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> None))
    } finally q.stop()
  }
}
