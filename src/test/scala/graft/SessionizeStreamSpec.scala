package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.EventIn

class SessionizeStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful streaming sessions: in-batch gap closes, timeout closes trailing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = Sessionize.sessions(mem.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 10 min apart (one session), then one 2 h later
      // (closes session 1 in-batch, opens session 2)
      mem.addData(
        EventIn(1, ts("2024-01-01 10:00:00"), 1.0),
        EventIn(1, ts("2024-01-01 10:10:00"), 2.0),
        EventIn(1, ts("2024-01-01 12:30:00"), 4.0),
        EventIn(2, ts("2024-01-01 10:00:00"), 8.0))
      q.processAllAvailable()
      // watermark is now 12:30 - 30min = 12:00 — user 1's first session
      // closed in-batch AND user 2's 10:30 timeout already fired; user 1's
      // open 12:30 session (timeout 13:00) is still held as state.
      val afterBatch1 = spark.sql("select * from sessions_out").as[Sessionize.SessionOut].collect()
      assert(afterBatch1.length == 2, afterBatch1.mkString("; "))
      val s1 = afterBatch1.filter(_.user_id == 1)
      assert(s1.length == 1 && s1(0).n_events == 2 && s1(0).sum_value == 3.0)

      // advance the watermark far past everyone's gap: timeouts fire
      mem.addData(EventIn(3, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(EventIn(3, ts("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
      val all = spark.sql("select * from sessions_out").as[Sessionize.SessionOut].collect()
      val u1 = all.filter(_.user_id == 1).sortBy(_.sess_start.getTime)
      val u2 = all.filter(_.user_id == 2)
      assert(u1.length == 2, all.mkString("; "))
      assert(u1(1).n_events == 1 && u1(1).sum_value == 4.0)
      assert(u2.length == 1 && u2(0).n_events == 1 && u2(0).sum_value == 8.0)
    } finally q.stop()
  }
}
