package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Upsert
import graft.streaming.Upsert.{Change, StateOut}

/** Streaming latest-wins upsert matches the batch SCD1 merge contract:
  * insert-then-update typing, stale out-of-order changes ignored, state
  * across batches and across a checkpointed restart. */
class UpsertStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("changelog types inserts vs updates and drops stale changes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = Upsert.upsert(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("upsert_out").start()
    try {
      // batch 1: two keys, arrival order scrambled — latest (ts, id) wins
      mem.addData(
        Change(1, 10, ts("2024-01-01 10:30:00"), 5.0),
        Change(1, 11, ts("2024-01-01 10:00:00"), 3.0), // older: loses
        Change(2, 20, ts("2024-01-01 09:00:00"), 7.0))
      q.processAllAvailable()
      // batch 2: key 1 advances; key 2 gets a STALE change (ignored, no row)
      mem.addData(
        Change(1, 12, ts("2024-01-01 11:00:00"), 9.0),
        Change(2, 21, ts("2024-01-01 08:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from upsert_out").as[StateOut].collect()
      val b1 = rows.filter(_.change_type == "insert").map(r => r.user_id -> r.value).toMap
      assert(b1 == Map(1L -> 5.0, 2L -> 7.0), s"inserts wrong: ${rows.toSeq}")
      val ups = rows.filter(_.change_type == "update")
      assert(ups.length == 1 && ups.head.user_id == 1 && ups.head.value == 9.0,
        s"stale change must not emit: ${rows.toSeq}")
    } finally q.stop()
  }

  test("two changes within one millisecond resolve by microsecond order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = Upsert.upsert(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("upsert_us_out").start()
    try {
      // same millisecond (.001), different microseconds: the .001999 change
      // is NEWER despite its SMALLER event_id — a ms-precision fold would
      // fall through to the event_id tie-break and pick the wrong row
      val newer = ts("2024-01-01 10:00:00.001999")
      mem.addData(
        Change(5, 50, newer, 8.0),
        Change(5, 51, ts("2024-01-01 10:00:00.001001"), 6.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from upsert_us_out").as[StateOut].collect()
      assert(rows.length == 1 && rows.head.value == 8.0,
        s"µs order must win over event_id tie-break: ${rows.toSeq}")
      assert(rows.head.last_ts == newer,
        s"last_ts must keep µs precision: ${rows.head.last_ts} vs $newer")
    } finally q.stop()
  }

  test("upsert state survives a checkpointed query restart") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("upsert_cp").toString
    val out = Files.createTempDirectory("upsert_out").toString
    val mem = MemoryStream[Change]
    def start() = Upsert.upsert(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()
    val q1 = start()
    mem.addData(Change(7, 70, ts("2024-01-01 10:00:00"), 2.0))
    q1.processAllAvailable()
    q1.stop()
    // restart: the recovered state must type the next change as an UPDATE
    val q2 = start()
    mem.addData(Change(7, 71, ts("2024-01-01 11:00:00"), 4.0))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out).as[StateOut].collect()
    assert(rows.map(r => r.change_type -> r.value).toSet ==
      Set("insert" -> 2.0, "update" -> 4.0),
      s"state not recovered across restart: ${rows.toSeq}")
  }
}
