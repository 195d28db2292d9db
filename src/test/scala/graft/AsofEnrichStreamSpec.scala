package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AsofEnrich
import graft.streaming.AsofEnrich.{Enriched, EventIn}

/** Streaming as-of enrichment matches the batch as-of contract: latest
  * at-or-before signup, equal-ts inclusion, null before any signup, and
  * state carries across batches. */
class AsofEnrichStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purchases enrich from per-user signup state, within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = AsofEnrich.enrich(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      // batch 1: arrival order scrambled — processing must follow event time
      mem.addData(
        EventIn(1, 1, ts("2024-01-01 10:30:00"), false), // after signup 0
        EventIn(0, 1, ts("2024-01-01 10:00:00"), true),
        EventIn(3, 1, ts("2024-01-01 11:00:00"), false), // equal ts: signup 2 wins
        EventIn(2, 1, ts("2024-01-01 11:00:00"), true),
        EventIn(5, 2, ts("2024-01-01 09:00:00"), false)) // user 2: no signup yet
      q.processAllAvailable()
      // batch 2: state (signup 2) persists for user 1
      mem.addData(EventIn(4, 1, ts("2024-01-01 12:30:00"), false))
      q.processAllAvailable()
      val got = spark.sql("select * from asof_out").as[Enriched].collect()
        .map(e => e.event_id -> e.signup_id).toMap
      assert(got == Map(1L -> Some(0L), 3L -> Some(2L), 4L -> Some(2L), 5L -> None))
    } finally q.stop()
  }

  test("enrichment state survives a checkpointed query restart") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("asof_cp").toString
    val out = Files.createTempDirectory("asof_out").toString
    val mem = MemoryStream[EventIn]
    // memory sink cannot recover from a checkpoint; the parquet sink can
    def start() = AsofEnrich.enrich(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()
    val q1 = start()
    mem.addData(EventIn(0, 7, ts("2024-01-01 10:00:00"), true)) // signup only
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: the user-7 signup must be recovered
    // from the state store, not re-read from the source
    val q2 = start()
    try {
      mem.addData(EventIn(1, 7, ts("2024-01-01 11:00:00"), false))
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[Enriched].collect()
      assert(got.length == 1 && got(0).event_id == 1L && got(0).signup_id == Some(0L),
        got.mkString("; "))
    } finally q2.stop()
  }
}
