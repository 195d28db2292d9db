package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ExactDedupStream

/** Top-level (encoder rule): one streamed document with its pre-computed
  * dedup key and event time. */
case class HashedDoc(doc_id: Long, content_hash: String, ts: Timestamp)

/** Streaming exact dedup: first occurrence kept, within-watermark
  * re-arrivals dropped (intra- and cross-batch), state EVICTED past the
  * watermark (bounded-state proof: an expired key re-emits), and the
  * kept-key state survives a checkpointed restart. */
class ExactDedupStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("drops within-watermark duplicates across batches, keeps first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HashedDoc]
    val q = ExactDedupStream.dedup(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_dedup_out").start()
    try {
      // batch 1: h1 twice in one batch (intra-batch dup), h2 once
      mem.addData(
        HashedDoc(1, "h1", ts("2024-01-01 10:00:00")),
        HashedDoc(2, "h1", ts("2024-01-01 10:00:30")),
        HashedDoc(3, "h2", ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // batch 2: h1 again within the 10-minute watermark → dropped
      mem.addData(HashedDoc(4, "h1", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val ids = spark.sql("select doc_id from exact_dedup_out")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L),
        s"first occurrence per hash must be the only emission: $ids")
    } finally q.stop()
  }

  test("state is watermark-bounded: an evicted key re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HashedDoc]
    val q = ExactDedupStream.dedup(mem.toDF(), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_dedup_evict").start()
    try {
      mem.addData(HashedDoc(1, "h1", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark far past h1's expiry (event time += 1 hour)
      mem.addData(HashedDoc(2, "h2", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // h1's state is evicted — the re-arrival is treated as new. This is
      // the bounded-state contract: state size tracks the window, not the
      // stream's lifetime key cardinality.
      mem.addData(HashedDoc(3, "h1", ts("2024-01-01 11:00:30")))
      q.processAllAvailable()
      val ids = spark.sql("select doc_id from exact_dedup_evict")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L),
        s"evicted key must re-emit after the watermark passes: $ids")
    } finally q.stop()
  }

  test("dedup state survives a checkpointed query restart") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("exact_dedup_cp").toString
    val out = Files.createTempDirectory("exact_dedup_parq").toString
    val mem = MemoryStream[HashedDoc]
    def start() = ExactDedupStream.dedup(mem.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()
    val q1 = start()
    mem.addData(HashedDoc(1, "h1", ts("2024-01-01 10:00:00")))
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: recovered state must still drop h1
    val q2 = start()
    mem.addData(
      HashedDoc(2, "h1", ts("2024-01-01 10:02:00")), // dup: dropped
      HashedDoc(3, "h3", ts("2024-01-01 10:03:00"))) // new: kept
    q2.processAllAvailable()
    q2.stop()
    import spark.implicits._
    val ids = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L),
      s"recovered state must keep dropping pre-restart keys: $ids")
  }
}
