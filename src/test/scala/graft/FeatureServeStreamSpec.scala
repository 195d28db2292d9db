package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FeatureServe
import graft.streaming.FeatureServe.{EventIn, FeatRow}

/** The streamed point-in-time feature rows equal the batch
  * `q_feature_matrix` bit-for-bit over an event-time-ordered replay —
  * across a checkpoint restart, with a same-microsecond click/purchase
  * collision crossing the boundary check. */
class FeatureServeStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed feature rows equal the batch assembler across a restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // event-time-ordered replay (us, event_id) — the watermark-clean feed;
    // out-of-order arrival needs retractions, which the batch twin defines
    val all = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[EventIn].collect().sortBy(e => (e.us, e.event_id))
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("fs_cp").toString
    val out = java.nio.file.Files.createTempDirectory("fs_out").toString
    val mem = MemoryStream[EventIn]

    def start() = FeatureServe.serve(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    val streamed = spark.read.parquet(out).as[FeatRow].collect()
      .map(r => (r.event_id, r.user_id, r.n_click_before, r.n_view_before,
        r.n_error_before, r.label_cents)).toSet
    val batch = graft.operators.Temporal.featureMatrix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // counters genuinely accumulate: some purchase saw a nonzero feature
    assert(streamed.exists(r => r._3 > 0 || r._4 > 0 || r._5 > 0))
  }
}
