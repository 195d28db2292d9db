package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity through the NATIVE session_window operator: the
  * streaming form (watermark + append mode) must emit exactly the sessions
  * the batch `q_session_window` aggregate computes, once the watermark
  * passes them — including across a checkpoint restart mid-stream. The
  * custom-state sessionizer (SessionizeStreamSpec) proves the same
  * semantics via flatMapGroupsWithState; this pins the built-in path. */
class SessionWindowStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed native session windows equal the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value")
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val maxTs = rows.map(_._2.getTime).max
    // sentinel advances the watermark past every real session's close
    val sentinel = (-1L, new Timestamp(maxTs + 86400L * 1000), 0.0)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("sw_cp").toString
    val out = java.nio.file.Files.createTempDirectory("sw_out").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]

    def start() = mem.toDS()
      .toDF("user_id", "ts", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select($"user_id", $"sw.start".as("sess_start"), $"sw.end".as("sess_close"),
        $"n_events", $"sum_value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      mem.addData(h2.toIndexedSeq :+ sentinel); q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(out)
      .filter($"user_id" =!= -1L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = graft.operators.Relational.sessionWindowAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
