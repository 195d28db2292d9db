package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Scd2
import graft.streaming.Scd2.Change

/** Streaming SCD2 twin: replaying a change stream through the stateful
  * maintainer and materializing its changelog (max-rev row per business
  * version) must equal the batch scd2History window construction over the
  * same changes — across a checkpointed restart, with out-of-order
  * delivery splicing an interval between existing versions, and with
  * same-millisecond changes ordered by microsecond. */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("restart-recovered changelog materializes to the batch SCD2 history") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("scd2_cp").toString
    val out = Files.createTempDirectory("scd2_out").toString
    val mem = MemoryStream[Change]
    def start() = Scd2.history(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val batch1 = Seq(
      Change(1, 100, ts("2024-01-01 10:00:00"), 1.0),
      Change(1, 102, ts("2024-01-01 12:00:00"), 3.0),
      Change(2, 200, ts("2024-01-02 09:00:00"), 7.0))
    val batch2 = Seq(
      // OUT OF ORDER: splices between 100 and 102 — must close 100 at
      // 11:00 (re-emit) and take 12:00 as its own valid_to
      Change(1, 101, ts("2024-01-01 11:00:00"), 2.0),
      // same millisecond, different microseconds: .001001 precedes .001999
      // even though its event_id is larger
      Change(3, 301, ts("2024-01-03 08:00:00.001999"), 5.0),
      Change(3, 302, ts("2024-01-03 08:00:00.001001"), 4.0),
      // replayed delivery of an applied change: must not fork a version
      Change(2, 200, ts("2024-01-02 09:00:00"), 7.0))

    val q1 = start()
    mem.addData(batch1: _*)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start() // recovered from the checkpoint
    mem.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()

    // materialize the changelog: max-rev row per (user_id, event_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_id").orderBy($"rev".desc)
    val got = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id", $"value",
        $"valid_from", $"valid_to", $"is_current")

    // batch twin over the SAME changes, through the real operator
    val evDir = Files.createTempDirectory("scd2_ev").toString
    (batch1 ++ batch2).distinct.toDF()
      .select($"user_id", $"event_id", $"ts", $"value",
        lit("purchase").as("event_type"))
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val expect = graft.operators.Relational.scd2History(spark, evDir)

    assert(got.count() == expect.count(),
      s"row counts differ: ${got.count()} vs ${expect.count()}")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"streaming materialization != batch history\n" +
        s"got: ${got.orderBy($"user_id", $"valid_from").collect().toSeq}\n" +
        s"exp: ${expect.orderBy($"user_id", $"valid_from").collect().toSeq}")

    // the splice really re-emitted version 100 with a corrected close
    val v100 = spark.read.parquet(out)
      .filter($"user_id" === 1 && $"event_id" === 100)
    assert(v100.count() == 2, "closing an interval must append a correction row")
    assert(got.filter($"event_id" === 100).head().getAs[Timestamp]("valid_to")
      == ts("2024-01-01 11:00:00"))
    // µs ordering: 302 (earlier µs) is closed by 301, which stays current
    assert(got.filter($"event_id" === 302).head().getAs[Timestamp]("valid_to")
      == ts("2024-01-03 08:00:00.001999"))
    assert(got.filter($"event_id" === 301).head().getAs[Boolean]("is_current"))
  }
}
