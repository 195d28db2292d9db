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

  // a long replay: one change per minute for 300 minutes, every odd-indexed
  // change delivered AFTER its successor (2-minute disorder, well inside the
  // horizon) — the adversarial shape for both the splice logic and the
  // compactor
  private def longReplay: Seq[Change] = {
    val base = ts("2024-03-01 00:00:00").getTime
    val ordered = (0 until 300).map { i =>
      Change(1, 1000 + i, new Timestamp(base + i * 60000L), i.toDouble)
    }
    ordered.grouped(2).flatMap {
      case Seq(a, b) => Seq(b, a) // deliver each pair out of order
      case other     => other
    }.toSeq
  }

  test("horizon compaction bounds state while the changelog stays exact") {
    import spark.implicits._
    val horizonUs = Some(10L * 60 * 1000 * 1000) // 10 minutes
    // fold the PURE transition (the exact function the stream runs),
    // one change per micro-batch — the worst case for state growth
    var state = Scd2.Scd2State(Nil, 0L, 0L)
    var outs = Vector.empty[Scd2.VersionOut]
    var maxLive = 0
    longReplay.foreach { c =>
      val (next, out) = Scd2.step(1L, state, Seq(c), horizonUs)
      state = next
      outs ++= out
      maxLive = math.max(maxLive, next.versions.size)
    }
    // bound: versions open or closed within the 10-minute horizon — ≤ 12
    // with 1-minute spacing and 2-minute disorder; 300 without compaction
    assert(maxLive <= 13, s"state grew to $maxLive versions — compaction is not firing")
    assert(state.versions.size < 20 && outs.nonEmpty)

    // exactness: the reduced changelog == the batch window construction
    val evDir = java.nio.file.Files.createTempDirectory("scd2_long").toString
    longReplay.toDF()
      .select($"user_id", $"event_id", $"ts", $"value",
        lit("purchase").as("event_type"))
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val expect = graft.operators.Relational.scd2History(spark, evDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_id").orderBy($"rev".desc)
    val got = outs.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id", $"value",
        $"valid_from", $"valid_to", $"is_current")
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "compacted-state changelog must materialize to the exact batch history")
  }

  test("compacting stream recovers from checkpoint and matches batch") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("scd2c_cp").toString
    val out = Files.createTempDirectory("scd2c_out").toString
    val mem = MemoryStream[Change]
    val horizonUs = Some(10L * 60 * 1000 * 1000)
    def start() = Scd2.history(mem.toDS(), horizonUs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val (first, second) = longReplay.splitAt(150)
    val q1 = start()
    first.grouped(50).foreach(mem.addData)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start() // recovered mid-replay; compacted state must resume
    second.grouped(50).foreach(mem.addData)
    q2.processAllAvailable()
    q2.stop()

    val evDir = Files.createTempDirectory("scd2c_ev").toString
    longReplay.toDF()
      .select($"user_id", $"event_id", $"ts", $"value",
        lit("purchase").as("event_type"))
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val expect = graft.operators.Relational.scd2History(spark, evDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_id").orderBy($"rev".desc)
    val got = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id", $"value",
        $"valid_from", $"valid_to", $"is_current")
    assert(got.count() == expect.count(),
      s"row counts differ: ${got.count()} vs ${expect.count()}")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "restart-recovered compacting stream must equal the batch history")
  }
}
