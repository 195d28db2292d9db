package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CusumStream
import graft.streaming.CusumStream.{CuOut, DayPoint}

/** Streaming CUSUM equals the batch closed form S = P − min(0, min prefix)
  * over the same day series — across micro-batches, with scrambled
  * intra-batch arrival order, and across a checkpointed restart. */
class CusumStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def d(s: String) = Date.valueOf(s)

  /** Driver-side replay of the batch window form. */
  private def batchForm(xs: Seq[(String, Long)], target: Long,
                        threshold: Long): Seq[(String, Long, Boolean)] = {
    var p = 0L; var minP = 0L
    xs.map { case (day, x) =>
      p += x - target
      minP = math.min(minP, p)
      val s = p - math.min(minP, 0L)
      (day, s, s > threshold)
    }
  }

  test("incremental S equals the batch closed form across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DayPoint]
    val q = CusumStream.monitor(mem.toDS(), target = 100L, threshold = 50L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      // batch 1 scrambled: the operator must sort by day before folding
      mem.addData(
        DayPoint("rev", d("2024-01-03"), 180L),
        DayPoint("rev", d("2024-01-01"), 120L),
        DayPoint("rev", d("2024-01-02"), 60L))
      q.processAllAvailable()
      mem.addData(
        DayPoint("rev", d("2024-01-04"), 90L),
        DayPoint("rev", d("2024-01-05"), 200L))
      q.processAllAvailable()
      val got = spark.sql("SELECT day, s, alarm FROM cusum_out ORDER BY day")
        .as[(Date, Long, Boolean)].collect().toSeq
        .map { case (dy, s, a) => (dy.toString, s, a) }
      val want = batchForm(Seq(
        "2024-01-01" -> 120L, "2024-01-02" -> 60L, "2024-01-03" -> 180L,
        "2024-01-04" -> 90L, "2024-01-05" -> 200L), 100L, 50L)
      assert(got == want, s"streaming fold diverges from batch: $got vs $want")
    } finally q.stop()
  }

  test("state survives a checkpointed restart; continuation stays bit-equal") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("cusum_ckpt").toString
    val out = Files.createTempDirectory("cusum_out").toString
    val mem = MemoryStream[DayPoint]
    def start() = CusumStream.monitor(mem.toDS(), 100L, 50L)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      mem.addData(DayPoint("rev", d("2024-01-01"), 120L),
        DayPoint("rev", d("2024-01-02"), 60L))
      q1.processAllAvailable()
    } finally q1.stop()
    mem.addData(DayPoint("rev", d("2024-01-03"), 180L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).selectExpr("cast(day as string)", "s", "alarm")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    val want = batchForm(Seq(
      "2024-01-01" -> 120L, "2024-01-02" -> 60L, "2024-01-03" -> 180L),
      100L, 50L)
    assert(got == want, s"restart broke the fold: $got vs $want")
  }
}
