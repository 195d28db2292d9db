package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftMonitor

/** Top-level (encoder rule): one streamed scored event. */
case class ScoredEvent(event_type: String, value: Double)

/** Streaming drift monitor: per-batch TVD against the stored baseline is
  * EXACT (integer cross-multiplication — assertable to the bit), a
  * matching distribution reads 0, a fully shifted one reads its true
  * distance, and types absent from a batch emit nothing. */
class DriftMonitorStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("per-batch TVD vs stored baseline is exact; absent types silent") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val basePath = Files.createTempDirectory("drift_base").toString
    val outPath = Files.createTempDirectory("drift_out").toString
    val cp = Files.createTempDirectory("drift_cp").toString
    // baseline: type A half bucket0 (value<50) half bucket1; type B all bucket0
    DriftMonitor.writeBaseline(
      Seq(
        ScoredEvent("A", 10.0), ScoredEvent("A", 20.0),
        ScoredEvent("A", 60.0), ScoredEvent("A", 70.0),
        ScoredEvent("B", 5.0), ScoredEvent("B", 15.0)).toDF(),
      basePath)
    val mem = MemoryStream[ScoredEvent]
    val q = DriftMonitor.driftStream(spark, basePath, mem.toDF(), outPath, cp)
    try {
      // batch 0: type A fully shifted into bucket0 — TVD = 1/2 exactly
      // (baseline [2,2] n=4 vs batch [4,0] n=4:
      //  |2*4-4*4| + |2*4-0*4| = 16; 16 / (2*4*4) = 0.5); type B absent
      mem.addData(
        ScoredEvent("A", 1.0), ScoredEvent("A", 2.0),
        ScoredEvent("A", 3.0), ScoredEvent("A", 4.0))
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$outPath/batch_id=0")
      assert(b0.count() == 1, "type B has no batch evidence — no row")
      val r0 = b0.head
      assert(r0.getAs[String]("event_type") == "A")
      assert(r0.getAs[Long]("n_base") == 4 && r0.getAs[Long]("n_batch") == 4)
      assert(r0.getAs[Double]("tvd") == 0.5, s"exact TVD expected: $r0")
      // batch 1: type A matches the baseline shape — TVD exactly 0;
      // type B doubles its baseline count but keeps the shape — also 0
      mem.addData(
        ScoredEvent("A", 11.0), ScoredEvent("A", 61.0),
        ScoredEvent("B", 6.0), ScoredEvent("B", 7.0),
        ScoredEvent("B", 8.0), ScoredEvent("B", 9.0))
      q.processAllAvailable()
      val b1 = spark.read.parquet(s"$outPath/batch_id=1")
        .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("tvd")).toMap
      assert(b1 == Map("A" -> 0.0, "B" -> 0.0),
        s"shape-preserving batches must read zero drift: $b1")
    } finally q.stop()
  }
}
