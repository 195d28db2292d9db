package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TxnTable
import graft.streaming.TxnSink

/** One streamed activity row for the TxnSink contract tests. */
case class SinkRow(id: Long, v: String)

/** Exactly-once streaming append into a TxnTable: batches become log
  * versions, redelivered batches are no-ops (content exactly-once), a
  * checkpointed restart continues the version chain, and the committed
  * stream history stays time-travelable. */
class TxnSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ids(root: String): Seq[Long] = {
    import spark.implicits._
    TxnTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq
  }

  test("each micro-batch commits one version; redelivery writes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("txnsink").toString
    val ckpt = Files.createTempDirectory("txnsink_ckpt").toString
    val mem = MemoryStream[SinkRow]
    val q = TxnSink.ingest(mem.toDF(), root, ckpt,
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(SinkRow(1, "a"), SinkRow(2, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val v = TxnTable.latestVersion(root)
    assert(ids(root) == Seq(1L, 2L))
    // redelivery of the same batch id: content must not duplicate
    val again = TxnTable.appendOnce(
      Seq(SinkRow(1, "a"), SinkRow(2, "b")).toDF(), root, "cdc-ingest#batch-0")
    assert(again <= v, "redelivered batch must resolve to its original version")
    assert(TxnTable.latestVersion(root) == v, "no new version on redelivery")
    assert(ids(root) == Seq(1L, 2L), "no duplicate rows on redelivery")
  }

  test("a checkpointed restart continues the version chain exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("txnsink2").toString
    val ckpt = Files.createTempDirectory("txnsink2_ckpt").toString
    val mem1 = MemoryStream[SinkRow]
    val q1 = TxnSink.ingest(mem1.toDF(), root, ckpt,
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem1.addData(SinkRow(1, "a"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(ids(root) == Seq(1L))
    // a DIFFERENT writer (own app id + checkpoint) appends to the same
    // table: its batch 0 must not collide with the first writer's batch 0
    val mem2 = MemoryStream[SinkRow]
    val q2 = TxnSink.ingest(mem2.toDF(), root,
      Files.createTempDirectory("txnsink2_ckpt_b").toString,
      appId = "writer-2", trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem2.addData(SinkRow(2, "b"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ids(root) == Seq(1L, 2L))
    // the stream's history is time-travelable: version 0 is batch 1 alone
    assert(TxnTable.readVersion(spark, root, 0).count() == 1L)
  }

  test("partitioned streaming ingest: batch 0 fixes the layout, redelivery dedups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("txnsink_part").toString
    val ckpt = Files.createTempDirectory("txnsink_part_ckpt").toString
    val mem = MemoryStream[SinkRow]
    val q = TxnSink.ingest(mem.toDF(), root, ckpt,
      trigger = Trigger.ProcessingTime("0 seconds"), partCols = Seq("v"))
    try {
      mem.addData(SinkRow(1, "a"), SinkRow(2, "b"))
      q.processAllAvailable()
      mem.addData(SinkRow(3, "a"))
      q.processAllAvailable()
    } finally q.stop()
    // the table is hive-partitioned by v; partition pruning works on it
    val snap = TxnTable.read(spark, root)
    assert(snap.count() == 3)
    assert(TxnTable.skippingReport(root,
      org.apache.spark.sql.functions.col("v") === "a")._2 >= 1,
      "streamed partitions must prune")
    // redelivered batch writes nothing, and the layout is locked
    val v = TxnTable.latestVersion(root)
    TxnTable.appendOnce(Seq(SinkRow(1, "a"), SinkRow(2, "b")).toDF(), root,
      "cdc-ingest#batch-0", Seq("v"))
    assert(TxnTable.latestVersion(root) == v)
    intercept[IllegalArgumentException](TxnTable.appendOnce(
      Seq(SinkRow(9, "z")).toDF(), root, "other#batch-0", Seq("id")))
  }
}
