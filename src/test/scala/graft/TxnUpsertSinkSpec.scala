package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable
import graft.streaming.TxnUpsertSink

/** One CDC change image for the upsert-sink contract tests. */
case class UpsertRow(id: Long, v: String, seq: Long)

/** Exactly-once streaming KEYED UPSERT into a TxnTable via mergeDvOnce:
  * each micro-batch is one merge-on-read commit (replaced rows DV-marked,
  * batch rows in new files), redelivered batches merge zero times more,
  * batch 0 creates the table, seqCol picks last-wins inside a batch, and
  * the table reads as the latest state per key at every version. */
class TxnUpsertSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def state(root: String): Map[Long, String] = {
    import spark.implicits._
    TxnTable.read(spark, root).select("id", "v")
      .as[(Long, String)].collect().toMap
  }

  test("micro-batches upsert exactly-once; touched files never rewrite") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("upsert_sink").toString
    val ckpt = Files.createTempDirectory("upsert_sink_ckpt").toString
    val mem = MemoryStream[UpsertRow]
    val q = TxnUpsertSink.upsert(mem.toDF().drop("seq"), root, ckpt,
      keys = Seq("id"), trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData((1L to 50L).map(i => UpsertRow(i, s"v$i", 0)): _*) // creates
      q.processAllAvailable()
      val filesV0 = FsTest.walk(Paths.get(root, "data")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSet
      mem.addData(UpsertRow(3, "v3'", 0), UpsertRow(51, "v51", 0))   // merges
      q.processAllAvailable()
      val filesV1 = FsTest.walk(Paths.get(root, "data")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSet
      assert(filesV0.subsetOf(filesV1), "upsert batch must not rewrite files")
    } finally q.stop()
    assert(state(root) ==
      ((1L to 50L).map(i => i -> s"v$i").toMap + (3L -> "v3'") + (51L -> "v51")))
    // exactly-once: re-applying batch 1's token merges nothing
    val v = TxnTable.latestVersion(root)
    TxnUpsertSink.applyBatch(
      Seq((3L, "v3'"), (51L, "v51")).toDF("id", "v"), root, Seq("id"),
      None, "cdc-upsert#batch-1", Nil, 0.1)
    assert(TxnTable.latestVersion(root) == v, "redelivery must commit nothing")
    // history: version 0 is the initial state, version 1 the first merge
    assert(TxnTable.readVersion(spark, root, 0L).count() == 50)
    assert(TxnTable.readVersion(spark, root, 1L).count() == 51)
  }

  test("checkpointed restart continues the upsert chain exactly-once") {
    import spark.implicits._
    // a FILE source (MemoryStream does not survive checkpoint recovery):
    // each parquet drop is a micro-batch; the restart resumes from the
    // checkpointed offset and keeps upserting into the same table
    val srcDir = Files.createTempDirectory("upsert_src").toString
    val root = Files.createTempDirectory("upsert_sink2").toString
    val ckpt = Files.createTempDirectory("upsert_sink2_ckpt").toString
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)
    def stream = spark.readStream
      .schema("id LONG, v STRING").parquet(srcDir)
    drop(Seq(1L -> "a", 2L -> "b"))
    val q1 = TxnUpsertSink.upsert(stream, root, ckpt,
      keys = Seq("id"), trigger = Trigger.ProcessingTime("0 seconds"))
    try q1.processAllAvailable() finally q1.stop()
    assert(state(root) == Map(1L -> "a", 2L -> "b"))
    // restart from the same checkpoint: only the NEW file arrives, the
    // merge applies it once, and the earlier state persists
    drop(Seq(2L -> "b2", 3L -> "c"))
    val q2 = TxnUpsertSink.upsert(stream, root, ckpt,
      keys = Seq("id"), trigger = Trigger.ProcessingTime("0 seconds"))
    try q2.processAllAvailable() finally q2.stop()
    assert(state(root) == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("concurrent mergeDvOnce with one token merges exactly once") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = Files.createTempDirectory("upsert_race").toString
    TxnTable.append((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), root)
    val delta = Seq((1L, "upd"), (999L, "new")).toDF("id", "v")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fs = (0 until 4).map { _ =>
      Future { gate.await()
        TxnTable.mergeDvOnce(spark, delta, root, Seq("id"), "batch-0") }
    }
    gate.countDown()
    val vs = Await.result(Future.sequence(fs), 120.seconds)
    assert(vs.toSet.size == 1, s"one token must mean one merge, got $vs")
    assert(TxnTable.read(spark, root).count() == 51,
      "a doubled merge would re-insert or re-mark")
    assert(state(root)(1L) == "upd" && state(root)(999L) == "new")
  }

  test("seqCol picks last-wins inside a batch; partitioned layout holds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("upsert_sink3").toString
    val ckpt = Files.createTempDirectory("upsert_sink3_ckpt").toString
    val mem = MemoryStream[UpsertRow]
    val q = TxnUpsertSink.upsert(mem.toDF(), root, ckpt,
      keys = Seq("id"), seqCol = Some("seq"),
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      // three images of key 1 in ONE batch: seq 30 must win
      mem.addData(UpsertRow(1, "old", 10), UpsertRow(1, "mid", 20),
        UpsertRow(1, "new", 30), UpsertRow(2, "x", 5))
      q.processAllAvailable()
      mem.addData(UpsertRow(2, "x2", 9), UpsertRow(2, "x1", 7))
      q.processAllAvailable()
    } finally q.stop()
    assert(state(root) == Map(1L -> "new", 2L -> "x2"))
  }
}
