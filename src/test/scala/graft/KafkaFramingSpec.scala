package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KafkaFraming

/** Kafka RecordBatch v2 wire codec: byte-level layout golden checks (the
  * format a real broker emits), round-trip semantics incl. tombstones,
  * loud rejection of corruption/compression, and a Structured Streaming
  * case consuming Kafka-framed records through kafka_batch_decode. */
class KafkaFramingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val nullB = null.asInstanceOf[Array[Byte]]

  test("codec round-trips offsets, timestamps, null keys and tombstones") {
    val recs = Seq(
      (1000L, b("k0"), b("v0")),
      (1005L, nullB, b("v1")), // null key (log-compaction-less topic)
      (999L, b("k2"), nullB))  // tombstone value
    val out = KafkaFraming.decode(KafkaFraming.encodeBatch(42L, recs))
    assert(out.map(_.offset) == Seq(42L, 43L, 44L))
    assert(out.map(_.timestampMs) == Seq(1000L, 1005L, 999L))
    assert(out(0).key.toSeq == b("k0").toSeq && out(0).value.toSeq == b("v0").toSeq)
    assert(out(1).key == null && out(1).value.toSeq == b("v1").toSeq)
    assert(out(2).key.toSeq == b("k2").toSeq && out(2).value == null)
  }

  test("wire layout is the broker's: magic 2 at byte 16, spanning batchLength, CRC32C") {
    val frame = KafkaFraming.encodeBatch(7L, Seq((1L, b("k"), b("v"))))
    val bb = java.nio.ByteBuffer.wrap(frame)
    assert(bb.getLong(0) == 7L, "baseOffset")
    assert(bb.getInt(8) == frame.length - 12, "batchLength covers leaderEpoch..end")
    assert(frame(16) == 2.toByte, "magic v2")
    val crc = new java.util.zip.CRC32C
    crc.update(frame, 21, frame.length - 21) // attributes..end
    assert(bb.getInt(17) == crc.getValue.toInt, "stored CRC32C matches recompute")
  }

  test("back-to-back batches in one segment chunk decode in order") {
    val chunk = KafkaFraming.encodeBatch(0L, Seq((1L, b("a"), b("x")))) ++
      KafkaFraming.encodeBatch(100L, Seq((2L, b("b"), b("y")), (3L, b("c"), b("z"))))
    val out = KafkaFraming.decode(chunk)
    assert(out.map(_.offset) == Seq(0L, 100L, 101L))
    assert(out.map(r => new String(r.value, "UTF-8")) == Seq("x", "y", "z"))
  }

  test("corruption fails loudly, never yields garbage rows") {
    val frame = KafkaFraming.encodeBatch(0L, Seq((1L, b("key"), b("value"))))
    val corrupt = frame.clone()
    corrupt(frame.length - 3) = (corrupt(frame.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](KafkaFraming.decode(corrupt))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("jar-blocked codecs (snappy/lz4/zstd) are refused; GZIP round-trips") {
    val frame = KafkaFraming.encodeBatch(0L, Seq((1L, b("k"), b("v"))))
    val sn = frame.clone()
    sn(22) = 2.toByte // attributes low byte: snappy — jar-blocked
    val crc = new java.util.zip.CRC32C
    crc.update(sn, 21, sn.length - 21)
    java.nio.ByteBuffer.wrap(sn).putInt(17, crc.getValue.toInt) // keep CRC valid
    val e = intercept[IllegalArgumentException](KafkaFraming.decode(sn))
    assert(e.getMessage.contains("offline-blocked"))
    // GZIP is JDK-native: a compressed producer batch decodes exactly
    val recs = Seq((5L, b("k1"), b("v1")), (9L, null: Array[Byte], b("v2")),
      (7L, b("k3"), null: Array[Byte]))
    val gzFrame = KafkaFraming.encodeBatch(40L, recs, gzip = true)
    // attributes short (bytes 21-22 of the frame) must say codec 1
    assert((gzFrame(22) & 0x07) == 1, "gzip batch must set codec bits to 1")
    val out = KafkaFraming.decode(gzFrame)
    assert(out.map(r => (r.offset, r.timestampMs,
      Option(r.key).map(new String(_)).orNull,
      Option(r.value).map(new String(_)).orNull)) == Seq(
      (40L, 5L, "k1", "v1"), (41L, 9L, null, "v2"), (42L, 7L, "k3", null)))
  }

  test("streaming consumption: Kafka-framed record batches decode to rows") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val q = mem.toDF().selectExpr("explode(kafka_batch_decode(value)) AS r")
      .selectExpr("r.offset AS offset", "CAST(r.key AS STRING) AS k",
        "CAST(r.value AS STRING) AS v", "r.ts_ms AS ts_ms")
      .writeStream.outputMode("append")
      .format("memory").queryName("kafka_frames_out").start()
    try {
      mem.addData(KafkaFraming.encodeBatch(0L,
        Seq((10L, b("u1"), b("click")), (11L, b("u2"), b("view")))))
      q.processAllAvailable()
      mem.addData(KafkaFraming.encodeBatch(2L, Seq((12L, b("u3"), b("purchase")))))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT offset, k, v, ts_ms FROM kafka_frames_out ORDER BY offset")
        .as[(Long, String, String, Long)].collect().toSeq
      assert(rows == Seq(
        (0L, "u1", "click", 10L),
        (1L, "u2", "view", 11L),
        (2L, "u3", "purchase", 12L)))
    } finally q.stop()
  }
}
