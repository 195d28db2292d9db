package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S1 executed end-to-end OVER A REAL SOCKET: the `kafka-lite` source's
  * driver does the ApiVersions handshake + Metadata + ListOffsets against
  * an in-process broker stub, executors open their own connections and
  * Fetch v4 real RecordBatch v2 frames, and micro-batches advance with
  * the broker's log-end offset. Everything on the consuming side is
  * production code ([[graft.sources.KafkaWire]], [[graft.sources.KafkaLite]],
  * [[graft.streaming.KafkaFraming]]); only the broker is a test double. */
class KafkaLiteStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("streams Kafka frames over TCP: handshake, fetch, incremental batches") {
    val broker = new KafkaBrokerStub
    try {
      broker.append("cdc", 0, Seq(
        (1000L, b("k1"), b("insert-1")),
        (1001L, b("k2"), b("insert-2")),
        (1002L, b("k3"), null))) // tombstone
      val df = spark.readStream.format("kafka-lite")
        .option("bootstrap", s"${broker.host}:${broker.port}")
        .option("topic", "cdc")
        .load()
      assert(df.schema.fieldNames.toSeq ==
        Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
      val q = df.selectExpr("offset", "cast(key as string) AS k",
          "cast(value as string) AS v", "unix_millis(timestamp) AS ts")
        .writeStream.format("memory").queryName("klite").start()
      try {
        q.processAllAvailable()
        val got = spark.table("klite")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .sortBy(_._1).toSeq
        assert(got == Seq(
          (0L, "k1", "insert-1", 1000L),
          (1L, "k2", "insert-2", 1001L),
          (2L, "k3", null, 1002L)), got)
        assert(broker.apiVersionsCalls >= 1, "no ApiVersions handshake ran")
        assert(broker.fetchCalls >= 1, "no Fetch ran")

        // new producer batch → next micro-batch picks up EXACTLY the delta
        broker.append("cdc", 0, Seq((2000L, b("k4"), b("update-4"))))
        q.processAllAvailable()
        val all = spark.table("klite").collect()
        assert(all.length == 4, all.toSeq)
        assert(all.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
      } finally q.stop()
    } finally broker.close()
  }

  test("GZIP producer batches and a mid-fetch connection drop are absorbed") {
    val broker = new KafkaBrokerStub
    try {
      // a compression-enabled producer's batch (GZIP RecordBatch v2) plus
      // an uncompressed one — mixed-codec logs are normal on real topics
      broker.append("gz", 0, Seq(
        (100L, b("a"), b("payload-1")),
        (101L, b("b"), b("payload-2"))), gzip = true)
      broker.append("gz", 0, Seq((102L, b("c"), b("payload-3"))))
      // fault injection: the FIRST fetch attempt gets its connection
      // dropped mid-request; the reader must reconnect and re-issue
      broker.dropNextFetches = 1
      val df = spark.readStream.format("kafka-lite")
        .option("bootstrap", s"${broker.host}:${broker.port}")
        .option("topic", "gz")
        .load()
      val q = df.selectExpr("offset", "cast(value as string) AS v")
        .writeStream.format("memory").queryName("klite_gz").start()
      try {
        q.processAllAvailable()
        val got = spark.table("klite_gz")
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
        assert(got == Seq((0L, "payload-1"), (1L, "payload-2"), (2L, "payload-3")), got)
        assert(broker.dropNextFetches == 0, "fault was never injected")
        assert(broker.fetchCalls >= 1)
      } finally q.stop()
    } finally broker.close()
  }

  test("Sources.kafkaLiteStream helper wires the same source") {
    val broker = new KafkaBrokerStub
    try {
      broker.append("t", 0, Seq((5L, null, b("x"))))
      val df = graft.sources.Sources.kafkaLiteStream(
        spark, s"${broker.host}:${broker.port}", "t")
      val q = df.selectExpr("cast(value as string) AS v")
        .writeStream.format("memory").queryName("klite2").start()
      try {
        q.processAllAvailable()
        assert(spark.table("klite2").collect().map(_.getString(0)).toSeq == Seq("x"))
      } finally q.stop()
    } finally broker.close()
  }
}
