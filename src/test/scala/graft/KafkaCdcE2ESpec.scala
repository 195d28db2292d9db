package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnTable
import graft.streaming.{CdcIngest, TxnSink}

/** The reference's WHOLE streaming pipeline (SaveDelta.scala:104-163) as
  * one continuous path over a real TCP socket, end to end:
  *
  *   broker (RecordBatch v2 frames) → `kafka-lite` source (ApiVersions /
  *   Metadata / ListOffsets / Fetch v4) → Debezium-envelope `from_json`
  *   parse (P1-P4: extraction, casts, epoch-µs formatting, null-id drop)
  *   → exactly-once [[TxnSink]] → time-travelable [[TxnTable]].
  *
  * Everything between the socket and the table is production code; only
  * the broker is a test double ([[KafkaBrokerStub]]). */
class KafkaCdcE2ESpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def envelope(id: Int, emp: Int, us: Long, sport: String): String =
    s"""{"payload": {"after": {"id": $id, "id_employee": $emp, "start_datetime": $us, "sport_type": "$sport", "distance": 5.5, "activity_duration": 3600, "comment": null}}}"""

  test("wire-to-table: Kafka frames parse as CDC envelopes into a TxnTable") {
    val broker = new KafkaBrokerStub
    val dir = Files.createTempDirectory("cdc-e2e").toString
    val table = s"$dir/activities"
    try {
      def rec(v: String) = (1700000000000L, null: Array[Byte], v.getBytes(UTF_8))
      broker.append("cdc", 0, Seq(
        rec(envelope(1, 10, 1700000000000000L, "Course")),
        rec(envelope(2, 11, 1700000060000000L, "Natation")),
        rec("""{"payload": {"before": {"id": 9}}}"""), // delete: no after.id → dropped
        rec("""{"payload": {"after": {"id_employee": 3, "sport_type": "Marche"}}}""")))

      val parsed = CdcIngest.parseEnvelope(
        graft.sources.Sources.kafkaLiteStream(
          spark, s"${broker.host}:${broker.port}", "cdc"))
      val q = TxnSink.ingest(parsed, table, s"$dir/ckpt",
        appId = "e2e", trigger = Trigger.ProcessingTime(0))
      try {
        q.processAllAvailable()
        val got = TxnTable.read(spark, table)
          .select("id", "id_employee", "start_datetime", "sport_type", "distance")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
            r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
        assert(got == Seq(
          (1, 10, "2023-11-14 22:13:20", "Course", 5.5),
          (2, 11, "2023-11-14 22:14:20", "Natation", 5.5)), got)

        // live producer append → next micro-batch lands as its own commit,
        // and the PRE-append version stays time-travelable
        val v0 = TxnTable.latestVersion(table)
        broker.append("cdc", 0, Seq(rec(envelope(3, 12, 1700000120000000L, "Velo"))))
        q.processAllAvailable()
        assert(TxnTable.latestVersion(table) > v0, "new batch must commit")
        assert(TxnTable.read(spark, table).count() == 3)
        assert(TxnTable.readVersion(spark, table, v0).count() == 2,
          "pre-append version must remain readable")
      } finally q.stop()
    } finally broker.close()
  }
}
