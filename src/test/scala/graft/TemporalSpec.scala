package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** As-of and range joins: semantics pinned on a hand-built event fixture
  * (equal-timestamp inclusion, no-prior-match null, exclusive upper bound). */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** events fixture written with the real table's schema (µs timestamps). */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("temporal").toString
    Seq(
      // user 1: signup at 10:00 (and a later one at 11:00), purchases around
      (0L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (1L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "signup", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 6.0, "{}"), // equal ts: matches signup 2
      (4L, ts("2024-01-01 12:30:00"), 1L, "purchase", 7.0, "{}"),
      // user 2: purchase BEFORE any signup -> null attribution
      (5L, ts("2024-01-01 09:00:00"), 2L, "purchase", 1.0, "{}"),
      (6L, ts("2024-01-01 09:30:00"), 2L, "signup", 0.0, "{}"),
      // user 3: error at 10:00; purchases at 10:00, 10:59:59, 11:00 (excl)
      (7L, ts("2024-01-01 10:00:00"), 3L, "error", 0.0, "{}"),
      (8L, ts("2024-01-01 10:00:00"), 3L, "purchase", 1.0, "{}"),
      (9L, ts("2024-01-01 10:59:59"), 3L, "purchase", 1.0, "{}"),
      (10L, ts("2024-01-01 11:00:00"), 3L, "purchase", 1.0, "{}"),
      // user 4: error with no purchases at all -> zero count
      (11L, ts("2024-01-01 10:00:00"), 4L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("as-of join attributes each purchase to the latest prior signup") {
    val got = Temporal.asofAttribution(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((Some(0L), Some(1800000000L))))    // 10:30 -> 10:00 signup
    assert(got(3L) == ((Some(2L), Some(0L))))             // equal ts included
    assert(got(4L) == ((Some(2L), Some(5400000000L))))    // latest, not first
    assert(got(5L) == ((None, None)))                     // purchase before signup
  }

  test("range join counts purchases in [ts, ts+1h) with exclusive upper bound") {
    val got = Temporal.rangeJoinCount(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(7L) == 2L)  // 10:00 (inclusive) + 10:59:59; 11:00 excluded
    assert(got(11L) == 0L) // zero-count errors are kept
  }

  test("as-of and range joins over the real events table are deterministic") {
    val sf = "/root/testdata/sf0.001"
    val a1 = Temporal.asofAttribution(spark, sf).collect().toSet
    val a2 = Temporal.asofAttribution(spark, sf).collect().toSet
    assert(a1 == a2 && a1.nonEmpty)
    val r = Temporal.rangeJoinCount(spark, sf)
    assert(r.count() > 0)
  }
}
