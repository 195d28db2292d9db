package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SketchMonitor
import graft.streaming.SketchMonitor.{SketchOut, UserEvent}

/** Twin + interop proof for the streaming theta-sketch monitor: after two
  * batches and a checkpoint restart, each key's recovered sketch estimate
  * equals the batch exact distinct count (exact mode below the nominal
  * threshold), and the emitted sketch BYTES are consumable by Spark's
  * built-in theta SQL functions — the snapshot rows are mergeable at-rest
  * artifacts, not engine-private state. */
class SketchMonitorStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("recovered sketch state equals batch distinct counts and feeds built-ins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id").as[UserEvent]
      .collect().sortBy(e => (e.event_type, e.user_id))
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("sm_cp").toString
    val out = java.nio.file.Files.createTempDirectory("sm_out").toString
    val mem = MemoryStream[UserEvent]

    def start() = SketchMonitor.monitor(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: recovered sketch must keep absorbing ids
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    val outs = spark.read.parquet(out).as[SketchOut].collect()
    val last = outs.groupBy(_.event_type).map { case (k, rs) => k -> rs.maxBy(_.n_updates) }
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (k, o) =>
      // exact mode (~150 users << 4096 nominal): estimate is bit-exact
      assert(math.round(o.est_users) == batch(k)._1,
        s"$k: streaming estimate ${o.est_users} != exact ${batch(k)._1}")
      assert(o.n_updates == batch(k)._2, s"$k: fed ${o.n_updates} != ${batch(k)._2} rows")
    }
    // interop: the emitted bytes are standard DataSketches compact sketches
    // that Spark's built-in theta functions union and estimate directly
    val merged = spark.read.parquet(out)
      .groupBy($"event_type").agg(max(struct($"n_updates", $"sketch")).as("m"))
      .selectExpr("theta_sketch_estimate(theta_union_agg(m.sketch)) AS est")
      .first()
    val totalExact = graft.sources.Tables.events(spark, sf)
      .agg(countDistinct($"user_id")).first().getLong(0)
    assert(math.round(merged.get(0).toString.toDouble) == totalExact,
      "built-in theta_union_agg over emitted snapshots must equal the global distinct")
  }

  test("quantile monitor: recovered sketch lands on the exact rank and feeds built-ins") {
    import spark.implicits._
    import graft.streaming.SketchMonitor.{QuantileOut, ValueEvent}
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "value").as[ValueEvent]
      .collect().sortBy(e => (e.event_type, e.value))
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("smq_cp").toString
    val out = java.nio.file.Files.createTempDirectory("smq_out").toString
    val mem = MemoryStream[ValueEvent]
    def start() = graft.streaming.SketchMonitor.monitorQuantiles(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()
    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    val last = spark.read.parquet(out).as[QuantileOut].collect()
      .groupBy(_.event_type).map { case (k, rs) => k -> rs.maxBy(_.n_updates) }
    // rank-bound twin proof (KLL compaction is randomized, so byte equality
    // is the wrong contract): each streamed estimate must land within 10%
    // of its requested rank against the full exact value set
    val vals = all.groupBy(_.event_type).view.mapValues(_.map(_.value).sorted).toMap
    last.foreach { case (k, o) =>
      val vs = vals(k)
      assert(o.n_updates == vs.size)
      def rank(x: Double) = vs.count(_ <= x).toDouble / vs.size
      assert(math.abs(rank(o.p50) - 0.5) <= 0.10, s"$k p50 rank ${rank(o.p50)}")
      assert(math.abs(rank(o.p95) - 0.95) <= 0.10, s"$k p95 rank ${rank(o.p95)}")
    }
    // interop: built-in KLL functions merge and query the emitted bytes
    val m = spark.read.parquet(out)
      .groupBy($"event_type").agg(max(struct($"n_updates", $"sketch")).as("m"))
      .selectExpr(
        "kll_sketch_get_quantile_double(kll_merge_agg_double(m.sketch), cast(0.5 as double)) AS gp50")
      .first().getDouble(0)
    val allSorted = all.map(_.value).sorted
    val grank = allSorted.count(_ <= m).toDouble / allSorted.size
    assert(math.abs(grank - 0.5) <= 0.10,
      s"built-in merge of streamed sketches off-rank: $grank")
  }

  test("daily-grain maintainer reproduces the batch at-rest artifact exactly") {
    import spark.implicits._
    import graft.streaming.SketchMonitor.{DailySketchOut, DayUserEvent}
    implicit val sqlCtx = spark.sqlContext
    val all = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(ts as date) AS d", "user_id").as[DayUserEvent]
      .collect().sortBy(e => (e.event_type, e.d.toString, e.user_id))
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("smd_cp").toString
    val out = java.nio.file.Files.createTempDirectory("smd_out").toString
    val mem = MemoryStream[DayUserEvent]
    def start() = graft.streaming.SketchMonitor.monitorDaily(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()
    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    // latest snapshot per (type, day) = the stream-maintained daily artifact
    val streamed = spark.read.parquet(out).as[DailySketchOut].collect()
      .groupBy(o => (o.event_type, o.d.toString)).map { case (_, rs) => rs.maxBy(_.n_updates) }
    // the batch artifact over the same rows — estimates must agree exactly
    // (theta union is order/batching-insensitive on the same input set)
    val batch = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(ts as date) AS d", "user_id")
      .groupBy($"event_type", $"d")
      .agg(expr("theta_sketch_estimate(theta_sketch_agg(user_id))").as("est"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.get(2).toString.toDouble).toMap
    assert(streamed.map(o => (o.event_type, o.d.toString)).toSet == batch.keySet)
    streamed.foreach { o =>
      assert(o.est_users == batch((o.event_type, o.d.toString)),
        s"${o.event_type}/${o.d}: streamed ${o.est_users} != batch artifact")
    }
  }
}
