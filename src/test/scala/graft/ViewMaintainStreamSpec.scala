package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ViewMaintain
import graft.streaming.ViewMaintain.{Change, ViewRow}

/** The streaming counting-algorithm view equals the batch `q_ivm_agg`
  * maintenance result over the same changelog — across a checkpoint
  * restart, with retractions crossing the restart boundary — and zeroed
  * keys surface as `delete` emissions rather than ghost rows. */
class ViewMaintainStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** The exact changelog q_ivm_agg consumes: pre-cutoff purchases are the
    * base insertions; post-cutoff rows insert; bucket-0 pre-cutoff rows
    * retract. Ordered (base, then delta) like the batches that built it. */
  private def changelog(): (Seq[Change], Seq[Change]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val ch = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bucket = expr(
      "cast(conv(substr(md5(cast(cast(event_id as string) as binary)), 1, 4), 16, 10) as int) % 7")
    val base = ch.filter($"ts" < cutoff)
      .select($"user_id", lit(1L).as("sign"), $"cents", $"event_id")
    val dels = ch.filter($"ts" < cutoff).filter(bucket === 0)
      .select($"user_id", lit(-1L).as("sign"), $"cents", $"event_id")
    val ins = ch.filter($"ts" >= cutoff)
      .select($"user_id", lit(1L).as("sign"), $"cents", $"event_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .sortBy(_.getLong(3)).map(r => Change(r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    (rows(base), rows(dels) ++ rows(ins))
  }

  test("streamed view equals batch IVM across a restart; zeroed keys emit delete") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (baseBatch, deltaBatch) = changelog()
    val cp = java.nio.file.Files.createTempDirectory("vm_cp").toString
    val out = java.nio.file.Files.createTempDirectory("vm_out").toString
    val mem = MemoryStream[Change]

    def start() = ViewMaintain.maintain(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(baseBatch.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(deltaBatch.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    val emitted = spark.read.parquet(out).as[ViewRow].collect()
    val latest = emitted.groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.version) }
    val live = latest.values.filter(_.op == "upsert")
      .map(v => (v.user_id, v.n_purchases, v.revenue_cents)).toSet
    val batchView = graft.operators.Lakehouse.ivmAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(live == batchView)
    // deleted keys must NOT appear in the batch view, and each carries a
    // zeroed aggregate (the counting algorithm's garbage marker)
    val deleted = latest.values.filter(_.op == "delete").toSeq
    assert(deleted.forall(v => v.n_purchases == 0L),
      s"non-zero delete emission: $deleted")
    val batchKeys = batchView.map(_._1)
    assert(deleted.forall(v => !batchKeys.contains(v.user_id)))
    // every key fed is accounted for: upsert or delete
    assert(latest.keySet == (baseBatch ++ deltaBatch).map(_.user_id).toSet)
  }
}
