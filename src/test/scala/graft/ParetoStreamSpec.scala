package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ParetoStream
import graft.streaming.ParetoStream.{DocPoint, FrontOut}

/** The streamed Pareto front equals the batch skyline over everything fed
  * — including across a checkpoint restart — because the front-merge is
  * the associative skyline fold and all quantities are exact integers. */
class ParetoStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed front equals the batch skyline after batches and a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS x",
        "cast(size(array_distinct(split(trim(text), '\\\\s+'))) as bigint) AS y")
      .as[DocPoint].collect().sortBy(_.doc_id)
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("ps_cp").toString
    val out = java.nio.file.Files.createTempDirectory("ps_out").toString
    val mem = MemoryStream[DocPoint]

    def start() = ParetoStream.maintain(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    val outs = spark.read.parquet(out).as[FrontOut].collect()
    val latest = outs.map(_.n_seen).max
    assert(latest == all.length, "cumulative count covers every fed point")
    val streamedFront = outs.filter(_.n_seen == latest)
      .map(o => (o.doc_id, o.x, o.y)).toSet
    val batchFront = graft.operators.Selection.paretoDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamedFront == batchFront,
      s"streamed ${streamedFront.size} vs batch ${batchFront.size}")
    // the mid-stream front (batch 1) was also emitted — per-batch liveness
    assert(outs.exists(_.n_seen == h1.length))
    // and it is the correct front of exactly the first half
    val mid = outs.filter(_.n_seen == h1.length)
      .map(o => DocPoint(o.doc_id, o.x, o.y)).toSet
    assert(mid == ParetoStream.skyline(h1.toIndexedSeq).toSet)
  }
}
