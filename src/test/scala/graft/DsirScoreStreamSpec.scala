package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DsirScore

/** Streamed DSIR scores against the stored bucket artifact are bit-equal
  * to the batch `q_dsir_weights` scores for the same documents: the
  * artifact holds exact integer counts, the per-row fold is an integer
  * sum, and the finishing expression is shared text. The scorer is
  * stateless, so a restart needs no recovery proof — only the artifact. */
class DsirScoreStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed scores equal batch scores; scorer is stateless per row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val art = java.nio.file.Files.createTempDirectory("dsir_art").toString
    DsirScore.writeArtifact(spark, sf, art)

    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("dsir_out").toString
    val cp = java.nio.file.Files.createTempDirectory("dsir_cp").toString
    val q = DsirScore.score(spark, mem.toDF().toDF("doc_id", "text"), art)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()
    try {
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select($"doc_id", $"n_tokens", $"dsir_score", $"selected")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val batch = graft.operators.Selection.dsirWeights(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (st, ba) =>
      assert(st._1 == ba._1 && st._2 == ba._2)
      assert(st._3 == ba._3, s"doc ${st._1}: streamed ${st._3} != batch ${ba._3}")
      assert(st._4 == ba._4)
    }
  }
}
