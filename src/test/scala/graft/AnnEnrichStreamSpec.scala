package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AnnEnrich

/** Streaming ANN enrichment equals the batch ADC operator over the union
  * of its micro-batches — scoring is per-query, so batching can't change
  * any row — and replaying a batch id is idempotent by construction
  * (partition overwrite). */
class AnnEnrichStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed top-k equals batch top-k over the micro-batch union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // live queries = a few corpus vectors re-submitted under fresh ids
    // (10000+) so self-match suppression doesn't hide corpus rows
    val probes = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id".isin(20L, 21L, 22L, 23L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val out = Files.createTempDirectory("ann_out").toString
    val ckpt = Files.createTempDirectory("ann_ckpt").toString
    val q = AnnEnrich.enrich(spark, sf,
      mem.toDF().toDF("vec_id", "embedding"), out, ckpt, intervalMs = 50L)
    try {
      mem.addData(probes.take(2): _*)
      q.processAllAvailable()
      mem.addData(probes.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select($"qid", $"rank", $"nid", $"adist")
      val batch = graft.operators.Similarity.knnPqFor(spark, sf,
        probes.toDF("vec_id", "embedding"))
      assert(streamed.count() == 4 * 5)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // two micro-batches → two partition directories
      val dirs = new java.io.File(out).listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).sorted
      assert(dirs.length == 2, dirs.mkString(","))
      // exactly-once under replay: re-execute the batch-1 write (what a
      // checkpoint recovery does after a crash between write and commit) —
      // the partition overwrite must leave the output byte-identical, not
      // double-append
      graft.operators.Similarity.knnPqFor(spark, sf,
          probes.drop(2).toDF("vec_id", "embedding"))
        .write.mode("overwrite").parquet(s"$out/batch_id=1")
      val replayed = spark.read.parquet(out)
        .select($"qid", $"rank", $"nid", $"adist")
      assert(replayed.count() == 4 * 5)
      assert(replayed.exceptAll(batch).isEmpty && batch.exceptAll(replayed).isEmpty)
      // duplicate query ids collapse instead of doubling every ADC term
      val dup = probes.take(1) ++ probes.take(1)
      val dedup = graft.operators.Similarity.knnPqFor(spark, sf,
        dup.toDF("vec_id", "embedding"))
      val single = graft.operators.Similarity.knnPqFor(spark, sf,
        probes.take(1).toDF("vec_id", "embedding"))
      assert(dedup.exceptAll(single).isEmpty && single.exceptAll(dedup).isEmpty)
    } finally q.stop()
  }
}
