package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.StreamDedup

object StreamDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

/** The streaming near-dup probe over a batched delta equals the batch
  * incremental pass over the same delta — the twin proof for the flagship
  * dedup family's streaming side. */
class StreamDedupSpec extends AnyFunSuite {
  import StreamDedupSpec.Doc
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streamed pair log equals the batch incremental pairs over any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // same boundary as the batch incremental pass (IncrSplit = 400)
    val delta = docs.filter($"doc_id" >= 400).as[Doc].collect().sortBy(_.doc_id)
    val (b1, b2) = delta.splitAt(delta.length / 2)

    val tmp = java.nio.file.Files.createTempDirectory("sdd").toString
    val (idxPath, outPath, cp) = (s"$tmp/index", s"$tmp/pairs", s"$tmp/cp")
    StreamDedup.writeBandIndex(docs.filter($"doc_id" < 400), idxPath)

    val mem = MemoryStream[Doc]
    val q = StreamDedup.nearDupStream(spark, sf, mem.toDF(), idxPath, outPath, cp)
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(outPath)
      .select($"doc_a", $"doc_b", $"jaccard").cache()
    val want = Dedup.dedupIncremental(spark, sf)
      .select($"doc_a", $"doc_b", $"jaccard").cache()
    assert(want.count() > 0, "fixture must produce delta pairs")
    assert(got.except(want).count() == 0, "streamed pair not in batch result")
    assert(want.except(got).count() == 0, "batch pair missed by the stream")
    // no duplicate emissions across batches
    assert(got.count() == got.distinct().count())
    got.unpersist(); want.unpersist()
  }
}
