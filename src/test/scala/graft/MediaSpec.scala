package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Invariants for the media dedup/shard planners (their values are
  * oracle-hash-gated; these prove the accounting contracts). */
class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("media dedup conserves the corpus and prices the savings") {
    import spark.implicits._
    val d = Multimodal.mediaDedup(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(d.agg(sum($"n_copies")).head.getLong(0) == docs)
    assert(d.filter($"n_copies" === 1 && $"bytes_saved" =!= 0).count() == 0,
      "unique payloads save nothing")
    assert(d.filter($"bytes_saved" < 0).count() == 0)
    d.unpersist()
  }

  test("media shards partition every file with balanced bytes per modality") {
    import spark.implicits._
    val p = Multimodal.mediaShards(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(p.agg(sum($"n_files")).head.getLong(0) == docs)
    // within each modality, shard byte totals stay within 50%
    p.select($"media_type").distinct().collect().map(_.getString(0)).foreach { mt =>
      val mm = p.filter($"media_type" === mt)
        .agg(min($"n_bytes"), max($"n_bytes")).head
      assert(mm.getLong(1) <= mm.getLong(0) * 3 / 2,
        s"$mt shards unbalanced: [${mm.getLong(0)}, ${mm.getLong(1)}]")
    }
    p.unpersist()
  }
}
