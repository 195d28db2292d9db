package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Streaming near-duplicate detection — the streaming twin of the batch
  * incremental pass (`q_dedup_incremental`): each ingest micro-batch of
  * documents signs itself, APPENDS its band rows to the stored LSH index,
  * and probes that index for candidate pairs, which are Jaccard-verified
  * against the document store and appended to the pair log. Because the
  * index grows before the probe, intra-batch and cross-batch delta pairs
  * need no special casing — every batch sees the corpus plus all earlier
  * deltas plus itself, so the union of emitted pairs over any batching
  * equals the batch incremental pass over the same delta (spec-gated).
  *
  * Contract: doc_ids are ingest-ordered (larger id = newer doc), the same
  * assumption the batch incremental pass makes — a pair is emitted by the
  * batch containing its LARGER id.
  *
  * Exactly-once: `foreachBatch` alone is at-least-once, so both the index
  * append and the pair output write `batch_id=N` partition directories
  * that a retry OVERWRITES (the `AnnEnrich` idempotence pattern); a
  * duplicated index row could only arise across retries mid-write and is
  * harmless anyway — candidates are `distinct()` before verification.
  *
  * Scale: per batch the work is O(delta) signatures + one band-key join
  * against the index (shuffle carries (band_key, id) only) + verification
  * text fetched by id for candidate endpoints alone. The index is the
  * stored artifact; nothing ever re-signs the corpus.
  */
object StreamDedup {

  /** Bootstrap the stored band index from the current corpus (the one-time
    * backfill; after this, only streamed deltas touch the index). */
  def writeBandIndex(docs: DataFrame, indexPath: String): Unit =
    Dedup.bandRows(docs).write.mode("overwrite").parquet(s"$indexPath/batch_id=-1")

  def nearDupStream(s: SparkSession, dir: String, docsStream: DataFrame,
                    indexPath: String, outPath: String, checkpoint: String,
                    threshold: Double = 0.8): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        // 1. sign the batch and grow the index FIRST (idempotent partition)
        Dedup.bandRows(batch)
          .write.mode("overwrite").parquet(s"$indexPath/batch_id=$id")
        // 2. probe: this batch's just-written bands against the whole index
        val bands = s.read.parquet(s"$indexPath/batch_id=$id")
        val idx = s.read.parquet(indexPath)
        val cands = idx
          .join(bands.selectExpr("doc_id AS n_doc_id", "band_id", "band_key"),
            Seq("band_id", "band_key"))
          .filter(col("doc_id") < col("n_doc_id"))
          .select(col("doc_id").as("doc_a"), col("n_doc_id").as("doc_b"))
          .distinct()
        // 3. verify against the document store and append to the pair log
        Dedup.verifyJaccard(s, dir, cands, threshold)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$id")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
