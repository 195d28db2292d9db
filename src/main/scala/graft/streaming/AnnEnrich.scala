package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN enrichment — live query vectors scored against the static
  * PQ-compressed corpus index, the serving loop of a retrieval pipeline
  * (each incoming embedding gets its top-k corpus neighbors appended to a
  * result table).
  *
  * Shape: `foreachBatch` + the batch ADC operator
  * ([[graft.operators.Similarity.knnPqFor]]). Scoring is row-independent
  * per query, so micro-batch boundaries cannot change any result row —
  * the streamed output over any batching equals the batch operator over
  * the union (spec-gated). The heavy artifacts (trained codebooks, corpus
  * codes) are session-cached/pinned by the Similarity operators, so each
  * micro-batch pays only the broadcast of its own |batch|·subspaces·codes
  * ADC lookup table plus one pass over the code table — never an
  * embedding read. Exactly-once: foreachBatch alone is at-least-once, so
  * each micro-batch OVERWRITES its own `batch_id=N` partition directory —
  * a checkpoint-replayed batch rewrites the same path instead of
  * double-appending, and readers see the batch id as a partition column.
  *
  * Not flatMapGroupsWithState: ANN lookup is stateless per query — state
  * machinery would add shuffle and state-store cost for nothing.
  */
object AnnEnrich {

  /** Start the enrichment stream. `queries` is a streaming DataFrame with
    * (vec_id, embedding: array<float>); results append to `out` as
    * (qid, rank, nid, adist). */
  def enrich(s: SparkSession, dir: String, queries: DataFrame,
             out: String, checkpoint: String,
             intervalMs: Long = 1000L): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.knnPqFor(s, dir, batch)
          .write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
      }
      .start()
}
