package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Eval

/** Streaming distribution-drift monitor — the streaming twin of the batch
  * TVD report (`q_drift_tvd`): each ingest micro-batch's score
  * distribution is compared against a STORED baseline histogram, and the
  * per-type total-variation distance is appended to a drift log. A
  * curation pipeline alerts (or down-weights a source) when a batch's
  * TVD crosses its threshold — catching a crawler regression or source
  * contamination within one trigger interval instead of at the next
  * full-corpus audit.
  *
  * Same exactness contract as the batch query: integer bin counts,
  * integer cross-multiplied numerator Σ|c_base·n_batch − c_batch·n_base|,
  * one IEEE division per emitted row — no logarithms (PSI/KL are not
  * bit-portable), so the spec can assert drift values EXACTLY.
  *
  * State: NONE beyond the checkpoint offsets — the baseline is a static
  * broadcast-sized artifact (types × 10 bins) and each batch folds to
  * the same grain before the compare, so memory is O(types·bins)
  * regardless of batch size or stream lifetime. Exactly-once: the drift
  * log writes `batch_id=N` partitions a retry overwrites (the AnnEnrich
  * idempotence pattern).
  */
object DriftMonitor {

  /** Persist the baseline histogram artifact: (event_type, bucket, c) +
    * per-type totals folded in at read time. One aggregation over the
    * reference corpus; the artifact is a few hundred bytes per source. */
  def writeBaseline(events: DataFrame, path: String): Unit =
    events
      .selectExpr("event_type", s"${Eval.bucketExpr("value")} AS bucket")
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(path)

  /** Per-micro-batch TVD of each event_type's score distribution vs the
    * stored baseline. Emits (batch_id, event_type, n_base, n_batch, tvd);
    * types absent from a batch emit nothing (no events ⇒ no evidence). */
  def driftStream(s: SparkSession, baselinePath: String, events: DataFrame,
                  outPath: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val base = s.read.parquet(baselinePath)
          .select(col("event_type"), col("bucket"), col("c").as("cb"))
        val bTot = base.groupBy(col("event_type")).agg(sum(col("cb")).as("nb"))
        val cur = batch
          .selectExpr("event_type", s"${Eval.bucketExpr("value")} AS bucket")
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("cc"))
        val cTot = cur.groupBy(col("event_type")).agg(sum(col("cc")).as("nc"))
        // full outer on bucket within type: a bin empty on one side still
        // contributes its full mass to the distance
        cur.join(base, Seq("event_type", "bucket"), "full_outer")
          .select(col("event_type"),
            coalesce(col("cb"), lit(0L)).as("cb"),
            coalesce(col("cc"), lit(0L)).as("cc"))
          .join(broadcast(bTot), "event_type")
          .join(broadcast(cTot), Seq("event_type"), "inner")
          .groupBy(col("event_type"))
          .agg(first(col("nb")).as("n_base"), first(col("nc")).as("n_batch"),
            sum(abs(col("cb") * col("nc") - col("cc") * col("nb"))
              .cast("decimal(38,0)")).as("num"))
          .selectExpr("event_type",
            "cast(n_base as bigint) AS n_base",
            "cast(n_batch as bigint) AS n_batch",
            "cast(num as double) / cast(2 * n_base * n_batch as double) AS tvd")
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$id")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
