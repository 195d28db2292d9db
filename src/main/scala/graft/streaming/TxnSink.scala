package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.TxnTable

/** Exactly-once streaming append into a [[TxnTable]] — the S9 sink with
  * the transaction-log upgrade the reference's Delta sink provides: each
  * micro-batch commits as ONE table version tagged with its batch id
  * ([[TxnTable.appendOnce]]), so a restarted query redelivering batch N
  * finds the tag already in the log and writes nothing. Failure windows:
  * Spark's checkpoint guarantees at-least-once delivery of each batch to
  * foreachBatch; the log tag collapses that to exactly-once CONTENT, the
  * same contract as Delta's txnAppId/txnVersion. Every committed version
  * remains time-travelable, so "reprocess from table version v" becomes a
  * first-class recovery path for downstream consumers. */
object TxnSink {

  /** `appId` scopes the idempotence token exactly like Delta's txnAppId:
    * a RESTART of the same query (same checkpoint ⇒ same appId, replayed
    * batch ids) dedupes, while a different writer appending to the same
    * table never collides with someone else's batch numbering. */
  /** `partCols` nonEmpty lands every micro-batch hive-partitioned (batch 0
    * fixes the table's partition columns) — the day-partitioned CDC table
    * shape, and what [[graft.sources.TxnTail]] tails back out. */
  def ingest(
      parsed: DataFrame,
      outPath: String,
      checkpoint: String,
      appId: String = "cdc-ingest",
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      partCols: Seq[String] = Nil): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TxnTable.appendOnce(batch.toDF(), outPath, s"$appId#batch-$batchId",
          partCols)
        ()
      }
      .start()
}
