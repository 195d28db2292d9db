package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.TxnTable

/** Exactly-once streaming KEYED UPSERT into a [[TxnTable]] — the
  * merge-on-read twin of [[TxnSink]]: each micro-batch applies as ONE
  * `mergeDvOnce` commit (replaced rows DV-marked in place, the batch's
  * rows landing in new files), tagged with its batch id so a restarted
  * query redelivering batch N merges it zero times more. This closes the
  * CDC loop the reference runs (Debezium envelope → streaming job →
  * lakehouse table) with UPSERT semantics instead of append-and-compact:
  * the table IS the latest state per key at every version, and the
  * commit cost per batch is bitmaps + the batch's own bytes, never a
  * rewrite of the files the batch grazed.
  *
  * A CDC batch can carry several images of one key; `seqCol` (an
  * event-time / LSN column) picks the LAST one per key deterministically
  * before the merge (highest seqCol wins, ties broken by preferring the
  * later field values' max — pass a strictly monotonic column for strict
  * semantics). Without `seqCol` the batch must already be key-unique, as
  * [[TxnTable.mergeDv]] requires.
  *
  * The first micro-batch on a fresh path CREATES the table (an
  * idempotent append fixing schema + optional partition columns); every
  * later batch merges. Both paths ride the same checkpointed token
  * ledger, so the create/merge decision is restart-safe too. */
object TxnUpsertSink {

  def upsert(
      changes: DataFrame,
      outPath: String,
      checkpoint: String,
      keys: Seq[String],
      seqCol: Option[String] = None,
      appId: String = "cdc-upsert",
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      partCols: Seq[String] = Nil,
      rewriteFraction: Double = 0.1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), outPath, keys, seqCol,
          s"$appId#batch-$batchId", partCols, rewriteFraction)
        ()
      }
      .start()

  /** One micro-batch's worth of upsert, idempotent under `token` —
    * exposed for tests and for callers driving their own batching. */
  private[graft] def applyBatch(
      batch: DataFrame, outPath: String, keys: Seq[String],
      seqCol: Option[String], token: String, partCols: Seq[String],
      rewriteFraction: Double): Unit = {
    val delta = lastWins(batch, keys, seqCol)
    if (TxnTable.latestVersion(outPath) < 0)
      // batch 0 on a fresh path: the table does not exist yet, so the
      // "merge" is a pure insert — an idempotent append creates it (and
      // fixes the partition layout) under the same token ledger
      TxnTable.appendOnce(delta, outPath, token, partCols)
    else {
      val spark = batch.sparkSession
      TxnTable.mergeDvOnce(spark, delta, outPath, keys, token,
        rewriteFraction = rewriteFraction)
    }
  }

  /** Reduce a changelog batch to one row per key: highest `seqCol` wins
    * (a deterministic window top-1). Without `seqCol`, pass through —
    * mergeDv itself enforces key uniqueness loudly. */
  private def lastWins(batch: DataFrame, keys: Seq[String],
                       seqCol: Option[String]): DataFrame =
    seqCol match {
      case None => batch
      case Some(sc) =>
        val order: Seq[Column] = col(sc).desc +:
          batch.columns.filterNot(c => keys.contains(c) || c == "_rn")
            .map(col(_).desc).toSeq
        batch
          .withColumn("_rn", row_number().over(
            Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
          .filter(col("_rn") === 1).drop("_rn")
    }
}
