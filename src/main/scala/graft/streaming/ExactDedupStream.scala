package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the streaming twin of the batch hash dedup
  * (`q_dedup_exact`) and the stateful complement of the bloom probe
  * (`q_bloom_dedup`): keep the FIRST document per content hash, drop
  * re-arrivals, with state bounded by the event-time watermark rather
  * than growing with the stream.
  *
  * Built on `dropDuplicatesWithinWatermark` (guide preference (a):
  * compose built-ins — Spark's keyed dedup state with watermark
  * eviction is exactly this operator; a hand-rolled
  * `flatMapGroupsWithState` would re-implement it with more code and
  * the same shuffle). Semantics: a duplicate arriving within the
  * watermark delay of the kept first occurrence is dropped; once the
  * watermark passes, the key's state is EVICTED and a later re-arrival
  * is treated as new — the documented trade a bounded-state streaming
  * dedup makes (the batch pass, or the stored bloom/band index, owns
  * beyond-horizon history).
  *
  * Scale shape: state is one (hash, expiry) entry per distinct key seen
  * within the watermark window — O(ingest rate × window), independent of
  * stream lifetime; the only shuffle is the hash partition on the dedup
  * key. At 1000 executors this is the same plan with state sharded by
  * key range (RocksDB state store), no code change.
  */
object ExactDedupStream {

  /** `docs` must carry an event-time column `ts` and the dedup key
    * `content_hash` (producers hash upstream — the shuffle carries the
    * 32-hex key, never document text). */
  def dedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
