package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming latest-wins upsert — the stateful streaming twin of the batch
  * [[graft.operators.Relational.scd1Merge]]: a CDC change stream folds into
  * per-key current state, and each batch emits a CHANGELOG row for every
  * key whose state actually changed ('insert' first time, 'update' after).
  * Out-of-order stale changes (older (ts, event_id) than the held state)
  * are ignored — exactly the batch merge's latest-wins contract, so
  * replaying a day of changes through this operator and running the batch
  * merge over the same day agree on the final state.
  *
  * Scale: state is one record per key (bounded by the key population, not
  * the stream), keyed state lives in the state store partitioned by key
  * hash — the same hash partitioning a 1000-executor cluster scales by
  * raising `spark.sql.shuffle.partitions` at first deploy. No timeout:
  * current state never expires (it IS the table). Downstream, the
  * changelog appends to the snapshot exactly like the batch merge's
  * output — e.g. foreachBatch into a keyed overwrite.
  */
object Upsert {

  case class Change(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class Current(event_id: Long, tsUs: Long, value: Double)
  case class StateOut(user_id: Long, value: Double, last_ts: Timestamp,
                      change_type: String)

  /** Events carry MICROSECOND timestamps (Tables.events truncates parquet ns
    * to µs), and the batch twin scd1Merge orders by the full ts before the
    * event_id tie-break — so state must hold and compare µs, not
    * Timestamp.getTime's milliseconds, or two changes within the same
    * millisecond resolve by event_id here and by true µs order in batch. */
  private[streaming] def toMicros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private[streaming] def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def upsert(changes: Dataset[Change]): Dataset[StateOut] = {
    implicit val stateEnc = Encoders.product[Current]
    implicit val outEnc = Encoders.product[StateOut]
    implicit val keyEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Current, StateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[Current]) =>
          val prev = state.getOption
          var cur = prev
          // latest-wins fold: max by (µs ts, event_id) — order-insensitive,
          // so arrival order within the batch cannot change the result
          batch.foreach { c =>
            val cUs = toMicros(c.ts)
            if (cur.forall(s => s.tsUs < cUs ||
                (s.tsUs == cUs && s.event_id < c.event_id)))
              cur = Some(Current(c.event_id, cUs, c.value))
          }
          if (cur != prev) {
            val s = cur.get
            state.update(s)
            Iterator.single(StateOut(uid, s.value, fromMicros(s.tsUs),
              if (prev.isEmpty) "insert" else "update"))
          } else Iterator.empty
      }
  }
}
