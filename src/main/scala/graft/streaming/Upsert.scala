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
  case class Current(event_id: Long, tsMs: Long, value: Double)
  case class StateOut(user_id: Long, value: Double, last_ts: Timestamp,
                      change_type: String)

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
          // latest-wins fold: max by (ts, event_id) — order-insensitive, so
          // arrival order within the batch cannot change the result
          batch.foreach { c =>
            if (cur.forall(s => s.tsMs < c.ts.getTime ||
                (s.tsMs == c.ts.getTime && s.event_id < c.event_id)))
              cur = Some(Current(c.event_id, c.ts.getTime, c.value))
          }
          if (cur != prev) {
            val s = cur.get
            state.update(s)
            Iterator.single(StateOut(uid, s.value, new Timestamp(s.tsMs),
              if (prev.isEmpty) "insert" else "update"))
          } else Iterator.empty
      }
  }
}
