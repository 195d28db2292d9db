package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 maintainer — the stateful streaming twin of the batch
  * [[graft.operators.Relational.scd2History]], completing the CDC pair the
  * way Sessionize twins the batch sessionize: replaying a change stream
  * through this operator and reducing its changelog yields bit-identical
  * type-2 history rows to the batch window construction over the same
  * changes (spec-gated, including out-of-order delivery, same-millisecond
  * microsecond ordering, and a checkpointed restart).
  *
  * Contract: every output row is an UPSERT keyed by (user_id, event_id) —
  * a version whose [valid_from, valid_to) interval changes (a later change
  * closes it, or an out-of-order change splices before it) is re-emitted
  * with the new interval; `rev` totally orders emissions per business key,
  * so a reader materializes the history as "max-rev row per (user_id,
  * event_id)" — the same keyed-overwrite downstream the latest-wins Upsert
  * changelog feeds. Timestamps are compared at MICROSECOND precision
  * (events carry µs; the batch twin orders by the full ts).
  *
  * Scale: state is the per-key version list plus one counter — bounded by
  * the dimension's change cardinality, not the stream. Keyed state lives
  * in the state store hash-partitioned by user_id. A production deploy
  * bounds the list by compacting closed intervals older than the replay
  * horizon out to the at-rest history (the batch side owns them — they can
  * no longer change once the horizon passes); the open tail stays in
  * flight. No timeout: current state never expires (it IS the dimension).
  */
object Scd2 {

  case class Change(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class Version(event_id: Long, tsUs: Long, value: Double)
  case class Scd2State(versions: List[Version], rev: Long)
  case class VersionOut(user_id: Long, event_id: Long, value: Double,
                        valid_from: Timestamp, valid_to: Option[Timestamp],
                        is_current: Boolean, rev: Long)

  /** event_id → (valid_to µs, is_current) for an ORDERED version list —
    * intervals are derived, never stored, so stored state cannot drift
    * from the closure rule. */
  private def intervals(vs: List[Version]): Map[Long, (Option[Long], Boolean)] =
    vs.iterator.zipAll(vs.iterator.drop(1).map(Option(_)), null, None)
      .map { case (v, next) =>
        v.event_id -> (next.map(_.tsUs), next.isEmpty)
      }.toMap

  def history(changes: Dataset[Change]): Dataset[VersionOut] = {
    implicit val stateEnc = Encoders.product[Scd2State]
    implicit val outEnc = Encoders.product[VersionOut]
    implicit val keyEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, VersionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[Scd2State]) =>
          val prev = state.getOption.getOrElse(Scd2State(Nil, 0L))
          val known = prev.versions.map(_.event_id).toSet
          // event_id is the change identity: a replayed delivery is the
          // same change and must not fork a second version
          val incoming = batch
            .map(c => Version(c.event_id, Upsert.toMicros(c.ts), c.value))
            .filterNot(v => known.contains(v.event_id))
            .toSeq.distinct
          if (incoming.isEmpty) Iterator.empty
          else {
            val merged = (prev.versions ++ incoming)
              .sortBy(v => (v.tsUs, v.event_id))
            val before = intervals(prev.versions)
            val after = intervals(merged)
            // changelog: new versions, plus existing versions whose
            // interval the insertion changed (closed or re-spliced)
            val changed = merged.filter { v =>
              before.get(v.event_id) match {
                case None           => true
                case Some(interval) => interval != after(v.event_id)
              }
            }
            var rev = prev.rev
            val out = changed.map { v =>
              val (vt, cur) = after(v.event_id)
              rev += 1
              VersionOut(uid, v.event_id, v.value, Upsert.fromMicros(v.tsUs),
                vt.map(Upsert.fromMicros), cur, rev)
            }
            state.update(Scd2State(merged, rev))
            out.iterator
          }
      }
  }
}
