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
  * Scale: state is the per-key version list plus one counter. WITHOUT a
  * horizon (`horizonUs = None`) the list is bounded by the dimension's
  * change cardinality, not the stream — but it grows with each key's full
  * version history. WITH a horizon, closed intervals whose valid_to is
  * older than `maxSeen - horizon` are COMPACTED out of state after
  * emission: they can never change again, because any change that would
  * re-splice them carries a timestamp at or before their close, which the
  * late-data guard rejects (the standard replay-horizon assumption —
  * deliveries are at most `horizon` out of order; a checkpoint replay
  * re-delivers only batches inside it). The emitted changelog remains the
  * at-rest owner of compacted versions, so state holds only the horizon
  * window plus the open tail — bounded by change RATE, not history. The
  * horizon is per-key (each key's own max seen timestamp), which keeps the
  * transition deterministic under any batch packing. No timeout: current
  * state never expires (it IS the dimension).
  */
object Scd2 {

  case class Change(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class Version(event_id: Long, tsUs: Long, value: Double)
  case class Scd2State(versions: List[Version], rev: Long, maxUs: Long)
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

  /** One keyed transition: merge a batch of changes into the state and emit
    * the changelog delta. PURE — the streaming operator below wraps it, and
    * the compaction spec folds long replays through it directly to prove
    * the state bound; both therefore exercise the identical logic. */
  private[graft] def step(uid: Long, prev: Scd2State, batch: Seq[Change],
                          horizonUs: Option[Long]): (Scd2State, Seq[VersionOut]) = {
    val known = prev.versions.map(_.event_id).toSet
    val maxUs = (prev.maxUs +: batch.map(c => Upsert.toMicros(c.ts))).max
    // Two distinct horizon boundaries, deliberately asymmetric:
    //   guardCut — from the PREVIOUS state's max: exactly the boundary the
    //     last compaction used, so it rejects precisely what could
    //     re-splice already-compacted (immutable) territory. Computing it
    //     from THIS batch's max would make a large replay batch reject its
    //     own older contents — a backfill must stay admissible.
    //   compactCut — from the NEW max: versions closed at or before it are
    //     immutable for every future batch (whose guardCut will be ≥ it).
    val guardCut   = horizonUs.map(h => prev.maxUs - h)
    val compactCut = horizonUs.map(h => maxUs - h)
    // event_id is the change identity: a replayed delivery is the same
    // change and must not fork a second version. The known-set catches
    // replays still in state; the guard catches replays of (and genuine
    // late arrivals into) compacted territory (watermark semantics).
    val incoming = batch
      .map(c => Version(c.event_id, Upsert.toMicros(c.ts), c.value))
      .filterNot(v => known.contains(v.event_id))
      .filterNot(v => guardCut.exists(v.tsUs <= _))
      .distinct
    if (incoming.isEmpty) (prev.copy(maxUs = maxUs), Nil)
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
      // compact: a version closed at or before the cut can never be
      // re-spliced (every future guardCut is ≥ this cut) — its final
      // emission is already in the changelog, so it leaves state
      val kept = compactCut match {
        case None    => merged
        case Some(c) => merged.filter(v => after(v.event_id)._1.forall(_ > c))
      }
      (Scd2State(kept, rev, maxUs), out)
    }
  }

  def history(changes: Dataset[Change],
              horizonUs: Option[Long] = None): Dataset[VersionOut] = {
    implicit val stateEnc = Encoders.product[Scd2State]
    implicit val outEnc = Encoders.product[VersionOut]
    implicit val keyEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, VersionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[Scd2State]) =>
          val prev = state.getOption.getOrElse(Scd2State(Nil, 0L, 0L))
          val (next, out) = step(uid, prev, batch.toSeq, horizonUs)
          if (next != prev) state.update(next)
          out.iterator
      }
  }
}
