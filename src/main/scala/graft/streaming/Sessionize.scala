package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — custom state over `KeyValueGroupedDataset.
  * flatMapGroupsWithState` (builder mandate for custom streaming state;
  * extension beyond the reference, which has no stateful ops, SURVEY §2.7).
  *
  * Semantics match the batch [[graft.operators.Relational.sessionize]]:
  * a session closes after `gapSeconds` of user inactivity. Sessions closed
  * *within* a batch (a later event arrives past the gap) emit immediately;
  * the trailing open session emits on event-time timeout once the watermark
  * passes `lastTs + gap`.
  *
  * Scale: state is one small record per active user (not per event); the
  * watermark bounds state size — users idle past the gap emit and clear.
  */
object Sessionize {

  case class EventIn(user_id: Long, ts: Timestamp, value: Double)
  case class SessionOut(user_id: Long, n_events: Long, sess_start: Timestamp,
                        sess_end: Timestamp, sum_value: Double)
  case class SessState(start: Long, last: Long, n: Long, sum: Double)

  def sessions(events: Dataset[EventIn], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong
    val gapMs = gapSeconds * 1000L

    def out(uid: Long, s: SessState): SessionOut =
      SessionOut(uid, s.n, new Timestamp(s.start), new Timestamp(s.last), s.sum)

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[SessState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: close and emit the open session
            val closed = state.getOption.map(out(uid, _)).toSeq
            state.remove()
            closed.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var cur = state.getOption
            val emitted = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) => // gap exceeded: close previous, start new
                  emitted += out(uid, s)
                  cur = Some(SessState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case None => state.remove()
            }
            emitted.result().iterator
          }
      }
  }
}
