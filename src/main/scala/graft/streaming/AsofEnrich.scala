package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful streaming twin of the batch
  * [[graft.operators.Temporal.asofJoin]]: each purchase event is emitted
  * immediately, enriched with the user's LATEST at-or-before signup.
  *
  * Shape: both streams union into one keyed stream; per-user state holds
  * exactly one record (the latest signup seen), so state is bounded by the
  * user population — not the stream length — and needs no timeout to stay
  * small. Within a batch the group's events are processed in event-time
  * order (signup before purchase at equal ts, matching the batch
  * operator's at-or-before contract). Cross-batch late signups do NOT
  * retroactively re-enrich already-emitted purchases — the standard
  * at-least-once enrichment caveat; bound it with a source watermark if
  * the use case needs stronger ordering.
  */
object AsofEnrich {

  case class EventIn(event_id: Long, user_id: Long, ts: Timestamp, is_signup: Boolean)
  case class Enriched(event_id: Long, user_id: Long, ts: Timestamp,
                      signup_id: Option[Long], signup_ts: Option[Timestamp])
  case class LastSignup(id: Long, tsMs: Long)

  def enrich(events: Dataset[EventIn]): Dataset[Enriched] = {
    implicit val stateEnc = Encoders.product[LastSignup]
    implicit val outEnc = Encoders.product[Enriched]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSignup, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EventIn], state: GroupState[LastSignup]) =>
          var last = state.getOption
          val out = Vector.newBuilder[Enriched]
          // event-time order; signups first at equal ts (at-or-before)
          batch.toVector.sortBy(e => (e.ts.getTime, !e.is_signup, e.event_id))
            .foreach { e =>
              if (e.is_signup) {
                // keep the latest signup; max event_id wins ties on ts
                if (last.forall(s => s.tsMs < e.ts.getTime ||
                    (s.tsMs == e.ts.getTime && s.id < e.event_id)))
                  last = Some(LastSignup(e.event_id, e.ts.getTime))
              } else {
                out += Enriched(e.event_id, uid, e.ts,
                  last.map(_.id), last.map(s => new Timestamp(s.tsMs)))
              }
            }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
