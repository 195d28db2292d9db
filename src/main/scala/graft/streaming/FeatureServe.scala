package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature serving — the online twin of
  * `q_feature_matrix`: per-user click/view/error counters live in keyed
  * state, and every purchase emits a training/scoring row carrying the
  * counters AS OF strictly before its timestamp. This is the feature-store
  * serving loop: the same leakage boundary the batch assembler draws
  * (features < label instant) enforced on a live stream.
  *
  * Within a batch, events apply timestamp-group by timestamp-group: all
  * purchases at one µs emit against the state BEFORE any same-µs feature
  * event applies — mirroring the batch window's `RANGE … 1 PRECEDING`
  * frame, which excludes every same-µs row from a label's features. The
  * spec feeds batches in ingestion order and proves the streamed matrix
  * bit-equal to the batch one, including across a checkpoint restart.
  *
  * Scale: state is three longs per user — key-cardinality-bounded,
  * volume-independent (the ModelFit/ViewMaintain contract). */
object FeatureServe {

  case class EventIn(event_id: Long, user_id: Long, event_type: String,
                     us: Long, cents: Long)
  case class FeatState(nClick: Long, nView: Long, nError: Long)
  case class FeatRow(event_id: Long, user_id: Long, n_click_before: Long,
                     n_view_before: Long, n_error_before: Long, label_cents: Long)

  def serve(events: Dataset[EventIn]): Dataset[FeatRow] = {
    implicit val stateEnc = Encoders.product[FeatState]
    implicit val outEnc = Encoders.product[FeatRow]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FeatState, FeatRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[FeatState]) =>
          var t = state.getOption.getOrElse(FeatState(0L, 0L, 0L))
          val emitted = Seq.newBuilder[FeatRow]
          var any = false
          it.toSeq.sortBy(e => (e.us, e.event_id))
            .groupBy(_.us).toSeq.sortBy(_._1)
            .foreach { case (_, sameUs) =>
              any = true
              // labels first: same-µs feature events are NOT "before"
              sameUs.foreach { e =>
                if (e.event_type == "purchase")
                  emitted += FeatRow(e.event_id, uid, t.nClick, t.nView, t.nError, e.cents)
              }
              sameUs.foreach { e =>
                e.event_type match {
                  case "click" => t = t.copy(nClick = t.nClick + 1)
                  case "view"  => t = t.copy(nView = t.nView + 1)
                  case "error" => t = t.copy(nError = t.nError + 1)
                  case _       => ()
                }
              }
            }
          if (any) state.update(t)
          emitted.result().iterator
      }
  }
}
