package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count monitor with BOUNDED state — the stateful
  * streaming twin of the batch theta/HLL sketch rollups
  * (`q_theta_intersect`, `q_hll_reagg`): as event batches land, each
  * key's theta sketch folds the new user ids into keyed state and every
  * batch emits the updated sketch + estimate.
  *
  * Why a sketch in state and not a user-id set: an exact streaming
  * distinct count must hold every id it has ever seen — state grows with
  * stream VOLUME, the thing §2.7's state-boundedness rule forbids. A
  * theta sketch caps state at ~8 KB per key (nominal entries) no matter
  * how many billions of events arrive, stays exact below the threshold,
  * and keeps the documented ~1.6% rse above it. Sketch union is
  * commutative/associative/idempotent-under-duplicates, so arrival order
  * and batch boundaries cannot change the result, and recovered-after-
  * restart state provably equals a batch `theta_sketch_agg` over
  * everything fed (spec-gated twin proof).
  *
  * The emitted `sketch` column is the standard DataSketches compact wire
  * format — the SAME bytes Spark 4.1's built-in `theta_sketch_estimate` /
  * `theta_union_agg` consume — so each output row is itself a mergeable
  * at-rest artifact: a downstream batch job can union the per-key
  * snapshots into any coarser grain without replaying the stream
  * (interop spec-gated via the built-in SQL functions).
  */
object SketchMonitor {

  case class UserEvent(event_type: String, user_id: Long)
  case class SketchState(sketch: Array[Byte], n_updates: Long)
  case class SketchOut(event_type: String, sketch: Array[Byte],
                       est_users: Double, n_updates: Long)

  private def unionOf(bytes: Option[Array[Byte]]): Union = {
    val u = SetOperation.builder().buildUnion()
    bytes.foreach(b => u.union(CompactSketch.heapify(Memory.wrap(b))))
    u
  }

  case class ValueEvent(event_type: String, value: Double)
  case class QuantileOut(event_type: String, sketch: Array[Byte],
                         p50: Double, p95: Double, n_updates: Long)

  /** Streaming QUANTILE monitor — the KLL twin of the theta distinct
    * monitor: each key's KllDoublesSketch folds new values in keyed state
    * (~1 KB per key at k=200 regardless of stream volume; the exact
    * streaming-percentile alternative buffers every value ever seen) and
    * every batch emits the refreshed p50/p95 plus the sketch bytes — the
    * standard wire format, so a batch job reads the snapshots with the
    * built-in `kll_merge_agg_double` / `kll_sketch_get_quantile_double`.
    * KLL compaction is randomized, so the twin proof is the rank-bound
    * contract (the q_kll_reagg gate), not byte equality. */
  def monitorQuantiles(events: Dataset[ValueEvent]): Dataset[QuantileOut] = {
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val outEnc = Encoders.product[QuantileOut]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SketchState, QuantileOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[ValueEvent], state: GroupState[SketchState]) =>
          val sk = state.getOption
            .map(s => KllDoublesSketch.heapify(Memory.wrap(s.sketch)))
            .getOrElse(KllDoublesSketch.newHeapInstance(200))
          var n = state.getOption.map(_.n_updates).getOrElse(0L)
          var any = false
          batch.foreach { e => any = true; n += 1; sk.update(e.value) }
          if (any) {
            state.update(SketchState(sk.toByteArray, n))
            Iterator(QuantileOut(key, sk.toByteArray,
              sk.getQuantile(0.5), sk.getQuantile(0.95), n))
          } else Iterator.empty
      }
  }

  case class DayUserEvent(event_type: String, d: java.sql.Date, user_id: Long)
  case class DailySketchOut(event_type: String, d: java.sql.Date,
                            sketch: Array[Byte], est_users: Double, n_updates: Long)

  /** Daily-grain maintainer: keyed by (event_type, day), emitting exactly
    * the relation the BATCH sketch rollups consume
    * (`Relational.thetaDailyAtRest`'s (event_type, d, sk) artifact). This
    * closes the loop between the two engines' halves: the stream keeps the
    * daily sketch table fresh as events arrive; monthly union /
    * intersection / difference queries read the stored snapshots without
    * replaying anything. Theta union is order/batching-insensitive, so the
    * stream-maintained sketch for a day is byte-for-byte the sketch a
    * batch `theta_sketch_agg` over that day's rows builds (spec-gated).
    * State: one ≤8 KB sketch per (type, day) — bounded by the calendar ×
    * type catalog, not by event volume. */
  def monitorDaily(events: Dataset[DayUserEvent]): Dataset[DailySketchOut] = {
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val outEnc = Encoders.product[DailySketchOut]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    events
      .groupByKey(e => (e.event_type, e.d.toString))
      .flatMapGroupsWithState[SketchState, DailySketchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), batch: Iterator[DayUserEvent], state: GroupState[SketchState]) =>
          val prev = state.getOption
          val u = unionOf(prev.map(_.sketch))
          var n = prev.map(_.n_updates).getOrElse(0L)
          var any = false
          batch.foreach { e => any = true; n += 1; u.update(e.user_id) }
          if (any) {
            val compact = u.getResult
            state.update(SketchState(compact.toByteArray, n))
            Iterator(DailySketchOut(key._1, java.sql.Date.valueOf(key._2),
              compact.toByteArray, compact.getEstimate, n))
          } else Iterator.empty
      }
  }

  def monitor(events: Dataset[UserEvent]): Dataset[SketchOut] = {
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val outEnc = Encoders.product[SketchOut]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SketchState, SketchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[UserEvent], state: GroupState[SketchState]) =>
          val prev = state.getOption
          val u = unionOf(prev.map(_.sketch))
          var n = prev.map(_.n_updates).getOrElse(0L)
          var any = false
          batch.foreach { e => any = true; n += 1; u.update(e.user_id) }
          if (any) {
            val compact = u.getResult
            state.update(SketchState(compact.toByteArray, n))
            Iterator(SketchOut(key, compact.toByteArray, compact.getEstimate, n))
          } else Iterator.empty
      }
  }
}
