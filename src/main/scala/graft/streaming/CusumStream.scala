package graft.streaming

import java.sql.Date
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor — the stateful twin of the batch
  * [[graft.operators.Relational.cusum]]: a stream of closed per-day series
  * points (the output grain of any watermarked daily rollup) folds through
  * two longs of keyed state — the running prefix P and its running minimum
  * — and emits each day's alarm statistic S = P − min(0, min prefix)
  * incrementally, bit-equal to the batch closed form over the same prefix
  * (CusumStreamSpec proves equality across batches AND a checkpointed
  * restart).
  *
  * Contract: points arrive per key in non-decreasing day order (what an
  * append-mode watermarked daily aggregation emits — late days are closed
  * by the watermark before they reach this operator); within a batch,
  * rows are sorted by day before folding, so intra-batch arrival order
  * is irrelevant. The reference level and alarm threshold are CONFIG
  * (production derives them from the stored batch artifact or a trailing
  * window; the batch query computes target = mean for its one-shot
  * report). State is O(1) per key — two longs and the last day — so the
  * monitor's state store is bounded by the key population forever.
  */
object CusumStream {

  case class DayPoint(key: String, day: Date, x: Long)
  case class CuState(p: Long, minP: Long)
  case class CuOut(key: String, day: Date, x: Long, s: Long, alarm: Boolean)

  def monitor(points: Dataset[DayPoint], target: Long,
              threshold: Long): Dataset[CuOut] = {
    implicit val stateEnc = Encoders.product[CuState]
    implicit val outEnc = Encoders.product[CuOut]
    implicit val keyEnc = Encoders.STRING
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState[CuState, CuOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[DayPoint], state: GroupState[CuState]) =>
          var (p, minP) = state.getOption
            .map(s => (s.p, s.minP)).getOrElse((0L, 0L))
          val out = batch.toSeq.sortBy(_.day.getTime).map { r =>
            p += r.x - target
            minP = math.min(minP, p)
            // batch closed form: S = P − least(min prefix, 0); minP starts
            // at 0 (the empty prefix), matching the batch window's
            // least(min(p) over ≤t, 0)
            val s = p - math.min(minP, 0L)
            CuOut(key, r.day, r.x, s, s > threshold)
          }
          state.update(CuState(p, minP))
          out.iterator
      }
  }
}
