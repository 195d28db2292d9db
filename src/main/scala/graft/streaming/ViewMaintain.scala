package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental view maintenance — the stateful twin of
  * `q_ivm_agg` (the Gupta–Mumick counting algorithm): a signed changelog
  * (+1 insertion / −1 retraction, with its money delta) folds into keyed
  * state that IS the view row, and every touched key emits its refreshed
  * aggregate per micro-batch — an `op` column marks rows whose multiplicity
  * reached zero so a downstream sink can delete them.
  *
  * Exactness: the state fold is integer addition — commutative and
  * associative — so arrival order, batch boundaries, and checkpoint-restart
  * replays cannot change the result; the emitted view is bit-identical to
  * the batch maintenance query over the union of all batches (spec-gated).
  *
  * Scale: state is three longs per LIVE KEY — bounded by the view's group
  * cardinality, not stream volume. `version` counts changes applied per
  * key, giving downstream consumers a monotonic latest-wins ordering
  * (emissions from different micro-batches land unordered in an append
  * sink). Keys that stay at multiplicity zero hold a tombstoned state row;
  * a replay-horizon sweep (the [[Scd2]] compaction contract) reclaims them
  * in production — the semantics here never read a tombstone back.
  */
object ViewMaintain {

  case class Change(user_id: Long, sign: Long, cents: Long)
  case class ViewState(version: Long, n: Long, cents: Long)
  case class ViewRow(user_id: Long, version: Long, n_purchases: Long,
                     revenue_cents: Long, op: String)

  def maintain(changes: Dataset[Change]): Dataset[ViewRow] = {
    implicit val stateEnc = Encoders.product[ViewState]
    implicit val outEnc = Encoders.product[ViewRow]
    implicit val keyEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ViewState, ViewRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[ViewState]) =>
          var t = state.getOption.getOrElse(ViewState(0L, 0L, 0L))
          var any = false
          batch.foreach { c =>
            any = true
            t = ViewState(t.version + 1, t.n + c.sign, t.cents + c.sign * c.cents)
          }
          if (!any) Iterator.empty
          else {
            state.update(t)
            Iterator(ViewRow(uid, t.version, t.n, t.cents,
              if (t.n == 0L) "delete" else "upsert"))
          }
      }
  }
}
