package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Selection

/** Streaming model fitting — the stateful twin of `q_ridge_by_source`: as
  * document batches land, each source's NINE integer sufficient statistics
  * (n, Σx, ΣxxT, Σxy) fold into keyed state and every batch emits the
  * freshly re-solved ridge coefficients. The model is always exactly the
  * closed-form fit over everything seen so far — online learning with NO
  * approximation, because for linear models the sufficient statistics ARE
  * the model.
  *
  * Scale: state is 9 longs per SOURCE (catalog-bounded, corpus-independent);
  * the per-batch work is a map-side partial fold plus one 3×3 solve per
  * updated key. Integer addition is commutative/associative, so arrival
  * order and restart replays cannot change the state, and the finishing
  * solve ([[Selection.solveRidge]]) mirrors the batch query's Cramer SQL
  * operation-for-operation — the emitted coefficients are bit-identical to
  * running `q_ridge_by_source` over the union of all batches (spec-gated).
  */
object ModelFit {

  case class DocFeat(doc_id: Long, source: String, x1: Long, x2: Long, y: Long)
  case class RidgeState(n: Long, s1: Long, s2: Long, sy: Long, s11: Long,
                        s12: Long, s22: Long, s1y: Long, s2y: Long)
  case class ModelOut(source: String, n_docs: Long,
                      beta0: Double, beta1: Double, beta2: Double)

  def fit(docs: Dataset[DocFeat]): Dataset[ModelOut] = {
    implicit val stateEnc = Encoders.product[RidgeState]
    implicit val outEnc = Encoders.product[ModelOut]
    implicit val keyEnc = Encoders.STRING
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[RidgeState, ModelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[DocFeat], state: GroupState[RidgeState]) =>
          var t = state.getOption.getOrElse(RidgeState(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          var any = false
          batch.foreach { d =>
            any = true
            t = RidgeState(t.n + 1, t.s1 + d.x1, t.s2 + d.x2, t.sy + d.y,
              t.s11 + d.x1 * d.x1, t.s12 + d.x1 * d.x2, t.s22 + d.x2 * d.x2,
              t.s1y + d.x1 * d.y, t.s2y + d.x2 * d.y)
          }
          if (any) {
            state.update(t)
            val (b0, b1, b2) = Selection.solveRidge(
              t.n, t.s1, t.s2, t.sy, t.s11, t.s12, t.s22, t.s1y, t.s2y)
            Iterator(ModelOut(src, t.n, b0, b1, b2))
          } else Iterator.empty
      }
  }

  // -------------------------------------------------------------------------
  // Streaming CLASSIFIER fit — the online twin of q_logit_fit's first
  // Newton step: at the w = 0 linearization the logistic gradient and
  // Hessian are INTEGER sufficient statistics (Σ(2y−1)xᵢ and X'X — see
  // [[graft.operators.Classify]]), so the same state-fold-then-closed-form
  // shape applies verbatim: 9 longs of state per source, exact under any
  // arrival order or restart replay, finished by the Scala mirror of the
  // batch Cramer SQL ([[Classify.solveLogit1]]) so emitted weights are
  // bit-identical to the batch step-1 relation over the union of batches.
  // The full damped second step needs the frozen w₁ to score every past
  // row — inherently a second pass, so online serving uses the step-1
  // model and the nightly batch refits both steps (spec-gated twin).
  // -------------------------------------------------------------------------
  case class LogitDoc(doc_id: Long, source: String, x1: Long, x2: Long, y: Long)
  case class LogitState(n: Long, s1: Long, s2: Long, s11: Long, s12: Long,
                        s22: Long, g0: Long, g1: Long, g2: Long)
  case class LogitOut(source: String, n_docs: Long,
                      w0: Double, w1: Double, w2: Double)

  def fitLogit1(docs: Dataset[LogitDoc]): Dataset[LogitOut] = {
    implicit val stateEnc = Encoders.product[LogitState]
    implicit val outEnc = Encoders.product[LogitOut]
    implicit val keyEnc = Encoders.STRING
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[LogitState, LogitOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[LogitDoc], state: GroupState[LogitState]) =>
          var t = state.getOption.getOrElse(LogitState(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          var any = false
          batch.foreach { d =>
            any = true
            val sgn = 2 * d.y - 1
            t = LogitState(t.n + 1, t.s1 + d.x1, t.s2 + d.x2,
              t.s11 + d.x1 * d.x1, t.s12 + d.x1 * d.x2, t.s22 + d.x2 * d.x2,
              t.g0 + sgn, t.g1 + sgn * d.x1, t.g2 + sgn * d.x2)
          }
          if (any) {
            state.update(t)
            val (w0, w1, w2) = graft.operators.Classify.solveLogit1(
              t.n, t.s1, t.s2, t.s11, t.s12, t.s22, t.g0, t.g1, t.g2)
            Iterator(LogitOut(src, t.n, w0, w1, w2))
          } else Iterator.empty
      }
  }
}
