package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus-ingest monitor — the stateful streaming twin of the
  * batch per-source rollup behind `q_corpus_card`/`q_stats_by_lang`: as
  * document batches land (a crawl frontier, a CDC-fed document store),
  * per-source running totals fold into keyed state and every batch emits
  * the updated snapshot rows — the live "dataset card" a curation
  * dashboard reads without ever re-scanning the corpus.
  *
  * The fold (count/sum/min/max) is commutative and associative, so arrival
  * order cannot change the result and the recovered-after-restart totals
  * are provably identical to a batch `groupBy(source)` over everything fed
  * (spec-gated, same twin proof as Sessionize/Upsert/Scd2). State is one
  * record per SOURCE — bounded by the source catalog, not the corpus — so
  * at 100 TB/day ingest the state store holds a handful of rows per
  * partition while the heavy lifting stays in the map-side partial fold.
  */
object CorpusMonitor {

  case class DocIngest(doc_id: Long, source: String, n_tok: Long)
  case class SourceTotals(n_docs: Long, n_tokens: Long, min_tok: Long, max_tok: Long)
  case class TotalsOut(source: String, n_docs: Long, n_tokens: Long,
                       min_tok: Long, max_tok: Long)

  def monitor(docs: Dataset[DocIngest]): Dataset[TotalsOut] = {
    implicit val stateEnc = Encoders.product[SourceTotals]
    implicit val outEnc = Encoders.product[TotalsOut]
    implicit val keyEnc = Encoders.STRING
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[SourceTotals, TotalsOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[DocIngest], state: GroupState[SourceTotals]) =>
          var t = state.getOption.getOrElse(SourceTotals(0L, 0L, Long.MaxValue, Long.MinValue))
          var any = false
          batch.foreach { d =>
            any = true
            t = SourceTotals(t.n_docs + 1, t.n_tokens + d.n_tok,
              math.min(t.min_tok, d.n_tok), math.max(t.max_tok, d.n_tok))
          }
          if (any) {
            state.update(t)
            Iterator(TotalsOut(src, t.n_docs, t.n_tokens, t.min_tok, t.max_tok))
          } else Iterator.empty
      }
  }
}
