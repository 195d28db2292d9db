package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming observability (SURVEY §2.4 A7 / §2.7): the reference polls
  * `query.recentProgress` in a driver loop and reconciles sink row counts
  * against processed counts (ref: SaveDelta.scala:176-228). The idiomatic
  * Spark form is a [[StreamingQueryListener]] — push-based, no polling
  * thread, survives multiple queries per session.
  */
final class ProgressMonitor extends StreamingQueryListener {

  final case class Totals(batches: Long, inputRows: Long) {
    def meanRowsPerBatch: Double =
      if (batches == 0) 0.0 else inputRows.toDouble / batches
  }

  private val totalsByQuery = new ConcurrentHashMap[java.util.UUID, Totals]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    totalsByQuery.putIfAbsent(event.id, Totals(0, 0))

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    totalsByQuery.merge(event.progress.id, Totals(1, event.progress.numInputRows),
      (a, b) => Totals(a.batches + b.batches, a.inputRows + b.inputRows))

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def totals(queryId: java.util.UUID): Totals =
    totalsByQuery.getOrDefault(queryId, Totals(0, 0))

  def allTotals: Map[java.util.UUID, Totals] = {
    import scala.jdk.CollectionConverters._
    totalsByQuery.asScala.toMap
  }
}
