package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.AtomicLong

/** Eager distributed materialization — the seam behind every "compute this
  * intermediate exactly once, keep it partitioned on the cluster" site
  * (LSH candidate sets, signature tables, trained IVF centroids, label
  * propagation rounds).
  *
  * Why a seam and not bare `localCheckpoint`: localCheckpoint stores blocks
  * on executors with NO lineage to recompute them — fast (no DFS
  * round-trip), but one lost executor makes every downstream read fail on a
  * churn-prone cluster. The fix is not to re-derive lineage but to swap the
  * storage: a temp-parquet round-trip is durable (any executor re-reads the
  * files) at the cost of one write+read. Both impls produce the same rows
  * and the same *downstream* plan role (a leaf scan that truncates lineage
  * and blocks optimizer pushthrough), so callers are impl-agnostic:
  *
  *   - [[LocalCheckpoint]] (default): right for local[*] and stable
  *     clusters — this repo's test/bench environment.
  *   - [[TempParquet]]: right for clusters with executor churn / spot
  *     instances; `root` is a job-scoped scratch dir the cluster manager
  *     cleans up.
  *
  * `pin = true` marks an RDD as a long-lived shared index (the trained-
  * centroid cache) that [[releaseTransient]] must NOT free between
  * benchmark queries.
  */
object Materialize {

  sealed trait Impl
  case object LocalCheckpoint extends Impl
  final case class TempParquet(root: String) extends Impl

  @volatile var impl: Impl = LocalCheckpoint

  private val counter = new AtomicLong(0)
  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Materialize `df` eagerly and return a relation whose lineage starts at
    * the materialized data. The input plan executes exactly once no matter
    * how many consumers read the result. */
  def eager(df: DataFrame, pin: Boolean = false): DataFrame = impl match {
    case LocalCheckpoint =>
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager = true)
      if (pin) (sc.getPersistentRDDs.keySet -- before).foreach(pinned.add(_))
      out
    case TempParquet(root) =>
      val path = s"$root/mat_${counter.incrementAndGet()}"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
  }

  /** Unpersist every non-pinned persisted RDD (checkpoint blocks included).
    * Benchmark hygiene: eager checkpoints are freed by the ContextCleaner
    * only when GC proves them unreachable, so without an explicit release
    * small queries inherit the storage pressure of every checkpoint-heavy
    * query that ran before them. Call between queries, never mid-query. */
  def releaseTransient(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinned.contains(id)) rdd.unpersist(blocking = true)
    }
}
