package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Publish-once registry for stored-artifact relations (trained IVF
  * centroids, cluster labels, daily sketch tables, IVM base partials…).
  *
  * Why not `TrieMap.getOrElseUpdate`: under concurrent first calls it may
  * evaluate the builder more than once, eagerly materializing (and, for
  * `pin = true` artifacts, pinning for the JVM lifetime) a second copy
  * that nothing ever reads or frees. This helper builds OUTSIDE the map,
  * publishes with `putIfAbsent`, and releases the loser's checkpoint
  * blocks via [[Materialize.release]], so exactly one copy stays live.
  *
  * Lifecycle contract: an artifact models an IMMUTABLE at-rest index for
  * `(session, dir)` — new data arrives as a new dir (the incremental
  * operators' delta contract), so entries are never invalidated in place;
  * [[drop]] exists for tests and for callers that rebuild a dir. Entries
  * are bounded by the number of distinct data dirs a process touches
  * (three testdata SFs here; one per table location in production).
  */
object Artifacts {

  type Key = (SparkSession, String)

  def cached[V](reg: TrieMap[Key, V], s: SparkSession, dir: String)
               (build: => V): V =
    reg.get((s, dir)) match {
      case Some(v) => v
      case None =>
        val built = build
        reg.putIfAbsent((s, dir), built) match {
          case Some(winner) => releaseAll(built); winner
          case None         => built
        }
    }

  /** Forget (and free) one artifact — test hygiene / explicit rebuild. */
  def drop[V](reg: TrieMap[Key, V], s: SparkSession, dir: String): Unit =
    reg.remove((s, dir)).foreach(releaseAll)

  private def releaseAll(v: Any): Unit = v match {
    case df: DataFrame                 => Materialize.release(df)
    case (a: DataFrame, b: DataFrame)  => Materialize.release(a); Materialize.release(b)
    case (df: DataFrame, _)            => Materialize.release(df)
    case _                             => ()
  }
}
