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
  * [[drop]] exists for tests and for callers that rebuild a dir.
  *
  * Boundedness: entries are keyed by `(session, dir)` and pinned
  * checkpoint blocks live until released, so a long-lived service that
  * crosses MANY dirs (multi-tenant scratch tables, per-day locations)
  * would otherwise accumulate pins without limit. The registry therefore
  * keeps a process-wide LRU over the distinct `(session, dir)` working
  * sets: when more than [[maxDirs]] keys hold live artifacts, the
  * least-recently-USED key's artifacts are dropped from EVERY per-operator
  * registry and their blocks released through [[Materialize.release]].
  * Eviction is whole-working-set on purpose — one dir's artifacts are
  * derived from the same tables and age together; evicting single
  * artifacts would leave a dir half-warm. An evicted dir is rebuilt on
  * next touch (the artifacts are derivable), so eviction can never change
  * results, only timings.
  */
object Artifacts {

  type Key = (SparkSession, String)

  /** Max distinct (session, dir) working sets with live artifacts. The
    * default comfortably covers a test/bench process (three SFs + scratch
    * dirs); services crossing many table locations tune it to their
    * executor-storage budget. */
  @volatile var maxDirs: Int = 8

  // every per-operator registry that ever publishes, discovered on use —
  // eviction must reach all of them, whatever module they live in
  private val registries =
    java.util.concurrent.ConcurrentHashMap.newKeySet[TrieMap[Key, _]]()
  // access-ordered recency over live keys; guarded by its own monitor
  private val lru = new java.util.LinkedHashMap[Key, Unit](16, 0.75f, true)

  def cached[V](reg: TrieMap[Key, V], s: SparkSession, dir: String)
               (build: => V): V = {
    registries.add(reg)
    val key = (s, dir)
    val out = reg.get(key) match {
      case Some(v) => v
      case None =>
        val built = build
        reg.putIfAbsent(key, built) match {
          case Some(winner) => releaseAll(built); winner
          case None         => built
        }
    }
    touchAndEvict(key)
    out
  }

  private def touchAndEvict(current: Key): Unit = {
    val victims = lru.synchronized {
      lru.put(current, ())
      if (lru.size <= maxDirs) Nil
      else {
        val it = lru.keySet.iterator
        val vs = List.newBuilder[Key]
        var excess = lru.size - maxDirs
        while (excess > 0 && it.hasNext) {
          val k = it.next()
          if (k != current) { vs += k; excess -= 1 }
        }
        val out = vs.result()
        out.foreach(lru.remove)
        out
      }
    }
    victims.foreach { case (s, dir) =>
      registries.forEach { r =>
        drop(r.asInstanceOf[TrieMap[Key, Any]], s, dir)
      }
    }
  }

  /** Live distinct (session, dir) keys — observability + spec hook. */
  def liveDirs: Int = lru.synchronized(lru.size)

  /** Forget (and free) one artifact — eviction, test hygiene, explicit
    * rebuild. (Does not touch the LRU: a drop during eviction already
    * removed the key; an explicit caller drop leaves recency to decay
    * naturally.) */
  def drop[V](reg: TrieMap[Key, V], s: SparkSession, dir: String): Unit =
    reg.remove((s, dir)).foreach(releaseAll)

  private def releaseAll(v: Any): Unit = v match {
    case df: DataFrame                 => Materialize.release(df)
    case (a: DataFrame, b: DataFrame)  => Materialize.release(a); Materialize.release(b)
    case (df: DataFrame, _)            => Materialize.release(df)
    case _                             => ()
  }
}
