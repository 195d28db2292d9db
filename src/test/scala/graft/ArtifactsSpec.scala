package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** The pinned-artifact registry is BOUNDED: cycling more distinct dirs
  * than [[Artifacts.maxDirs]] must evict the least-recently-used dir's
  * artifacts from every registry AND release their pinned checkpoint
  * blocks from executor storage — a long-lived service crossing many
  * table locations cannot accumulate pins without limit. Eviction only
  * drops caches (artifacts rebuild on next touch), so it can never change
  * results. */
class ArtifactsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def pinnedBuild(tag: String): DataFrame = {
    import spark.implicits._
    Materialize.eager(Seq(tag).toDF("t"), pin = true)
  }

  test("cycling dirs past the cap evicts LRU working sets and frees their pins") {
    val reg = TrieMap.empty[Artifacts.Key, DataFrame]
    val reg2 = TrieMap.empty[Artifacts.Key, DataFrame]
    val saved = Artifacts.maxDirs
    // the global LRU may hold real testdata dirs from earlier suites; a
    // small cap just evicts (and later re-derives) their caches — safe
    Artifacts.maxDirs = 2
    try {
      def dirs(r: TrieMap[Artifacts.Key, DataFrame]) =
        r.keys.map(_._2).toSet
      // count only pins THIS spec creates (RDD ids are monotonic): earlier
      // suites' registry dirs get evicted by the tiny cap and non-registry
      // pins linger, so absolute getPersistentRDDs counts aren't ours
      val marker = (spark.sparkContext.getPersistentRDDs.keys ++ Seq(-1)).max
      def livePins: Int =
        spark.sparkContext.getPersistentRDDs.keys.count(_ > marker)

      Artifacts.cached(reg, spark, "/lru/a")(pinnedBuild("a"))
      Artifacts.cached(reg2, spark, "/lru/a")(pinnedBuild("a2")) // 2nd registry, same dir
      Artifacts.cached(reg, spark, "/lru/b")(pinnedBuild("b"))
      assert(dirs(reg) == Set("/lru/a", "/lru/b"))

      // third distinct dir → /lru/a's working set evicted from BOTH registries
      Artifacts.cached(reg, spark, "/lru/c")(pinnedBuild("c"))
      assert(dirs(reg) == Set("/lru/b", "/lru/c"), dirs(reg))
      assert(dirs(reg2).isEmpty, "eviction must reach every registry")
      // storage: a+a2 released; of this spec's pins only b+c stay live
      assert(livePins == 2, spark.sparkContext.getPersistentRDDs)

      // recency, not insertion order: touch b, then add d ⇒ c is the victim
      Artifacts.cached(reg, spark, "/lru/b")(fail("b is cached — builder must not run"))
      Artifacts.cached(reg, spark, "/lru/d")(pinnedBuild("d"))
      assert(dirs(reg) == Set("/lru/b", "/lru/d"), dirs(reg))
      assert(Artifacts.liveDirs <= 2)
    } finally {
      Artifacts.maxDirs = saved
      Seq("a", "b", "c", "d").foreach { x =>
        Artifacts.drop(reg, spark, s"/lru/$x")
        Artifacts.drop(reg2, spark, s"/lru/$x")
      }
    }
  }
}
