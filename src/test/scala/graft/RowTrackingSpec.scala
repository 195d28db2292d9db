package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable

/** ROW TRACKING (stable row ids): enable backfills dense id blocks, fresh
  * appends extend the never-reused high-water mark, merge-on-read DML
  * keeps survivors' ids by construction, layout rewrites (optimize /
  * purge / cluster) MATERIALIZE ids through the rewrite, the mark
  * survives checkpoint + log expiry, clones inherit ids without later
  * collisions, and the mirror records the protocol's row-tracking state. */
class RowTrackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("rowid_tbl").toString

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  private def idsByKey(root: String): Map[Long, Long] = {
    import spark.implicits._
    TxnTable.readWithRowIds(spark, root).select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
  }

  test("enable backfills dense blocks; appends extend; MoR deletes keep ids") {
    val root = tbl()
    TxnTable.append(df(1 to 100).repartition(3), root)       // v0 (untracked)
    intercept[IllegalArgumentException](TxnTable.readWithRowIds(spark, root))
    TxnTable.enableRowTracking(spark, root)                   // v1
    val m1 = idsByKey(root)
    assert(m1.size == 100 && m1.values.toSeq.sorted == (0L until 100L),
      "backfill must assign one dense block of 100 ids")
    // a fresh append gets the NEXT block
    TxnTable.append(df(101 to 120), root)                     // v2
    val m2 = idsByKey(root)
    assert((m2 -- (101L to 120L)) == m1, "existing rows must not move")
    assert((101L to 120L).map(m2).sorted == (100L until 120L))
    // the enable commit is LAYOUT-ONLY to change consumers: a tail across
    // it re-delivers nothing, the incremental CDF emits nothing for it
    val feed = TxnTable.changeFeedIncremental(spark, root, -1L, 2L)
    assert(feed.filter(col("_commit_version") === 1L).count() == 0,
      "enable-row-tracking must be silent in the change feed")
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("rowid_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rowid_tail").count() == 120,
        "the tail must deliver each row once, never re-deliver the enable")
    } finally q.stop()
    // merge-on-read delete: untouched rows keep their exact ids
    TxnTable.deleteDv(spark, root, col("id") % 10L === 0L)    // v3
    val m3 = idsByKey(root)
    assert(m3 == m2.filter { case (k, _) => k % 10 != 0 },
      "DV delete must not move a surviving row's id")
    // idempotent enable commits nothing
    assert(TxnTable.enableRowTracking(spark, root) == 3L)
  }

  test("layout rewrites materialize ids: optimize, purge, cluster") {
    val root = tbl()
    TxnTable.append(df(1 to 200).repartition(4), root)        // v0
    TxnTable.enableRowTracking(spark, root)                   // v1
    val before = idsByKey(root)
    TxnTable.optimize(spark, root)                            // v2 compacts all
    assert(idsByKey(root) == before, "OPTIMIZE must preserve every row id")
    // the compacted files carry the MATERIALIZED column
    TxnTable.deleteDv(spark, root, col("id") <= 120L)         // v3: 60% marked
    TxnTable.purgeDeletes(spark, root, minDeletedFraction = 0.5) // v4 rewrites
    assert(idsByKey(root) == before.filter(_._1 > 120L),
      "PURGE shifts physical positions — only materialization keeps ids")
    assert(TxnTable.liveAddsForTest(root).forall(_.dv.isEmpty))
    // incremental clustering preserves too
    TxnTable.setClustering(spark, root, Seq("id"))            // v5
    TxnTable.optimizeCluster(spark, root)                     // v6
    assert(idsByKey(root) == before.filter(_._1 > 120L),
      "clustering pass must preserve ids")
    // the materialized column never leaks into plain reads
    assert(TxnTable.read(spark, root).columns.toSeq == Seq("id", "payload"))
  }

  test("mergeDv: survivors stable, inserts fresh, no id ever reused") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 50), root)                        // v0
    TxnTable.enableRowTracking(spark, root)                   // v1
    val m1 = idsByKey(root)
    val delta = Seq((3L, "upd3"), (999L, "new")).toDF("id", "payload")
    TxnTable.mergeDv(spark, delta, root, Seq("id"))           // v2
    val m2 = idsByKey(root)
    assert((m2 - 3L - 999L) == (m1 - 3L), "unmatched rows keep their ids")
    assert(m2(999L) >= 50L, "the insert gets a fresh id")
    assert(m2(3L) >= 50L && m2(3L) != m1(3L),
      "the replacement image is a new row (delete+insert id semantics)")
    assert(m2.values.toSeq.distinct.size == m2.size, "ids stay unique")
  }

  test("hwm survives checkpoint + expireLog: expired history never recycles ids") {
    val root = tbl()
    TxnTable.append(df(1 to 40), root)                        // v0
    TxnTable.enableRowTracking(spark, root)                   // v1
    TxnTable.overwrite(df(100 to 109), root)                  // v2: old ids dead
    val m2 = idsByKey(root)
    assert(m2.values.toSeq.sorted == (40L until 50L), "overwrite gets block 40..49")
    (0 until 8).foreach(i => TxnTable.append(df(200 + i to 200 + i), root)) // →v10 ckpt
    TxnTable.expireLog(root)
    // the add actions that carried ids 0..39 are EXPIRED — the mark must
    // still refuse to hand those ids out again
    TxnTable.append(df(300 to 300), root)                     // v11
    val m11 = idsByKey(root)
    assert(m11(300L) >= 58L, s"expired history must never recycle ids: ${m11(300L)}")
    assert(m11.values.toSeq.distinct.size == m11.size)
  }

  test("clones inherit ids; writes through the clone never collide") {
    import spark.implicits._
    val root = tbl()
    val dst = tbl() + "/clone"
    TxnTable.append(df(1 to 30), root)                        // v0
    TxnTable.enableRowTracking(spark, root)                   // v1
    val src = idsByKey(root)
    TxnTable.cloneShallow(root, dst)
    assert(idsByKey(dst) == src, "the clone reads the source's ids")
    TxnTable.append(df(31 to 35), dst)
    val m = idsByKey(dst)
    assert((m -- (31L to 35L)) == src)
    assert((31L to 35L).map(m).min >= 30L, "clone appends must not collide")
    assert(m.values.toSeq.distinct.size == m.size)
    assert(idsByKey(root) == src, "the source never moves")
  }

  test("mirror records baseRowId, defaultRowCommitVersion, domain hwm, feature") {
    val root = tbl()
    TxnTable.append(df(1 to 25), root)                        // v0
    val v = TxnTable.enableRowTracking(spark, root)           // v1
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
    assert(lines.exists(l => l.contains(""""baseRowId":0""") &&
      l.contains(s""""defaultRowCommitVersion":$v""")), lines)
    assert(lines.exists(l => l.contains(""""domain":"delta.rowTracking"""") &&
      l.contains("rowIdHighWaterMark") && l.contains("24")), lines)
    assert(lines.exists(l => l.contains("\"protocol\"") &&
      l.contains("rowTracking") && l.contains("domainMetadata")), lines)
    assert(lines.exists(_.contains("delta.rowTracking.materializedRowIdColumnName")),
      lines)
    // the checkpoint carries both the add's base and the domain hwm
    (0 until 9).foreach(i => TxnTable.append(df(100 + i to 100 + i), root)) // →v10
    val cp = Paths.get(root, "_delta_log", f"${10L}%020d.checkpoint.parquet")
    assert(Files.exists(cp))
    val cpDf = spark.read.parquet(cp.toString)
    assert(cpDf.filter(col("add.baseRowId").isNotNull).count() ==
      TxnTable.liveAddsForTest(root).size, "every live add is stamped")
    val dom = cpDf.filter(col("domainMetadata").isNotNull)
      .select("domainMetadata.domain", "domainMetadata.configuration").collect()
    assert(dom.length == 1 && dom.head.getString(0) == "delta.rowTracking" &&
      dom.head.getString(1).contains("rowIdHighWaterMark"), dom.toSeq)
  }
}
