package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TxnTable

/** Liquid clustering (incremental z-order maintenance): the table declares
  * its clustering columns once; each optimizeCluster pass folds ONLY the
  * files that arrived since the last pass into the layout — clustered
  * bytes never rewrite, contents never change, 2-D pruning improves, DVs
  * materialize through the pass, vacuum dry-run reports without deleting. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("cluster_tbl").toString

  private def df(ids: Range) = {
    import spark.implicits._
    // x sweeps, y anti-sweeps: unclustered files span the whole (x, y)
    // plane, so a 2-D slice can prune nothing until the pass runs
    ids.map(i => (i.toLong, (10000 - i).toLong, s"v$i")).toDF("x", "y", "payload")
  }

  private def contents(root: String): Seq[Long] = {
    import spark.implicits._
    TxnTable.read(spark, root).select("x").as[Long].collect().sorted.toSeq
  }

  test("incremental pass: only files since the last pass rewrite") {
    val root = tbl()
    TxnTable.append(df(1 to 4000).repartition(4), root)      // v0
    TxnTable.setClustering(spark, root, Seq("x", "y"))       // v1
    assert(TxnTable.clusteringColumns(root) == Seq("x", "y"))
    val v2 = TxnTable.optimizeCluster(spark, root, targetPartitions = 4)
    assert(v2 == 2L)
    val afterFirst = TxnTable.liveAddsForTest(root).map(_.file).toSet
    // contents identical; 2-D slice now prunes where it could not before
    assert(contents(root) == (1L to 4000L))
    val (kept, skipped) = TxnTable.skippingReport(root,
      col("x") <= 1000L && col("y") <= 9000L)
    assert(skipped > 0, s"clustered layout must prune the 2-D slice: " +
      s"$kept kept, $skipped skipped")
    // new appends arrive unclustered; the NEXT pass touches only them
    TxnTable.append(df(4001 to 5000).repartition(2), root)   // v3
    val v4 = TxnTable.optimizeCluster(spark, root, targetPartitions = 1)
    assert(v4 == 4L)
    val afterSecond = TxnTable.liveAddsForTest(root).map(_.file).toSet
    assert(afterFirst.subsetOf(afterSecond),
      "the first pass's files must never rewrite")
    assert(contents(root) == (1L to 5000L))
    // fully clustered: another pass commits NOTHING
    assert(TxnTable.optimizeCluster(spark, root) == 4L)
    assert(TxnTable.latestVersion(root) == 4L)
  }

  test("clustering through deletion vectors materializes them") {
    val root = tbl()
    TxnTable.append(df(1 to 1000).repartition(2), root)      // v0
    TxnTable.setClustering(spark, root, Seq("x", "y"))       // v1
    TxnTable.deleteDv(spark, root, col("x") % 10L === 0L)    // v2
    val v3 = TxnTable.optimizeCluster(spark, root)           // v3
    assert(v3 == 3L)
    assert(TxnTable.liveAddsForTest(root).forall(_.dv.isEmpty),
      "the pass must read through DVs and drop them")
    assert(contents(root) == (1L to 1000L).filterNot(_ % 10 == 0))
    // vacuum dry-run REPORTS the superseded files without deleting them
    val wouldGo = TxnTable.vacuum(root, retainAfter = 2L, dryRun = true)
    assert(wouldGo.nonEmpty)
    assert(contents(root) == (1L to 1000L).filterNot(_ % 10 == 0))
    assert(TxnTable.readVersion(spark, root, 0L).count() == 1000,
      "dry run must leave time travel intact")
    // the real vacuum then removes exactly what the dry run named
    val gone = TxnTable.vacuum(root, retainAfter = 2L)
    assert(gone.toSet == wouldGo.toSet)
    intercept[Exception](TxnTable.readVersion(spark, root, 0L).collect())
  }

  test("renaming a clustering column renames the clustering config with it") {
    val root = tbl()
    TxnTable.append(df(1 to 500).repartition(2), root)
    TxnTable.setClustering(spark, root, Seq("x", "y"))
    TxnTable.optimizeCluster(spark, root)
    TxnTable.renameColumn(spark, root, "y", "y2")
    assert(TxnTable.clusteringColumns(root) == Seq("x", "y2"),
      "stale clustering config would break the next pass")
    // the next incremental pass works under the new name
    TxnTable.append(df(501 to 600).withColumnRenamed("y", "y2").repartition(1), root)
    TxnTable.optimizeCluster(spark, root)
    assert(contents(root) == (1L to 600L))
    // and a generation SOURCE column refuses to rename (stored SQL)
    val g = tbl()
    TxnTable.append(df(1 to 10), g)
    TxnTable.setGeneratedColumn(spark, g, "y", "10000 - x")
    val e = intercept[IllegalArgumentException](
      TxnTable.renameColumn(spark, g, "x", "x2"))
    assert(e.getMessage.contains("generation expression"), e.getMessage)
  }

  test("partitioned tables cluster within partitions; refusals are loud") {
    import spark.implicits._
    val root = tbl()
    val rows = (1 to 1000).map(i =>
      (i.toLong, (10000 - i).toLong, s"p${i % 2}")).toDF("x", "y", "p")
    TxnTable.appendPartitioned(rows, root, Seq("p"))
    // refusals: partition column, unknown, non-numeric
    intercept[Exception](TxnTable.setClustering(spark, root, Seq("p")))
    intercept[Exception](TxnTable.setClustering(spark, root, Seq("nope")))
    val sroot = tbl()
    TxnTable.append(df(1 to 10), sroot)
    intercept[Exception](TxnTable.setClustering(spark, sroot, Seq("payload")))
    intercept[Exception](TxnTable.optimizeCluster(spark, sroot)) // undeclared
    // clustering a partitioned table keeps every row in its partition
    TxnTable.setClustering(spark, root, Seq("x", "y"))
    TxnTable.optimizeCluster(spark, root, targetPartitions = 2)
    val got = TxnTable.read(spark, root)
      .groupBy($"p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("p0" -> 500L, "p1" -> 500L))
    assert(TxnTable.liveAddsForTest(root).forall(a =>
      a.partitionValues.contains("p")), "clustered files keep the hive layout")
  }
}
