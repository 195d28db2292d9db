package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable

/** Symlink-manifest export for external engines: the manifest must fold
  * to exactly the live snapshot (flat and partitioned), regenerate
  * without ghosts, and refuse while deletion vectors are active. */
class ManifestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def readManifest(root: String): Seq[String] = {
    val base = Paths.get(root, "_symlink_format_manifest")
    FsTest.walk(base).iterator().asScala
      .filter(_.getFileName.toString == "manifest")
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq.sorted
  }

  /** Read the manifest the way an external engine would: parquet over
    * the listed URIs, nothing from the log. */
  private def externalRead(root: String) = {
    val uris = readManifest(root)
    spark.read.parquet(uris.map(u => Paths.get(java.net.URI.create(u)).toString): _*)
  }

  test("flat table: manifest folds to the live snapshot across DML") {
    import spark.implicits._
    val root = Files.createTempDirectory("mf_flat").toString
    TxnTable.append((1 to 100).map(i => (i.toLong, i * 10L))
      .toDF("id", "cents").repartition(3), root)
    TxnTable.delete(spark, root, col("id") > 90L)       // CoW: files rewrite
    val written = TxnTable.generateManifest(root)
    assert(written.nonEmpty && written.forall(_.startsWith("_symlink_format_manifest")))
    val got = externalRead(root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to 90).map(i => i.toLong -> (i * 10L)).toMap)
    // regeneration after OPTIMIZE must not leave ghost entries
    val before = readManifest(root)
    TxnTable.optimize(spark, root)
    TxnTable.generateManifest(root)
    val after = readManifest(root)
    assert(after.nonEmpty && after.intersect(before).isEmpty,
      "optimize rewrote every file; stale manifest lines are ghosts")
    assert(externalRead(root).count() == 90L)
  }

  test("partitioned table: per-partition manifests mirror the hive layout") {
    import spark.implicits._
    val root = Files.createTempDirectory("mf_part").toString
    val d = (1 to 90).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "grp")
    TxnTable.appendPartitioned(d, root, Seq("grp"))
    TxnTable.generateManifest(root)
    val base = Paths.get(root, "_symlink_format_manifest")
    val dirs = FsTest.walk(base).iterator().asScala
      .filter(_.getFileName.toString == "manifest")
      .map(p => base.relativize(p.getParent).toString).toSet
    assert(dirs == Set("grp=p0", "grp=p1", "grp=p2"), dirs)
    // an external engine reading one partition's manifest sees its rows
    val p1 = Files.readAllLines(base.resolve("grp=p1/manifest")).asScala
    val rows = spark.read.parquet(
      p1.map(u => Paths.get(java.net.URI.create(u)).toString).toSeq: _*)
      .collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == (1 to 90).filter(_ % 3 == 1).map(_.toLong))
  }

  test("active deletion vectors refuse the export, purge unblocks it") {
    import spark.implicits._
    val root = Files.createTempDirectory("mf_dv").toString
    TxnTable.append((1 to 100).map(i => (i.toLong, i * 10L))
      .toDF("id", "cents").repartition(2), root)
    TxnTable.deleteDv(spark, root, col("id") % 10L === 0L)
    val e = intercept[IllegalArgumentException] { TxnTable.generateManifest(root) }
    assert(e.getMessage.contains("deletion vectors"))
    TxnTable.purgeDeletes(spark, root, minDeletedFraction = 0.01)
    TxnTable.generateManifest(root)
    assert(externalRead(root).count() == 90L)
  }
}
