package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TxnTable

/** Log-structured table format: snapshot reads, time travel, atomic
  * overwrite, OPTIMIZE (layout changes, contents don't, history intact),
  * VACUUM (retention honored; too-old time travel fails loudly), and the
  * commit-audit history table. */
class TxnTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String =
    Files.createTempDirectory("txn_spec").toString

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import spark.implicits._
    d.select("id").as[Long].collect().sorted.toSeq
  }

  test("appends accumulate; every version stays readable") {
    val root = tbl()
    assert(TxnTable.append(df(1 to 3), root) == 0L)
    assert(TxnTable.append(df(4 to 5), root) == 1L)
    assert(ids(TxnTable.read(spark, root)) == (1L to 5L))
    assert(ids(TxnTable.readVersion(spark, root, 0)) == (1L to 3L))
    intercept[IllegalArgumentException](TxnTable.readVersion(spark, root, 7))
  }

  test("overwrite flips atomically and the old version time-travels") {
    val root = tbl()
    TxnTable.append(df(1 to 3), root)
    TxnTable.overwrite(df(10 to 11), root)
    assert(ids(TxnTable.read(spark, root)) == Seq(10L, 11L))
    assert(ids(TxnTable.readVersion(spark, root, 0)) == (1L to 3L))
  }

  test("OPTIMIZE compacts files but never changes contents or history") {
    val root = tbl()
    TxnTable.append(df(1 to 100).repartition(8), root) // 8 small files
    TxnTable.append(df(101 to 120).repartition(4), root)
    val before = TxnTable.history(spark, root).count()
    TxnTable.optimize(spark, root, smallBytes = Long.MaxValue, targetPartitions = 1)
    val live = TxnTable.history(spark, root)
      .where("version = 2 and action = 'add'").count()
    assert(live == 1, "compaction must produce one file")
    assert(ids(TxnTable.read(spark, root)) == (1L to 120L))
    assert(ids(TxnTable.readVersion(spark, root, 0)) == (1L to 100L),
      "pre-optimize versions must stay readable")
    assert(TxnTable.history(spark, root).count() > before)
  }

  test("VACUUM honors retention, then too-old time travel fails loudly") {
    val root = tbl()
    TxnTable.append(df(1 to 50).repartition(4), root)  // v0
    TxnTable.append(df(51 to 60), root)                // v1
    TxnTable.optimize(spark, root, smallBytes = Long.MaxValue) // v2
    val deleted = TxnTable.vacuum(root, retainAfter = 1)
    assert(deleted.nonEmpty, "the compacted-away v0/v1 files must be deleted")
    assert(ids(TxnTable.read(spark, root)) == (1L to 60L), "latest unaffected")
    val e = intercept[IllegalArgumentException](
      TxnTable.readVersion(spark, root, 0))
    assert(e.getMessage.contains("vacuum"))
  }

  test("commits are atomic renames: a version cannot be committed twice") {
    val root = tbl()
    TxnTable.append(df(1 to 3), root)
    assert(TxnTable.latestVersion(root) == 0L)
    // the single-writer guard: re-creating version 0 is refused
    val log = java.nio.file.Paths.get(root, "_txn_log")
    assert(java.nio.file.Files.list(log).count() == 1)
  }
}
