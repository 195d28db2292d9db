package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable

/** Generated columns with DERIVED partition pruning: the day-partitioned-
  * by-timestamp table declares `day = date_format(ts, 'yyyy-MM-dd')` once;
  * a predicate on `ts` alone prunes day directories, writes violating the
  * rule refuse, and the mirror records Delta's generationExpression. */
class GeneratedColumnsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("gen_tbl").toString

  /** 4 days × 6 rows, ts stepping 4 hours. */
  private def dayRows = {
    import spark.implicits._
    (0 until 24).map { i =>
      val ts = java.sql.Timestamp.valueOf(s"2024-03-${10 + i / 6} 0${i % 6}:30:00")
      (i.toLong, ts, f"2024-03-${10 + i / 6}%02d")
    }.toDF("id", "ts", "day")
  }

  test("predicate on the SOURCE column prunes the generated PARTITIONS") {
    val root = tbl()
    TxnTable.appendPartitioned(dayRows, root, Seq("day"))
    TxnTable.setGeneratedColumn(spark, root, "day",
      "date_format(ts, 'yyyy-MM-dd')")
    // the user filters on ts ONLY — the pruner must derive day >= / <=
    val pred = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-12 00:00:00"))
    val (kept, skipped) = TxnTable.skippingReport(root, pred)
    assert(skipped > 0 && kept < kept + skipped,
      s"ts predicate must prune day directories: $kept kept, $skipped skipped")
    // exactly days 12 and 13 survive
    val keptDays = TxnTable.readWhere(spark, root, pred)
      .select("day").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(keptDays == Seq("2024-03-12", "2024-03-13"))
    assert(TxnTable.readWhere(spark, root, pred).count() == 12)
    // equality and BETWEEN derive too
    val eq = col("ts") === lit(java.sql.Timestamp.valueOf("2024-03-11 02:30:00"))
    val (k2, s2) = TxnTable.skippingReport(root, eq)
    assert(k2 <= 1 && s2 >= 3, s"point ts must prune to one day: $k2 kept")
    // a DELETE driven by a ts range prunes the same way (shared machinery)
    TxnTable.delete(spark, root,
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-13 00:00:00")))
    assert(TxnTable.read(spark, root).count() == 18)
  }

  test("writes violating the generation rule refuse; conforming ones land") {
    import spark.implicits._
    val root = tbl()
    TxnTable.appendPartitioned(dayRows, root, Seq("day"))
    TxnTable.setGeneratedColumn(spark, root, "day",
      "date_format(ts, 'yyyy-MM-dd')")
    val badRow = Seq((99L,
      java.sql.Timestamp.valueOf("2024-03-20 00:00:00"), "2024-03-19"))
      .toDF("id", "ts", "day")
    val e = intercept[IllegalArgumentException](
      TxnTable.appendPartitioned(badRow, root, Seq("day")))
    assert(e.getMessage.contains("generated(day)"), e.getMessage)
    val goodRow = Seq((99L,
      java.sql.Timestamp.valueOf("2024-03-20 00:00:00"), "2024-03-20"))
      .toDF("id", "ts", "day")
    TxnTable.appendPartitioned(goodRow, root, Seq("day"))
    assert(TxnTable.read(spark, root).count() == 25)
    // an UPDATE whose images break the rule refuses too
    intercept[IllegalArgumentException](
      TxnTable.update(spark, root, col("id") === 0L,
        Map("ts" -> lit(java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))))
    // declaring a rule existing rows violate refuses
    intercept[IllegalArgumentException](
      TxnTable.setGeneratedColumn(spark, root, "id", "cast(99 as bigint)"))
    // self-reference refuses
    intercept[IllegalArgumentException](
      TxnTable.setGeneratedColumn(spark, root, "id", "id + 1"))
  }

  test("div and substring forms derive; mirror records the metadata") {
    import spark.implicits._
    val root = tbl()
    val rows = (0 until 4000).map(i => (i.toLong, i.toLong / 1000L))
      .toDF("x", "bucket")
    TxnTable.appendPartitioned(rows, root, Seq("bucket"))
    val v = TxnTable.setGeneratedColumn(spark, root, "bucket", "x div 1000")
    // x >= 3000 must prune buckets 0..2 by derivation
    val (kept, skipped) = TxnTable.skippingReport(root, col("x") >= 3000L)
    assert(kept == 1 && skipped == 3, s"$kept kept, $skipped skipped")
    assert(TxnTable.readWhere(spark, root, col("x") >= 3000L).count() == 1000)
    // IN derives per-literal
    val (k2, s2) = TxnTable.skippingReport(root,
      col("x").isin(10L, 2010L))
    assert(k2 == 2 && s2 == 2, s"$k2 kept, $s2 skipped")
    // the mirror carries generationExpression + legacy writer 4
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
    assert(lines.exists(l => l.contains("generationExpression") &&
      l.contains("x div 1000")), lines)
    assert(lines.exists(l => l.contains(""""minWriterVersion":4""")), lines)
    // substring form on an unpartitioned table prunes by file stats
    val sroot = tbl()
    val srows = (0 until 1000).map(i => (f"k$i%04d", f"k$i%04d".take(2)))
      .toDF("k", "pre")
    TxnTable.append(srows.repartitionByRange(4, $"k"), sroot)
    TxnTable.setGeneratedColumn(spark, sroot, "pre", "substring(k, 1, 2)")
    assert(TxnTable.readWhere(spark, sroot, col("k") >= "k0900").count() == 100)
  }
}
