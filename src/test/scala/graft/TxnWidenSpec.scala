package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable

/** TYPE WIDENING (the metadata-only type-evolution table feature): a
  * column outgrows INT without rewriting a byte — old files keep their
  * narrow physical type and the parquet scan up-converts, new files write
  * wide, time travel below the widen keeps the narrow type, the widening
  * matrix refuses lossy changes, and the mirror records the feature. */
class TxnWidenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("widen_tbl").toString

  private def intDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 10)).toDF("id", "n") // n: IntegerType
  }

  test("widen INT→BIGINT is metadata-only; old files read up-converted") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(intDf(1 to 100).repartition(2), root)        // v0
    val dataBefore = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap
    TxnTable.widenColumn(spark, root, "n", LongType)             // v1
    val dataAfter = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap
    assert(dataAfter == dataBefore, "widen must not touch data files")
    // the live schema is wide; values from the INT files come back exact
    val wide = TxnTable.read(spark, root)
    assert(wide.schema("n").dataType == LongType)
    assert(wide.agg(sum($"n")).as[Long].head() == (1 to 100).map(_ * 10L).sum)
    // an append can now carry values that OVERFLOW int
    TxnTable.append(Seq((200L, 10_000_000_000L)).toDF("id", "n"), root) // v2
    assert(TxnTable.read(spark, root).agg(max($"n")).as[Long].head() ==
      10_000_000_000L)
    // time travel below the widen keeps the narrow type
    assert(TxnTable.readVersion(spark, root, 0L).schema("n").dataType ==
      IntegerType)
    // the narrow append path now refuses — widen the table, not the batch
    intercept[IllegalArgumentException](TxnTable.append(intDf(300 to 301), root))
    // even the evolving append refuses a TYPE change, pointing at the
    // metadata-only widen instead
    val e = intercept[IllegalArgumentException](
      TxnTable.appendEvolve(intDf(300 to 301), root))
    assert(e.getMessage.contains("widenColumn"), e.getMessage)
  }

  test("widening matrix: lossless promotions only; partition columns refused") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(intDf(1 to 10), root)
    // long → int is a NARROWING; refuse
    intercept[Exception](TxnTable.widenColumn(spark, root, "id", IntegerType))
    // int → float would lose exactness past 2^24; refuse
    intercept[Exception](TxnTable.widenColumn(spark, root, "n", FloatType))
    // unknown column
    intercept[Exception](TxnTable.widenColumn(spark, root, "nope", LongType))
    // float → double and decimal growth are in the matrix
    assert(TxnTable.widens(FloatType, DoubleType))
    assert(TxnTable.widens(DecimalType(10, 2), DecimalType(14, 2)))
    assert(TxnTable.widens(DecimalType(10, 2), DecimalType(14, 4)))
    assert(!TxnTable.widens(DecimalType(10, 2), DecimalType(10, 4)),
      "scale growth must not shrink the integral digits")
    assert(!TxnTable.widens(DoubleType, FloatType))
    assert(!TxnTable.widens(StringType, LongType))
    // partition columns are path-encoded under the narrow parse — refused
    val proot = tbl()
    TxnTable.appendPartitioned(
      (1 to 10).map(i => (i.toLong, i, s"p${i % 2}")).toDF("id", "n", "p"),
      proot, Seq("p"))
    val pe = intercept[IllegalArgumentException](
      TxnTable.widenColumn(spark, proot, "p", LongType))
    assert(pe.getMessage.contains("partition"), pe.getMessage)
    // but a DATA column of a partitioned table widens fine
    TxnTable.widenColumn(spark, proot, "n", LongType)
    assert(TxnTable.read(spark, proot).schema("n").dataType == LongType)
    assert(TxnTable.read(spark, proot).agg(sum($"n")).as[Long].head() == 55L)
  }

  test("mirror records the typeWidening feature + per-field change history") {
    val root = tbl()
    TxnTable.append(intDf(1 to 10), root)
    val v = TxnTable.widenColumn(spark, root, "n", LongType)
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
    val proto = lines.find(_.startsWith("""{"protocol":"""))
    assert(proto.exists(l => l.contains(""""minReaderVersion":3""") &&
      l.contains("typeWidening")), proto)
    val meta = lines.find(_.startsWith("""{"metaData":"""))
    assert(meta.exists(l => l.contains("delta.enableTypeWidening") &&
      l.contains("typeChanges") && l.contains("integer") &&
      l.contains("long")), meta)
    // widen again (long is terminal for n, so grow a decimal elsewhere):
    // the history APPENDS — byte→…→long chains keep every hop auditable
    val root2 = tbl()
    import spark.implicits._
    TxnTable.append(Seq((1L, 1.toShort)).toDF("id", "s"), root2)
    TxnTable.widenColumn(spark, root2, "s", IntegerType)
    TxnTable.widenColumn(spark, root2, "s", LongType)
    val f = TxnTable.read(spark, root2).schema("s")
    assert(f.dataType == LongType)
    val hist = f.metadata.getString("delta.typeChanges")
    assert(hist.contains(""""fromType":"short","toType":"integer"""") &&
      hist.contains(""""fromType":"integer","toType":"long""""), hist)
  }

  test("widened column: stats pruning, DVs, merge, and the txn-tail compose") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(intDf(1 to 100).repartitionByRange(4, $"n"), root) // v0
    TxnTable.widenColumn(spark, root, "n", LongType)                   // v1
    TxnTable.append(Seq((200L, 5_000_000_000L), (201L, 6_000_000_000L))
      .toDF("id", "n").coalesce(1), root)                              // v2
    // stats written under INT prune correctly against BIGINT literals
    val totalLive = TxnTable.liveAddsForTest(root).size
    val (kept, skipped) = TxnTable.skippingReport(root, col("n") > 4_000_000_000L)
    assert(kept == 1 && kept + skipped == totalLive,
      s"kept $kept, skipped $skipped ($totalLive live)")
    assert(TxnTable.readWhere(spark, root, col("n") > 4_000_000_000L)
      .count() == 2)
    // the streaming tail up-converts the INT files under the wide schema
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("widen_tail").start()
    try {
      q.processAllAvailable()
      val got = spark.table("widen_tail").agg(sum($"n")).as[Long].head()
      assert(got == (1 to 100).map(_ * 10L).sum + 11_000_000_000L)
    } finally q.stop()
    // merge-on-read delete through the widened scan
    TxnTable.deleteDv(spark, root, col("n") === 100L)                  // v3
    assert(TxnTable.read(spark, root).count() == 101)
  }
}
