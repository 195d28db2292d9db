package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.TxnTable

/** Name-mode column mapping: RENAME is metadata-only (stable physical
  * parquet names + logical names in schema metadata). Covers the rename
  * round-trip, reads/writes/DML after a rename, stats pruning through the
  * name map, time travel below the rename, chained renames, refusals, and
  * the mirror's mapping metadata + protocol. */
class ColumnMappingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("cmap_tbl").toString

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  test("rename is metadata-only and round-trips old and new reads") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 50), root)                     // v0
    val dataBefore = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap
    TxnTable.renameColumn(spark, root, "payload", "body")  // v1
    assert(FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap == dataBefore,
      "rename must not touch data files")
    val now = TxnTable.read(spark, root)
    assert(now.columns.toSeq == Seq("id", "body"))
    assert(now.where($"body" === "v7").select($"id").as[Long].collect().toSeq == Seq(7L))
    // time travel below the rename keeps the old name
    assert(TxnTable.readVersion(spark, root, 0L).columns.toSeq == Seq("id", "payload"))
  }

  test("writes after a rename land physically stable; DML composes") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 20), root)                       // v0
    TxnTable.renameColumn(spark, root, "payload", "body")    // v1
    // append with the LOGICAL name; the file must carry the PHYSICAL one
    TxnTable.append(Seq((100L, "new")).toDF("id", "body"), root) // v2
    val newest = FsTest.list(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("v2-")).flatMap(d =>
        FsTest.walk(d).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))).toSeq
    assert(newest.nonEmpty)
    assert(spark.read.parquet(newest.head.toString).columns.contains("payload"),
      "post-rename files must keep the stable physical column name")
    assert(TxnTable.read(spark, root).where($"id" === 100L)
      .select($"body").as[String].collect().toSeq == Seq("new"))
    // merge + CoW delete + MoR delete through the mapping
    TxnTable.merge(spark, Seq((1L, "upd"), (200L, "ins")).toDF("id", "body"),
      root, Seq("id"))                                       // v3
    TxnTable.delete(spark, root, $"body" === "v2")           // v4
    TxnTable.deleteDv(spark, root, $"id" === 3L)             // v5
    val got = TxnTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "body"))
    assert(got.where($"id" === 1L).select($"body").as[String]
      .collect().toSeq == Seq("upd"))
    assert(got.where($"id".isin(2L, 3L, 200L)).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(200L), "delete paths broke under mapping")
    // overwrite preserves the mapping for later reads
    TxnTable.overwrite(Seq((7L, "ow")).toDF("id", "body"), root) // v6
    assert(TxnTable.read(spark, root).select($"id", $"body").as[(Long, String)]
      .collect().toSeq == Seq((7L, "ow")))
    assert(TxnTable.readVersion(spark, root, 5L).columns.toSeq == Seq("id", "body"))
  }

  test("stats pruning translates logical predicates to physical stat keys") {
    import spark.implicits._
    val root = tbl()
    val ev = (1 to 4000).map(i => (i.toLong, (i * 3).toLong)).toDF("id", "cents")
    TxnTable.append(ev.repartitionByRange(8, $"cents"), root)
    TxnTable.renameColumn(spark, root, "cents", "amount")
    val (kept, skipped) = TxnTable.skippingReport(root,
      $"amount" >= 600L && $"amount" <= 900L)
    assert(skipped > 0, s"pruning must survive the rename (kept=$kept)")
    assert(TxnTable.readWhere(spark, root, $"amount" >= 600L && $"amount" <= 900L)
      .count() == (600L to 900L).count(_ % 3 == 0))
  }

  test("chained renames keep the ORIGINAL physical name") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 5), root)
    TxnTable.renameColumn(spark, root, "payload", "body")
    TxnTable.renameColumn(spark, root, "body", "text")
    assert(TxnTable.read(spark, root).columns.toSeq == Seq("id", "text"))
    assert(TxnTable.read(spark, root).where($"text" === "v3").count() == 1)
    // the stored schema's metadata still points at the original name
    val meta = Files.readAllLines(Paths.get(root, "_delta_log",
      f"${2L}%020d.json")).asScala.find(_.startsWith("""{"metaData":"""))
    assert(meta.exists(_.contains("delta.columnMapping.physicalName")), meta)
    assert(meta.exists(_.contains("payload")),
      "physicalName must remain the original column name")
  }

  test("mirror records mapping config, protocol 2/5, and evolution composes") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 10), root)
    TxnTable.renameColumn(spark, root, "payload", "body")    // v1
    val v1 = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${1L}%020d.json")).asScala
    assert(v1.exists(l => l.contains(""""minReaderVersion":2""") &&
      l.contains(""""minWriterVersion":5""")), v1)
    assert(v1.exists(_.contains(""""delta.columnMapping.mode":"name"""")), v1)
    // schema evolution after the rename: new column appends fine
    TxnTable.appendEvolve(Seq((300L, "w", 2.5)).toDF("id", "body", "score"), root)
    val got = TxnTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "body", "score"))
    assert(got.where($"id" === 300L).select($"score").as[Double]
      .collect().toSeq == Seq(2.5))
    assert(got.where($"id" === 3L).select($"score").as[java.lang.Double]
      .collect().toSeq == Seq(null: java.lang.Double))
  }

  test("refusals: collision, missing column, partitioned table, constraint reference") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 5), root)
    intercept[IllegalArgumentException](
      TxnTable.renameColumn(spark, root, "payload", "id"))
    intercept[IllegalArgumentException](
      TxnTable.renameColumn(spark, root, "nope", "x"))
    TxnTable.setConstraint(spark, root, "pos", "id > 0")
    intercept[IllegalArgumentException](
      TxnTable.renameColumn(spark, root, "id", "ident"))
    // constraint on the OTHER column doesn't block renaming payload
    TxnTable.renameColumn(spark, root, "payload", "body")
    assert(TxnTable.read(spark, root).columns.toSeq == Seq("id", "body"))
    // PARTITION columns refuse (path-encoded names)
    val proot = tbl()
    TxnTable.appendPartitioned(
      Seq((1L, "a", "x")).toDF("id", "payload", "p"), proot, Seq("p"))
    intercept[IllegalArgumentException](
      TxnTable.renameColumn(spark, proot, "p", "part"))
  }

  test("DATA-column rename on a PARTITIONED table: reads, writes, DML") {
    import spark.implicits._
    val root = tbl()
    def pdf(ids: Range, p: String) =
      ids.map(i => (i.toLong, s"v$i", p)).toDF("id", "payload", "p")
    TxnTable.appendPartitioned(pdf(1 to 10, "a").union(pdf(11 to 20, "b")),
      root, Seq("p"))                                          // v0
    TxnTable.renameColumn(spark, root, "payload", "body")      // v1
    val got = TxnTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "body", "p"))
    assert(got.where($"body" === "v5").select($"p").as[String]
      .collect().toSeq == Seq("a"))
    // post-rename partitioned append under the new logical name: the
    // FILES must carry the stable physical name
    TxnTable.appendPartitioned(
      Seq((100L, "new", "c")).toDF("id", "body", "p"), root, Seq("p")) // v2
    assert(TxnTable.read(spark, root).where($"p" === "c")
      .select($"body").as[String].collect().toSeq == Seq("new"))
    // partition pruning + DML compose with the mapping
    assert(TxnTable.skippingReport(root, $"p" === "c")._2 > 0)
    TxnTable.delete(spark, root, $"body" === "v1")             // v3 CoW
    TxnTable.deleteDv(spark, root, $"id" === 12L)              // v4 MoR
    val fin = TxnTable.read(spark, root)
    assert(fin.count() == 19)
    assert(fin.where($"id".isin(1L, 12L)).count() == 0)
    // time travel below the rename keeps the old name
    assert(TxnTable.readVersion(spark, root, 0L).columns.toSeq ==
      Seq("id", "payload", "p"))
  }

  test("rename survives the checkpoint fold and expiry") {
    import spark.implicits._
    val root = tbl()
    (0 until 9).foreach(i => TxnTable.append(df(i * 10 + 1 to i * 10 + 10), root)) // v0..v8
    TxnTable.renameColumn(spark, root, "payload", "body")   // v9
    TxnTable.append(Seq((500L, "tail")).toDF("id", "body"), root) // v10 → checkpoint
    TxnTable.expireLog(root)
    val got = TxnTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "body"))
    assert(got.count() == 91)
    assert(got.where($"body" === "v42").count() == 1)
  }

  test("incremental CDF across a rename emits ONE seamless column") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 5), root)                             // v0
    TxnTable.renameColumn(spark, root, "payload", "body")         // v1
    TxnTable.append(Seq((6L, "v6")).toDF("id", "body"), root)     // v2
    TxnTable.deleteDv(spark, root, $"id" === 2L, cdf = true)      // v3
    // pre-rename frames carried `payload`; the feed must project them to
    // the range-end name through the stable physical identity — NOT union
    // two half-null columns
    val feed = TxnTable.changeFeedIncremental(spark, root, -1L, 3L)
    assert(feed.columns.toSeq.sorted ==
      Seq("_change_type", "_commit_version", "body", "id"),
      feed.columns.toSeq)
    val rows = feed.select("_change_type", "id", "body").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._2, t._1)).toSeq
    assert(rows == Seq(
      ("insert", 1L, "v1"), ("delete", 2L, "v2"), ("insert", 2L, "v2"),
      ("insert", 3L, "v3"), ("insert", 4L, "v4"), ("insert", 5L, "v5"),
      ("insert", 6L, "v6")).sortBy(t => (t._2, t._1)), rows)
    assert(rows.forall(_._3 != null), "no half-null frankencolumn")
  }

  test("txn-tail CHANGE FEED across a rename: cdc files resolve physically") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 3), root)                             // v0
    TxnTable.renameColumn(spark, root, "payload", "body")         // v1
    // a POST-rename cdf commit: its change file must carry the stable
    // physical name so the tail (and any physical-name reader) sees the
    // values under the new logical column, not nulls
    TxnTable.deleteDv(spark, root, $"id" === 2L, cdf = true)      // v2
    val q = spark.readStream.format("txn-tail").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("rename_cdf_tail").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rename_cdf_tail")
        .select("_change_type", "id", "body").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._2, t._1)).toSeq
      assert(got == Seq(
        ("insert", 1L, "v1"), ("delete", 2L, "v2"), ("insert", 2L, "v2"),
        ("insert", 3L, "v3")).sortBy(t => (t._2, t._1)), got)
      assert(got.forall(_._3 != null), "cdc columns must resolve, not null out")
    } finally q.stop()
  }

  test("txn-tail across a rename stitches old-physical files seamlessly") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append(df(1 to 3), root)                             // v0
    TxnTable.renameColumn(spark, root, "payload", "body")         // v1
    TxnTable.append(Seq((4L, "v4")).toDF("id", "body"), root)     // v2
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("rename_tail").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rename_tail").select("id", "body").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == (1L to 4L).map(i => (i, s"v$i")),
        s"pre-rename files must read under the new logical name: $got")
    } finally q.stop()
  }
}
