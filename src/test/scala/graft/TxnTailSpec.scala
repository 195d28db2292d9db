package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TxnTable

/** The `txn-tail` streaming source: micro-batches tail the commit log
  * version by version (the offset IS the version), layout-only commits
  * never re-deliver rows, data rewrites fail loudly unless opted into,
  * and a checkpointed restart resumes exactly after the last consumed
  * version — the read half of the TxnSink ↔ TxnTable exactly-once loop. */
class TxnTailSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("txn_tail").toString

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  test("tails appends version by version, skipping OPTIMIZE layout commits") {
    val root = tbl()
    TxnTable.append(df(1 to 3).coalesce(1), root)  // v0
    TxnTable.append(df(4 to 5).coalesce(1), root)  // v1
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("tail1").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tail1").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(got.map(_._1) == (1L to 5L))
      assert(got.map(_._3) == Seq(0L, 0L, 0L, 1L, 1L), "commit provenance")

      // compaction between batches must not re-deliver rows
      TxnTable.optimize(spark, root, targetPartitions = 1)       // v2, layout
      TxnTable.append(df(6 to 6).coalesce(1), root)              // v3
      q.processAllAvailable()
      val all = spark.table("tail1").collect()
        .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
      assert(all.map(_._1) == (1L to 6L), s"optimize re-delivered rows: $all")
      assert(all.last == ((6L, 3L)))
    } finally q.stop()
  }

  test("checkpointed restart resumes after the last consumed version") {
    import spark.implicits._
    val root = tbl()
    val ckpt = Files.createTempDirectory("txn_tail_ckpt").toString
    val out = Files.createTempDirectory("txn_tail_out").toString
    TxnTable.append(df(1 to 2).coalesce(1), root)
    def run(): Unit = {
      val q = spark.readStream.format("txn-tail").option("path", root).load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    TxnTable.append(df(3 to 4).coalesce(1), root)
    run() // restart from checkpoint: only version 1 is new
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 4L), s"restart must neither skip nor duplicate: $got")
  }

  test("a data rewrite fails loudly unless ignoreChanges is set") {
    import org.apache.spark.sql.functions._
    val root = tbl()
    TxnTable.append(df(1 to 10).coalesce(1), root)
    TxnTable.delete(spark, root, col("id") >= 9L) // rewrites v0's file
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("tail3").start()
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    q.stop()
    assert(e.getMessage.contains("ignoreChanges") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreChanges")))

    val q2 = spark.readStream.format("txn-tail").option("path", root)
      .option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("tail3b").start()
    try {
      q2.processAllAvailable()
      // v0's 10 rows + the delete version's rewritten file (8 survivors)
      val ids = spark.table("tail3b").collect().map(_.getLong(0)).toSeq
      assert(ids.length == 18 && ids.count(_ == 1L) == 2,
        "ignoreChanges re-emits the rewritten file (documented duplication)")
    } finally q2.stop()
  }

  test("temporal and decimal columns stream through the tail exactly") {
    import spark.implicits._
    val root = tbl()
    val base = java.time.Instant.parse("2024-05-01T12:00:00Z")
    val d = (1 to 20).map { i =>
      (i.toLong,
        java.sql.Timestamp.from(base.plusSeconds(i * 60L)),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 5, 1).plusDays(i % 3)),
        new java.math.BigDecimal(s"$i.75"))
    }.toDF("id", "ts", "day", "amt")
      .withColumn("amt", org.apache.spark.sql.functions.col("amt").cast("decimal(10,2)"))
    TxnTable.append(d.coalesce(1), root)
    val q = spark.readStream.format("txn-tail").option("path", root).load()
      .writeStream.format("memory").queryName("tailTypes").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tailTypes").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
          r.getDate(2).toString, r.getDecimal(3))).sortBy(_._1)
      assert(rows.length == 20)
      assert(rows.head == ((1L, base.plusSeconds(60L), "2024-05-02",
        new java.math.BigDecimal("1.75"))))
      assert(rows.last._2 == base.plusSeconds(1200L))
    } finally q.stop()
  }

  test("maxVersionsPerBatch bounds the backfill: a long history arrives in steps") {
    val root = tbl()
    for (k <- 0 until 6) TxnTable.append(df(k * 10 + 1 to k * 10 + 10).coalesce(1), root)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("txn-tail").option("path", root)
      .option("maxVersionsPerBatch", "2").load()
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.size >= 3, s"6 versions at <=2 per batch need >=3 batches: $batches")
    assert(nonEmpty.forall(_.size <= 2), s"a batch exceeded the cap: $batches")
    assert(nonEmpty.flatten.toSet == (0L to 5L).toSet, "backfill must cover every version")
  }

  test("startingVersion skips history; unsupported shapes are refused") {
    import org.apache.spark.sql.functions._
    val root = tbl()
    TxnTable.append(df(1 to 3).coalesce(1), root)  // v0
    TxnTable.append(df(4 to 5).coalesce(1), root)  // v1
    val q = spark.readStream.format("txn-tail").option("path", root)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("tail4").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail4").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(4L, 5L))
    } finally q.stop()

    // partitioned tables tail too: path-encoded columns come back as
    // per-file constants from the add actions' partitionValues
    import spark.implicits._
    val proot = tbl()
    TxnTable.appendPartitioned(
      Seq((1L, "a", "s1"), (2L, "b", "s2"), (3L, "c", null))
        .toDF("id", "payload", "shard"), proot, Seq("shard"))
    val pq = spark.readStream.format("txn-tail").option("path", proot).load()
      .writeStream.format("memory").queryName("tailPart").start()
    try {
      pq.processAllAvailable()
      val rows = spark.table("tailPart").collect()
        .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      assert(rows == Seq((1L, "s1"), (2L, "s2"), (3L, null)), rows)
    } finally pq.stop()
  }

  test("readChangeFeed streams each commit's changes: inserts, cdc rows, no re-emits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = tbl()
    TxnTable.append(df(1 to 10).coalesce(1), root)                     // v0
    val q = spark.readStream.format("txn-tail").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdfTail").start()
    try {
      q.processAllAvailable()
      val v0 = spark.table("cdfTail").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      assert(v0.length == 10 && v0.forall(t => t._2 == "insert" && t._3 == 0L), v0.toSeq)

      // a CDF merge arrives as exactly its change rows; carried rows and
      // the compaction that follows stay silent
      val delta = Seq((3L, "UPD"), (42L, "NEW")).toDF("id", "payload")
      TxnTable.merge(spark, delta, root, Seq("id"), cdf = true)        // v1
      TxnTable.optimize(spark, root, targetPartitions = 1)             // v2, layout
      TxnTable.delete(spark, root, col("id") === 5L, cdf = true)       // v3
      q.processAllAvailable()
      val tailRows = spark.table("cdfTail").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .filter(_._4 > 0L).sortBy(t => (t._4, t._1, t._3)).toSeq
      assert(tailRows == Seq(
        (3L, "UPD", "update_postimage", 1L),
        (3L, "v3", "update_preimage", 1L),
        (42L, "NEW", "insert", 1L),
        (5L, "v5", "delete", 3L)), tailRows)
    } finally q.stop()

    // a rewrite without change files refuses the change-feed stream
    TxnTable.overwrite(df(1 to 2), root)                               // v4
    val q2 = spark.readStream.format("txn-tail").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", "4").load()
      .writeStream.format("memory").queryName("cdfTail2").start()
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    q2.stop()
    assert(e.getMessage.contains("without change files") ||
      Option(e.getCause).exists(_.getMessage.contains("without change files")))
  }

  test("readChangeFeed streams merge-on-read deletes from the bitmap delta") {
    import org.apache.spark.sql.functions.col
    val root = tbl()
    TxnTable.append(df(1 to 20).coalesce(1), root)                     // v0
    TxnTable.deleteDv(spark, root, col("id") <= 3L)                    // v1
    val q = spark.readStream.format("txn-tail").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdfDvTail").start()
    try {
      q.processAllAvailable()
      // a SECOND overlapping MoR delete mid-stream: only the delta arrives
      TxnTable.deleteDv(spark, root, col("id") <= 6L)                  // v2
      q.processAllAvailable()
      val rows = spark.table("cdfDvTail").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
        .filter(_._3 > 0L).sortBy(t => (t._3, t._1)).toSeq
      assert(rows == (1L to 3L).map(i => (i, "delete", 1L)) ++
        (4L to 6L).map(i => (i, "delete", 2L)), rows)
    } finally q.stop()
  }
}
