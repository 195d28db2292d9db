package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, Sources}
import graft.streaming.{CdcIngest, ProgressMonitor}

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("HR CSV ingest maps French headers to the canonical schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hr_csv")
    val csv =
      """ID salarié,Prénom,Nom,Date de naissance,BU,Date d'embauche,Salaire brut,Type de contrat,Adresse du domicile,Moyen de déplacement,Nombre de jours de CP
        |1,Audrey,Colin,1985-03-12,Marketing,2015-06-01,42000,CDI,"12 rue X, Montpellier",Marche/running,25
        |2,Marc,Durand,1990-11-02,R&D,2018-09-15,51000,CDD,"3 av Y, Nîmes",Transports en commun,30
        |""".stripMargin
    Files.write(dir.resolve("rh.csv"), csv.getBytes("UTF-8"))
    val df = Sources.hrCsv(spark, dir.toString)
    assert(df.columns.toSeq == Seq("id_employee", "first_name", "last_name",
      "birthday", "business_unity", "hire_date", "gross_salary",
      "constract_type", "address", "transport_mode", "paid_leaved_days"))
    val r = df.orderBy($"id_employee").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Int]("id_employee") == 1)
    assert(r(0).getAs[String]("transport_mode") == "Marche/running")
    assert(r(0).getAs[java.sql.Date]("birthday").toString == "1985-03-12")
    assert(r(1).getAs[Int]("gross_salary") == 51000)
  }

  test("rate fallback source streams rows (ref SaveDelta fallback)") {
    val q = Sources.rateStream(spark, rowsPerSecond = 100)
      .writeStream.format("memory").queryName("rate_probe")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      Thread.sleep(2500); q.processAllAvailable()
      assert(spark.sql("select count(*) from rate_probe").first().getLong(0) > 0)
    } finally q.stop()
  }

  test("overwrite sink evolves the schema: added columns replace the old footprint") {
    // the reference's Delta overwriteSchema=true semantics on plain parquet:
    // an overwrite fully replaces files, so readers see exactly the new schema
    import spark.implicits._
    val path = Files.createTempDirectory("evolve").toString + "/t"
    Sinks.overwriteTable(Seq((1, "a")).toDF("id", "v1"), path)
    Sinks.overwriteTable(Seq((1, "a", 9.5)).toDF("id", "v1", "v2_added"), path)
    val back = spark.read.parquet(path)
    assert(back.columns.toSeq == Seq("id", "v1", "v2_added"))
    assert(back.count() == 1 && back.first().getDouble(2) == 9.5)
    // and a column REMOVED by the next overwrite disappears too
    Sinks.overwriteTable(Seq((2, "b")).toDF("id", "v1"), path)
    assert(spark.read.parquet(path).columns.toSeq == Seq("id", "v1"))
  }

  test("sinks round-trip: overwrite is idempotent, append accumulates") {
    import spark.implicits._
    val path = Files.createTempDirectory("sink").toString + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Sinks.overwriteTable(df, path)
    Sinks.overwriteTable(df, path) // idempotent
    assert(spark.read.parquet(path).count() == 2)
    Sinks.appendTable(df, path)
    assert(spark.read.parquet(path).count() == 4)
  }

  test("ORC and JSON-lines sinks round-trip the reference schemas exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("fmt").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Sinks.orcSink(docs, s"$base/docs_orc")
    val orc = spark.read.orc(s"$base/docs_orc")
    assert(orc.schema == docs.schema)
    assert(docs.exceptAll(orc).isEmpty && orc.exceptAll(docs).isEmpty)
    // JSON-lines: schema must be asserted on read (self-describing but
    // untyped); values round-trip for the string/long document schema
    Sinks.jsonSink(docs, s"$base/docs_json")
    val js = spark.read.schema(docs.schema).json(s"$base/docs_json")
    assert(docs.exceptAll(js).isEmpty && js.exceptAll(docs).isEmpty)
  }

  test("ORC roundtrip prunes partitions: the isin filter reaches the directory layout") {
    // write the partitioned ORC layout exactly as the query does, then
    // check the scan's partition count: a pruned read of 2 of 5
    // event_type directories must touch only those partitions' files
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("orc_part").toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").orc(base)
    val pruned = spark.read.orc(base)
      .filter(col("event_type").isin("click", "purchase"))
    val plan = pruned.queryExecution.executedPlan.toString
    // FileSourceScanExec reports the pruned partition filters; the full
    // 5-type read must not appear
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(2), s"expected 2 pruned partitions, got $scanned")
    // and the oracle-gated query itself returns exactly the kept types
    val r = Sources.orcRoundtrip(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0)).sorted
    assert(r.toSeq == Seq("click", "purchase"))
  }

  test("JSONL roundtrip survives escaping: quotes, newlines, unicode, backslashes") {
    import spark.implicits._
    val base = Files.createTempDirectory("jsonl_esc").toString
    val tricky = Seq(
      (1L, "plain text", "en", "srcA", 10L),
      (2L, "quote \" backslash \\ tab\tend", "en", "srcA", 24L),
      (3L, "newline\ninside and émojis ☃ ünïcode", "fr", "srcB", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Sinks.jsonSink(tricky, s"$base/docs")
    val back = spark.read.schema(tricky.schema).json(s"$base/docs")
    assert(tricky.exceptAll(back).isEmpty && back.exceptAll(tricky).isEmpty)
    // corrupt lines must not silently vanish at scale: PERMISSIVE default
    // yields nulls, so production re-ingest counts must gate on them
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/docs/zz_corrupt.json"),
      "{not valid json\n".getBytes("UTF-8"))
    val withBad = spark.read.schema(tricky.schema).json(s"$base/docs")
    assert(withBad.filter($"doc_id".isNull).count() == 1)
  }

  test("compaction collapses a micro-file trail without changing content") {
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("compact").toString + "/t"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    ev.repartition(20).write.parquet(path)   // the streaming-sink trail shape
    val before = new java.io.File(path).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before == 20)
    val totalBytes = new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target half the table -> exactly 2 output files
    val nOut = Sinks.compact(spark, path, targetBytes = (totalBytes + 1) / 2)
    val after = new java.io.File(path).listFiles.count(_.getName.endsWith(".parquet"))
    assert(nOut == 2 && after == 2, s"expected 2 files, got $after")
    // content-preserving: same rows, same schema
    val back = spark.read.parquet(path)
    assert(back.schema == ev.schema)
    assert(ev.exceptAll(back).isEmpty && back.exceptAll(ev).isEmpty)
  }

  test("catalog registration exposes a parquet path to spark.sql") {
    Sources.registerTable(spark, "nation_view", "/root/testdata/sf0.001/nation.parquet")
    assert(spark.sql("select count(*) from nation_view").first().getLong(0) == 25)
  }

  test("progress monitor accumulates per-query totals via listener") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val monitor = new ProgressMonitor
    spark.streams.addListener(monitor)
    try {
      val mem = MemoryStream[String]
      val cp = Files.createTempDirectory("mon_cp").toString
      val out = Files.createTempDirectory("mon_out").toString
      val q = CdcIngest.ingest(
        CdcIngest.parseEnvelope(mem.toDF().select($"value".cast("binary").as("value"))),
        out, cp, Trigger.ProcessingTime(0))
      mem.addData((1 to 10).map(i =>
        s"""{"payload": {"after": {"id": $i, "id_employee": 1, "start_datetime": 1718000000000000, "sport_type": "Yoga", "activity_duration": 60, "distance": null, "comment": null}}}"""): _*)
      q.processAllAvailable()
      // listener events are async; poll for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (monitor.totals(q.id).inputRows < 10 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val t = monitor.totals(q.id)
      assert(t.inputRows == 10, s"listener saw $t")
      assert(t.batches >= 1)
      // reconciliation: sink count equals processed count (ref SaveDelta monitor)
      val (sunk, _) = CdcIngest.reconcile(spark, out, q)
      assert(sunk == 10)
      q.stop()
    } finally spark.streams.removeListener(monitor)
  }

  test("watermarked event-time windowed aggregation over the stream (§2.7 extension)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from win_agg").collect()
      assert(rows.map(_.getAs[Long]("cnt")).sum == 3)
      assert(rows.length == 2) // two 5-minute windows
    } finally q.stop()
  }

  test("Tables.load normalizes TIMESTAMP_NTZ parquet to TIMESTAMP in any session") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // The driver testdata stores timestamps with isAdjustedToUTC=false, which
    // Spark 4 infers as TIMESTAMP_NTZ unless the session disables
    // inferTimestampNTZ — that broke unix_micros in seven queries when the
    // testdata was regenerated (round 9). Guard both paths:
    // (1) graft sessions read them as TIMESTAMP straight off the scan;
    for (tbl <- Seq("events", "lineitem", "orders")) {
      val ts = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", tbl)
        .schema.fields.filter(f => f.dataType == TimestampType || f.dataType == TimestampNTZType)
      assert(ts.nonEmpty && ts.forall(_.dataType == TimestampType),
        s"$tbl timestamp columns must load as TIMESTAMP, got ${ts.mkString(",")}")
    }
    // (2) a user session that leaves NTZ inference on still gets TIMESTAMP
    // via the defensive cast in Tables.load.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val ev = graft.sources.Tables.events(s2, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // and unix_micros — the exact function that failed — resolves.
    assert(ev.selectExpr("unix_micros(ts) AS us").limit(1).count() == 1)
  }

  test("S4/S6/S12: JDBC write, full scan, and partitioned scan round-trip (Derby)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Embedded Derby ships on every Spark classpath (Hive metastore dep) —
    // the same jdbcTable/appendJdbc code paths the production PostgreSQL
    // contract declares, exercised against a real database in-JVM.
    val url = graft.sources.Sources.Derby.freshDbUrl()
    val driver = graft.sources.Sources.Derby.Driver
    try {
      val sample = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select($"event_id", $"user_id", $"event_type",
          $"value", $"ts".cast("timestamp").as("ts"))
      graft.sources.Sinks.appendJdbc(sample, url, "events_jdbc", "", "", driver)
      // S12 append semantics: a second batch adds, never overwrites
      graft.sources.Sinks.appendJdbc(sample.limit(10), url, "events_jdbc", "", "", driver)
      val full = graft.sources.Sources.jdbcTable(spark, url, "events_jdbc", "", "",
        None, driver)
      assert(full.count() == sample.count() + 10)
      // S4 partitioned parallel read: same rows, requested split count
      val bounds = sample.agg(min($"event_id"), max($"event_id")).first()
      val part = graft.sources.Sources.jdbcTable(spark, url, "events_jdbc", "", "",
        Some(("event_id", bounds.getLong(0), bounds.getLong(1), 4)), driver)
      assert(part.rdd.getNumPartitions == 4)
      assert(part.count() == full.count())
      val a = full.select($"event_id", $"user_id", $"event_type", $"value", $"ts")
      val b = part.select($"event_id", $"user_id", $"event_type", $"value", $"ts")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "partitioned read must return exactly the full-scan rows")
    } finally graft.sources.Sources.Derby.destroy(url)
    // destroy() must reclaim the db's temp directory, not just the engine
    val dbDir = java.nio.file.Paths.get(
      url.stripPrefix("jdbc:derby:").takeWhile(_ != ';')).getParent
    assert(!java.nio.file.Files.exists(dbDir),
      s"Derby temp dir must be deleted by destroy(): $dbDir")
  }
}
