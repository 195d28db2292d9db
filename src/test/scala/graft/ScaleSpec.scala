package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-mechanics checks: salting equivalence and bucketed co-located joins. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plain = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("sum"))
    val salted = Skew.saltedCountSum(orders, "o_custkey",
      $"o_totalprice".cast("decimal(18,2)"), $"o_orderkey", buckets = 8)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join equals plain inner join") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customers = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customers, "o_custkey")
      .select($"o_orderkey", $"c_name")
    val salted = Skew.saltedJoin(orders, customers, "o_custkey",
      $"o_orderkey", buckets = 4)
      .select($"o_orderkey", $"c_name")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("IVF corpus partitioned by centroid: a probe scans only its cluster's files") {
    import spark.implicits._
    // The 100 TB ANN layout the Similarity scaladoc argues for, demonstrated:
    // write (corpus ⋈ assignment) partitioned by centroid_id, then probe one
    // cluster and assert the scan PRUNES — partition filters reach the file
    // index and the other clusters' files are never opened.
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("ivf_layout").toString
    graft.operators.Similarity.writeAnnLayout(spark, sf, dir)
    val nClusters = graft.operators.Similarity.ivfAssign(spark, sf)
      .select($"centroid_id").distinct().count()
    val layout = spark.read.parquet(dir)
    // norms are precomputed at write time — the probe path must not redo them
    assert(layout.columns.contains("nrm"))
    val probe = layout.filter($"centroid_id" === 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the scan must read 1 of nClusters partitions, not scan-then-filter
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(1), s"probe read $scanned of $nClusters partitions")
    assert(nClusters > 1)
  }

  test("rebalanced: spreads a 1-row-group fact, leaves a many-row-group fact alone") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val dir = Files.createTempDirectory("rgguard").toString
    val df = (1 to 50000).toDF("x").coalesce(1)
    // one fat row group: must trigger the spread (row groups, not splits)
    df.write.mode("overwrite").parquet(s"$dir/one")
    val one = spark.read.parquet(s"$dir/one")
    val spreadOne = Materialize.rebalanced(one)
    assert(spreadOne.rdd.getNumPartitions == cores,
      s"1-row-group input must spread to $cores partitions")
    assert(spreadOne.count() == 50000)
    // many small row groups: enough decode units, must NOT pay a shuffle
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 16 * 1024)
    try {
      df.write.mode("overwrite").parquet(s"$dir/many")
      val many = spark.read.parquet(s"$dir/many")
      val kept = Materialize.rebalanced(many)
      assert(kept eq many, "many-row-group input must pass through untouched")
    } finally spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
    Materialize.releaseTransient(spark)
  }

  test("date-partitioned event layout: a day predicate prunes to that day's files") {
    import spark.implicits._
    // The standard time-series storage shape at 100 TB: events land
    // partitioned by day; any day-ranged query must prune at the file index
    // (PartitionFilters), not scan-then-filter.
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("datepart").toString
    val ev = graft.sources.Tables.events(spark, sf)
    ev.withColumn("d", to_date($"ts"))
      .write.partitionBy("d").mode("overwrite").parquet(s"$dir/events_by_day")
    val nDays = ev.select(to_date($"ts")).distinct().count()
    assert(nDays > 1)
    val day = ev.select(to_date($"ts").as("d")).groupBy($"d").count()
      .orderBy($"d").first().getDate(0)
    val probe = spark.read.parquet(s"$dir/events_by_day").filter($"d" === day)
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(1), s"probe read $scanned of $nDays day-partitions")
    assert(probe.count() == ev.filter(to_date($"ts") === day).count())
  }

  test("results are invariant to the shuffle-partition setting") {
    // the partitioning-independence claim behind "same answer on any
    // cluster size": rerun order-sensitive pipelines (hash aggregates,
    // LSH banding, window ranks) under a different partition count and
    // compare exactly
    val sf = "/root/testdata/sf0.001"
    val other = spark.newSession()
    other.conf.set("spark.sql.shuffle.partitions", "5")
    def same(f: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val a = f(spark, sf)
      val b = f(other, sf)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
    same(graft.operators.Dedup.dedupMinhashLsh)
    same(graft.operators.Dedup.dedupClusters)
    same(graft.operators.Skew.saltedAgg)
    same(graft.operators.Temporal.asofAttribution)
  }

  test("TempParquet materializer yields the same results as LocalCheckpoint") {
    // The churn-safe impl for real clusters: every Materialize.eager site
    // writes a durable parquet round-trip instead of executor-local blocks.
    // Exercise the heaviest consumers (LSH dedup = 3 sites incl. the
    // verify join; cluster resolution = per-round label materialization)
    // and require exact equality with the default impl.
    val sf = "/root/testdata/sf0.001"
    val base = graft.operators.Dedup.dedupMinhashLsh(spark, sf)
    val baseCc = graft.operators.Dedup.dedupClusters(spark, sf)
    Materialize.impl = Materialize.TempParquet(
      Files.createTempDirectory("graft_mat").toString)
    try {
      val alt = graft.operators.Dedup.dedupMinhashLsh(spark, sf)
      assert(base.exceptAll(alt).isEmpty && alt.exceptAll(base).isEmpty)
      val altCc = graft.operators.Dedup.dedupClusters(spark, sf)
      assert(baseCc.exceptAll(altCc).isEmpty && altCc.exceptAll(baseCc).isEmpty)
    } finally Materialize.impl = Materialize.LocalCheckpoint
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the other half of the skew story: Skew.scala salts deterministically
    // ahead of time; AQE re-plans at runtime. Build a join where one key
    // owns ~all left rows, force SMJ, shrink the skew thresholds to toy
    // scale, and assert the executed adaptive plan marked the reader skewed.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val left = s2.range(0, 60000)
      .selectExpr("CASE WHEN id < 59000 THEN 1 ELSE id END AS k", "id AS v")
    val right = s2.range(0, 50).selectExpr("id + 1 AS k", "id AS w")
    val j = left.join(right, "k")
    // collect() drives THIS Dataset's queryExecution — count() would build
    // a separate one and the adaptive plan under test would never finalize
    assert(j.collect().length == 59000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
  }

  test("pinned trained-centroid cache survives a transient-block release") {
    // the exact Bench sequence: one query trains + pins the IVF centroids,
    // releaseTransient frees everything else between queries, and a LATER
    // query must still read the lineage-truncated cache — if the pin is
    // lost, the cached DataFrame's checkpoint blocks are gone and this
    // throws instead of answering.
    val sf = "/root/testdata/sf0.001"
    val before = graft.operators.Similarity.ivfAssign(spark, sf).count()
    Materialize.releaseTransient(spark)
    val after = graft.operators.Similarity.knnIvf(spark, sf).count()
    assert(before > 0 && after > 0)
  }

  test("bucketed tables join without a shuffle (co-located 100 TB join shape)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("buckets")
    val a = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    a.write.option("path", s"$dir/t_orders").mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("t_orders")
    b.withColumnRenamed("c_custkey", "o_custkey")
      .write.option("path", s"$dir/t_cust").mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("t_cust")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_orders").join(spark.table("t_cust"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == a.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_orders")
      spark.sql("DROP TABLE IF EXISTS t_cust")
    }
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    // The star-join mechanism that makes 100 TB dimension-filtered scans
    // affordable: the fact is partitioned on the join key, the dimension
    // filter is only known at runtime, and Spark injects a dynamic-pruning
    // subquery into the fact scan so non-matching partitions are never read.
    val dir = Files.createTempDirectory("dpp").toString
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    ev.withColumn("d", to_date($"ts"))
      .write.partitionBy("d").mode("overwrite").parquet(s"$dir/fact")
    val nDays = ev.select(to_date($"ts")).distinct().count()
    // runtime-only dim: 3 selected days with an attribute filter
    val dim = ev.select(to_date($"ts").as("d")).distinct().orderBy($"d").limit(3)
      .withColumn("tag", lit("keep"))
    dim.write.mode("overwrite").parquet(s"$dir/dim")
    val dppKey = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val saved = spark.conf.getOption(dppKey)
    spark.conf.set(dppKey, "true")
    // DPP needs either a broadcast reuse or a worthwhile estimated benefit;
    // broadcast stays on (default) so the pruning subquery reuses it
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dimR = spark.read.parquet(s"$dir/dim").filter($"tag" === "keep")
      val joined = fact.join(dimR, "d")
      // collect() drives THIS Dataset's queryExecution (count() would build
      // a separate one and the adaptive plan would never finalize)
      assert(joined.collect().nonEmpty)
      val top = joined.queryExecution.executedPlan
      assert(top.toString.contains("dynamicpruning"),
        s"no dynamic pruning subquery injected:\n$top")
      // descend through AQE query stages — scans hide inside QueryStageExec
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case f: FileSourceScanExec => Seq(f)
        case q: QueryStageExec => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case other => other.children.flatMap(scans)
      }
      val factScan = scans(top)
        .find(_.metadata.get("Location").exists(_.contains("fact"))).get
      // static file index lists every partition; the runtime metric counts
      // only the ones the dynamic filter let through
      assert(factScan.selectedPartitions.partitionCount == nDays)
      val scanned = factScan.metrics.get("numPartitions").map(_.value)
      assert(scanned.contains(3L),
        s"fact scan read $scanned of $nDays partitions (want 3)")
    } finally {
      saved.fold(spark.conf.unset(dppKey))(v => spark.conf.set(dppKey, v))
    }
  }

  test("z-order layout: a 2-D box predicate skips row groups in BOTH dimensions") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    // Write the same orders keyed by (custkey, epoch-day) twice: sorted by
    // the Morton z-value vs sorted 1-D by custkey only. Then read the real
    // parquet footers and count row groups whose [min,max] box intersects a
    // 2-D range predicate — the z layout must give BOTH columns tight
    // bounds, the 1-D layout leaves the date dimension unsorted so ~every
    // row group matches the date half of the box.
    val dir = Files.createTempDirectory("zorder").toString
    val keys = graft.operators.ZOrder.zorderKeys(spark, "/root/testdata/sf0.01")
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 32 * 1024)
    try {
      keys.sort($"zvalue").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/z")
      keys.sort($"xk").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/linear")
    } finally spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")

    // an eighth-span slice of each dimension (the other dimension open)
    val r = keys.agg(min($"xk"), max($"xk"), min($"yk"), max($"yk")).first()
    val (xMin, xMax, yMin, yMax) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (xLo, xHi) = (xMin, xMin + (xMax - xMin) / 8)
    val (yLo, yHi) = (yMin, yMin + (yMax - yMin) / 8)
    def matchFraction(sub: String, col: String, lo: Long, hi: Long): Double = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        assert(blocks.size >= 8, s"$sub: need many row groups, got ${blocks.size}")
        val hit = blocks.count { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == col).get.getStatistics
          val (mn, mx) = (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          mx >= lo && mn <= hi
        }
        hit.toDouble / blocks.size
      } finally reader.close()
    }
    // 1-D custkey sort: perfect on its own column, helpless on the date —
    // essentially every row group spans the full date range
    assert(matchFraction("linear", "yk", yLo, yHi) >= 0.9,
      "1-D layout should fail to prune the unsorted dimension")
    // z-order: BOTH single-dimension slices skip the majority of row groups
    val zX = matchFraction("z", "xk", xLo, xHi)
    val zY = matchFraction("z", "yk", yLo, yHi)
    assert(zX <= 0.6, s"z layout matched $zX of row groups on the custkey slice")
    assert(zY <= 0.6, s"z layout matched $zY of row groups on the date slice")
  }

  test("bucketed SCD1 merge: snapshot full-outer delta joins without a shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // The 100 TB merge shape: the current-state snapshot is STORED bucketed
    // by the merge key, the delta batch lands bucketed the same way, and
    // the MERGE full-outer join is then exchange-free — only the snapshot
    // write pays a shuffle, once, not every merge.
    val dir = Files.createTempDirectory("scd1_buckets")
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    def latest(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"value", $"ts")
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    latest(ev.filter($"ts" < cutoff))
      .write.option("path", s"$dir/t_base").mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("t_base")
    latest(ev.filter($"ts" >= cutoff))
      .write.option("path", s"$dir/t_delta").mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("t_delta")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = spark.table("t_base")
        .select($"user_id", $"value".as("base_value"), $"ts".as("base_ts"))
      val delta = spark.table("t_delta")
        .select($"user_id", $"value".as("delta_value"), $"ts".as("delta_ts"))
      val merged = base.join(delta, Seq("user_id"), "full_outer")
        .select($"user_id", coalesce($"delta_value", $"base_value").as("value"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed merge still shuffles:\n$plan")
      assert(merged.count() ==
        ev.select($"user_id").distinct().count(),
        "merge output covers every key exactly once")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_base")
      spark.sql("DROP TABLE IF EXISTS t_delta")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    import spark.implicits._
    // Row-level runtime filtering: when a selective dimension filter exists,
    // Spark injects a bloom filter built from the build side into the probe
    // side's scan — at 100 TB this skips most fact rows before the shuffle.
    // Thresholds are tuned down because test data is tiny; on a cluster the
    // defaults (10 MB creation / 10 GB application) gate it to real facts.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val sel = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = li.join(sel, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
