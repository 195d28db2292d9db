package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("approximate aggregates land within their documented error bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relational.approxStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_bounds"),
        s"${r.getAs[String]("event_type")}: HLL estimate outside 3·rsd")
      assert(r.getAs[Boolean]("p50_within_bounds"),
        s"${r.getAs[String]("event_type")}: approx p50 outside rank bound")
    }
    // the emitted exacts really are exact: independent recomputation
    val expect = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("e"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (e, c) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("exact_users") == e && r.getAs[Long]("cnt") == c)
    }
    // the sketch itself stays inside its tighter advertised rsd at this sf
    val tight = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("a"), countDistinct($"user_id").as("e"))
      .collect()
    tight.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
    }
  }

  test("KLL re-agg: merged stored daily sketches land on the exact rank") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relational.kllReagg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_bounds") && r.getAs[Boolean]("p95_within_bounds"),
        s"${r.getAs[String]("event_type")}/${r.getAs[String]("month")}: " +
          "merged-sketch quantile outside the rank bound")
      assert(r.getAs[Long]("n_days") > 1,
        "re-agg must merge MULTIPLE stored daily sketches, or it proves nothing")
    }
    // the daily artifact really is at rest: its lineage starts at parquet files
    val daily = graft.operators.Relational.kllDailyAtRest(spark, sf)
    assert(daily.inputFiles.nonEmpty && daily.inputFiles.forall(_.contains("graft_kll_daily")),
      "daily KLL sketches must be read back from the stored parquet artifact")
  }

  test("theta sketches: union + intersection are exact below the nominal threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relational.thetaIntersect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_within_bounds"))
      assert(r.getAs[Long]("n_days_purchase") > 1 && r.getAs[Long]("n_days_error") > 1,
        "monthly union must merge multiple stored daily sketches")
    }
    // below nominal entries (~150 users << 4096) theta is EXACT, so the
    // intersection estimate must equal the exact overlap bit-for-bit
    val est = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id")
      .filter($"event_type".isin("purchase", "error"))
      .groupBy($"event_type").agg(expr("theta_sketch_agg(user_id)").as("sk"))
      .agg(expr("theta_sketch_estimate(theta_intersection_agg(sk))")).first().get(0)
    val exact = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "error"))
      .groupBy($"user_id").agg(countDistinct($"event_type").as("nt"))
      .filter($"nt" === 2).count()
    assert(math.round(est.toString.toDouble) == exact,
      s"theta intersection $est vs exact $exact in exact mode")
  }

  test("every sketch family's daily artifact is a parquet relation at rest") {
    // the re-agg contract: rollups consume stored sketch BYTES, never raw
    // rows — each family's daily relation must have file-backed lineage
    val sf = "/root/testdata/sf0.001"
    val arts = Seq(
      "graft_kll_daily"   -> graft.operators.Relational.kllDailyAtRest(spark, sf),
      "graft_theta_daily" -> graft.operators.Relational.thetaDailyAtRest(spark, sf),
      "graft_freq_daily"  -> graft.operators.Relational.freqDailyAtRest(spark, sf))
    arts.foreach { case (tag, df) =>
      assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains(tag)),
        s"$tag must be read back from its stored parquet artifact")
      assert(df.schema.fields.exists(f =>
        f.name == "sk" && f.dataType == org.apache.spark.sql.types.BinaryType),
        s"$tag must carry a BINARY sketch column")
    }
  }

  test("frequent-items sketches: purge-free merge of stored dailies is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relational.heavyHitters(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("max_error") == 0L,
        "test-scale sketches must be purge-free (exact estimates)")
      assert(r.getAs[Long]("est_n") > r.getAs[Long]("threshold"))
    }
    // the daily artifact is at rest, and the merged estimates equal exact
    // per-user counts computed independently
    val daily = graft.operators.Relational.freqDailyAtRest(spark, sf)
    assert(daily.inputFiles.nonEmpty && daily.inputFiles.forall(_.contains("graft_freq_daily")))
    val est = daily.groupBy($"event_type")
      .agg(expr("freq_merge_agg(sk)").as("msk"))
      .selectExpr("event_type", "explode(freq_items(msk, cast(0 as bigint))) AS it")
      .selectExpr("event_type", "it.item AS user_id", "it.est AS n")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(est == exact,
      "merged purge-free frequent-items sketch must reproduce every exact count")
    // partial-agg plumbing: one big sketch == union of per-half sketches
    val ev = graft.sources.Tables.events(spark, sf).selectExpr("user_id")
    val whole = ev.agg(expr("freq_sketch_agg(user_id)")).first().getAs[Array[Byte]](0)
    val halves = ev.withColumn("h", col("user_id") % 2)
      .groupBy($"h").agg(expr("freq_sketch_agg(user_id)").as("sk"))
      .agg(expr("freq_merge_agg(sk)")).first().getAs[Array[Byte]](0)
    val a = graft.functions.FreqSketch.fromBytes(whole)
    val b = graft.functions.FreqSketch.fromBytes(halves)
    val users = exact.keys.map(_._2).toSeq.distinct
    users.foreach { u =>
      assert(a.getEstimate(u) == b.getEstimate(u), s"user $u: split-merge diverges")
    }
  }
}
