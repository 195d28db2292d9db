package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RelationalSpec extends AnyFunSuite {
  import graft.operators.Relational
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and every oracle key exists in queries") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("flagship: zero-order customers get commute_prime and false threshold, not NULL") {
    import spark.implicits._
    val df = Relational.flagshipBonus(spark, sf).cache()
    val noOrders = df.filter($"count_activity".isNull)
    // P8 semantics: NULL count (left-join miss) must land in the false branch
    assert(noOrders.filter($"is_valid_activities" =!= false).count() == 0)
    // P7: prime is never NULL
    assert(df.filter($"commute_prime".isNull).count() == 0)
    df.unpersist()
  }

  test("masked view nulls name and segment but keeps keys") {
    import spark.implicits._
    val m = Relational.maskedView(spark, sf)
    assert(m.filter($"c_name".isNotNull || $"c_mktsegment".isNotNull).count() == 0)
    assert(m.filter($"c_custkey".isNull).count() == 0)
  }

  test("validation error messages appear only on invalid rows") {
    import spark.implicits._
    val v = Relational.validateThreshold(spark, sf).cache()
    assert(v.filter($"is_valid" && $"error_message".isNotNull).count() == 0)
    assert(v.filter(!$"is_valid" && $"error_message".isNull).count() == 0)
    v.unpersist()
  }

  test("expectations find no violations in clean testdata") {
    val row = Relational.expectations(spark, sf).collect()(0)
    assert(row.getAs[Long]("null_ts") == 0L)
    assert(row.getAs[Long]("null_event_type") == 0L)
  }

  test("scd2: intervals chain gaplessly and each key has exactly one current row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val h = Relational.scd2History(spark, sf).cache()
    // exactly one open (is_current) interval per business key
    val open = h.filter($"is_current").groupBy($"user_id").count()
    assert(open.filter($"count" =!= 1).count() == 0)
    // every closed interval's valid_to equals the next interval's valid_from
    val next = h.select($"user_id".as("u2"), $"valid_from".as("next_from"))
    val gaps = h.filter(!$"is_current")
      .join(next, $"user_id" === $"u2" && $"valid_to" === $"next_from", "left_anti")
      .count()
    assert(gaps == 0, "closed intervals must chain onto a successor")
    h.unpersist()
  }

  test("order streaks match a driver-side scan of each customer's day set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Relational.orderStreaks(spark, sf).cache()
    // global consistency
    assert(got.filter($"longest_streak" > $"n_active_days").count() == 0)
    assert(got.filter($"n_islands" < 1).count() == 0)
    // exact recomputation, driver-side, for every customer at this sf
    val days = graft.sources.Tables.orders(spark, sf)
      .selectExpr("o_custkey", "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS d")
      .distinct().collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expect = days.map { case (c, ds) =>
      var streaks = List(1)
      for (i <- 1 until ds.length)
        streaks =
          if (ds(i) == ds(i - 1) + 1) (streaks.head + 1) :: streaks.tail
          else 1 :: streaks
      c -> (ds.length.toLong, streaks.max.toLong, streaks.length.toLong)
    }
    val rows = got.collect()
    assert(rows.length == expect.size, "every customer must keep a row")
    rows.foreach { r =>
      val (n, longest, islands) = expect(r.getLong(0))
      assert(r.getAs[Long]("n_active_days") == n)
      assert(r.getAs[Long]("longest_streak") == longest)
      assert(r.getAs[Long]("n_islands") == islands)
    }
    got.unpersist()
  }

  test("scd1 merge equals the latest-overall state per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val merged = Relational.scd1Merge(spark, sf)
    // the merge of base+delta must equal computing latest over ALL events
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val latestAll = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"value", $"ts".as("last_ts"))
    val m = merged.select($"user_id", $"value", $"last_ts")
    assert(m.exceptAll(latestAll).isEmpty && latestAll.exceptAll(m).isEmpty,
      "merge(base, delta) must equal latest-wins over the full history")
    // change typing is consistent with the cutoff
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    assert(merged.filter($"change_type" === "unchanged" && $"last_ts" >= cutoff).count() == 0)
    assert(merged.filter($"change_type" =!= "unchanged" && $"last_ts" < cutoff).count() == 0)
  }

  test("partial re-aggregation merges to the same result as direct aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val merged = Relational.reaggMonth(spark, sf)
    val direct = graft.sources.Tables.orders(spark, sf)
      .select($"o_custkey", trunc(to_date($"o_orderdate"), "month").as("month"),
        $"o_totalprice")
      .groupBy($"o_custkey", $"month")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merging daily partials must equal aggregating raw rows")
  }

  test("topk returns at most 5 deterministic groups") {
    val rows = Relational.topkGroup(spark, sf).collect()
    assert(rows.length <= 5)
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sorted.reverse))
  }
  test("RFM segments conserve customers with quintile buckets in range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val seg = graft.operators.Relational.rfmSegments(spark, sf).cache()
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey").distinct().count()
    assert(seg.agg(sum($"n_customers")).head.getLong(0) == nCust,
      "every purchasing customer lands in exactly one segment")
    Seq("r_bucket", "f_bucket", "m_bucket").foreach { b =>
      assert(seg.filter(col(b) < 1 || col(b) > 5).count() == 0, s"$b out of range")
    }
    seg.unpersist()
  }
  test("HLL re-agg: unioned daily sketches equal the direct monthly sketch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "cast(ts as date) AS d")
    // mergeability: estimate(union(daily sketches)) == estimate(direct sketch)
    val viaDaily = ev.groupBy($"event_type", $"d")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val direct = ev
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
    assert(viaDaily.except(direct).count() == 0 &&
      direct.except(viaDaily).count() == 0,
      "sketch union must be lossless vs direct aggregation")
    // and the report's bound holds everywhere
    val r = graft.operators.Relational.hllReagg(spark, sf)
    assert(r.filter(!col("hll_within_bounds")).count() == 0)
  }
  test("HLL daily sketches survive the parquet round-trip byte-exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stored = graft.operators.Relational.hllDailyAtRest(spark, sf)
    // the artifact is a real file-backed relation with a binary sketch column
    assert(stored.inputFiles.nonEmpty && stored.inputFiles.forall(_.endsWith(".parquet")),
      "daily sketches must be read back from parquet, not served from lineage")
    assert(stored.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // union over the STORED bytes == union over in-session sketches
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "cast(ts as date) AS d")
    val fresh = ev.groupBy($"event_type", $"d")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val viaStore = stored.groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    assert(viaStore.except(fresh).count() == 0 && fresh.except(viaStore).count() == 0,
      "stored sketch bytes must union to the same estimates as in-session sketches")
  }
}
