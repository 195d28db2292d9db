package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Semantics of the round-5 analytic additions: window-function breadth,
  * grouping sets, exact-moment correlation statistics, fixed-bin histogram.
  * (Cross-engine value equality is the oracle gate's job; these pin the
  * operator semantics themselves.)
  */
class WindowStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("window funcs: ranks are per-user, ratios in [0,1], lag/lead consistent") {
    import spark.implicits._
    val df = Relational.windowFuncs(spark, sf).cache()
    val n = df.count()
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
    // percent_rank/cume_dist live in [0,1]; cume_dist is strictly positive
    assert(df.filter($"value_prank" < 0 || $"value_prank" > 1).count() == 0)
    assert(df.filter($"value_cdist" <= 0 || $"value_cdist" > 1).count() == 0)
    // dense_rank starts at 1 per user and never exceeds the user's row count
    val perUser = df.groupBy($"user_id")
      .agg(min($"value_drank").as("mn"), max($"value_drank").as("mx"),
        count(lit(1)).as("cnt"))
    assert(perUser.filter($"mn" =!= 1 || $"mx" > $"cnt").count() == 0)
    // every user's first event has no lag value, and exactly one such row
    val firsts = df.filter($"prev_value".isNull).groupBy($"user_id").count()
    assert(firsts.filter($"count" =!= 1).count() == 0)
    df.unpersist()
  }

  test("grouping sets: exactly the requested subtotal combinations, no grand total") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val gs = Relational.groupingSetsSummary(spark, sf).cache()
    val nBoth = orders.select($"o_orderstatus", $"o_orderpriority").distinct().count()
    val nStatus = orders.select($"o_orderstatus").distinct().count()
    val nPrio = orders.select($"o_orderpriority").distinct().count()
    assert(gs.count() == nBoth + nStatus + nPrio)
    // no grand-total row (both grouping columns NULL was not requested)
    assert(gs.filter($"o_orderstatus".isNull && $"o_orderpriority".isNull).count() == 0)
    // the (status) subtotal equals the sum over its (status, priority) cells
    val cells = gs.filter($"o_orderstatus".isNotNull && $"o_orderpriority".isNotNull)
      .groupBy($"o_orderstatus").agg(sum($"cnt").as("cell_sum"))
    val subs = gs.filter($"o_orderstatus".isNotNull && $"o_orderpriority".isNull)
      .select($"o_orderstatus", $"cnt")
    assert(subs.join(cells, "o_orderstatus").filter($"cnt" =!= $"cell_sum").count() == 0)
    gs.unpersist()
  }

  test("corr stats: matches Spark's native corr/stddev to double precision") {
    import spark.implicits._
    val got = Relational.corrStats(spark, sf)
      .orderBy($"l_returnflag").collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val want = li.groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        stddev_pop($"l_quantity").as("sdq"))
      .orderBy($"l_returnflag").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(math.abs(g.getAs[Double]("corr_qty_price") - w.getAs[Double]("c")) < 1e-9)
      assert(math.abs(g.getAs[Double]("stddev_pop_qty") - w.getAs[Double]("sdq")) < 1e-9)
      assert(math.abs(g.getAs[Double]("corr_qty_price")) <= 1.0)
    }
  }

  test("histogram: buckets cover all orders and stay in [0, 19]") {
    import spark.implicits._
    val h = Relational.histogram(spark, sf).cache()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(h.agg(sum($"n_orders")).first().getLong(0) == orders.count())
    assert(h.filter($"bucket" < 0 || $"bucket" > 19).count() == 0)
    // bucket boundaries: every order in bucket b has price in [30000b, 30000(b+1))
    // except the capped overflow bucket 19
    val b0max = orders.filter($"o_totalprice" < 30000.0).count()
    assert(h.filter($"bucket" === 0).select($"n_orders").first().getLong(0) == b0max)
    h.unpersist()
  }

  test("winsorize: ~5% clipped each side and the clipped sum is within bounds") {
    import spark.implicits._
    val w = Relational.winsorize(spark, sf).cache()
    w.collect().foreach { r =>
      val n = r.getAs[Long]("n")
      val lowFrac = r.getAs[Long]("n_clipped_low").toDouble / n
      val highFrac = r.getAs[Long]("n_clipped_high").toDouble / n
      // exact percentiles put at most ~5% strictly outside each bound
      assert(lowFrac <= 0.06, s"low clip fraction $lowFrac")
      assert(highFrac <= 0.06, s"high clip fraction $highFrac")
      val lo = r.getAs[Long]("lo_cents").toDouble / 100.0
      val hi = r.getAs[Long]("hi_cents").toDouble / 100.0
      val sumW = r.getAs[Double]("sum_winsorized")
      assert(sumW >= lo * n - 0.01 * n && sumW <= hi * n + 0.01 * n,
        s"winsorized sum $sumW outside [$lo, $hi] x $n")
    }
    w.unpersist()
  }
}
