package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the decision-support (TPC-H-shape) suite — the
  * cross-engine oracle pins exact values; these pin the *invariants* that
  * make each query meaningful, at sf0.001. */
class DecisionSupportSpec extends AnyFunSuite {
  import graft.operators.DecisionSupport
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("Q7 volume shipping reports only the two requested nation orderings") {
    import spark.implicits._
    // sf0.001 has too few lineitems surviving the two-nation filter — use
    // sf0.01 so the assertion covers a non-empty result
    val rows = DecisionSupport.volumeShipping(spark, "/root/testdata/sf0.01")
      .select($"supp_nation", $"cust_nation").distinct().collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (s, c) = (r.getString(0), r.getString(1))
      (s == "NATION_1" && c == "NATION_2") || (s == "NATION_2" && c == "NATION_1")
    })
  }

  test("Q8 market share is a proper fraction per year") {
    import spark.implicits._
    val shares = DecisionSupport.marketShare(spark, sf).collect()
    assert(shares.nonEmpty)
    shares.foreach { r =>
      val v = r.getAs[Double]("mkt_share")
      assert(v >= 0.0 && v <= 1.0, s"share $v out of range")
    }
  }

  test("Q13 buckets partition the customer population exactly") {
    import spark.implicits._
    val dist = DecisionSupport.orderCountDist(spark, sf)
    val total = dist.agg(sum($"custdist")).first().getLong(0)
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(total == nCust, s"histogram covers $total of $nCust customers")
  }

  test("Q15 returns exactly the argmax supplier(s) of the quarter") {
    import spark.implicits._
    val top = DecisionSupport.topSupplier(spark, sf).collect()
    assert(top.nonEmpty)
    val revs = top.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all returned suppliers must share the max revenue")
  }

  test("Q18 only surfaces orders whose lineitem quantity clears the threshold") {
    import spark.implicits._
    val big = DecisionSupport.largeOrders(spark, sf)
    assert(big.filter($"sum_qty" <= 300.0).count() == 0)
    // each surviving order appears exactly once
    assert(big.select($"o_orderkey").distinct().count() == big.count())
  }

  test("Q4 counts each late order once, matching a direct distinct recomputation") {
    import spark.implicits._
    import graft.sources.Tables
    val viaQuery = DecisionSupport.latePriorityCount(spark, sf)
      .agg(sum($"order_count")).first().getLong(0)
    // independent formulation: inner join + distinct orders, not a semi join
    val direct = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")) &&
        $"o_orderdate" < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"o_orderkey").distinct().count()
    assert(viaQuery == direct, s"semi-join counted $viaQuery, distinct join $direct")
  }

  test("Q12 high+low line counts partition the late lines exactly") {
    import spark.implicits._
    import graft.sources.Tables
    val byFlag = DecisionSupport.lateByFlag(spark, sf)
    val total = byFlag.agg(sum($"high_line_count" + $"low_line_count")).first().getLong(0)
    val direct = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .count()
    assert(total == direct, s"conditional counts cover $total of $direct late lines")
  }

  test("Q21 blames exactly the unique latest supplier of multi-supplier orders") {
    import spark.implicits._
    import graft.sources.Tables
    // independent join-based formulation (no windows)
    val per = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey", $"l_suppkey").agg(max($"l_shipdate").as("sd"))
    val ord = per.groupBy($"l_orderkey")
      .agg(max($"sd").as("mx"), count(lit(1)).as("nsupp"))
    val achievers = per.join(ord, "l_orderkey").filter($"sd" === $"mx")
    val uniqueBlame = achievers
      .groupBy($"l_orderkey").agg(count(lit(1)).as("nmax"),
        first($"l_suppkey").as("supp"), first($"nsupp").as("ns"))
      .filter($"nmax" === 1 && $"ns" >= 2)
    val expectTop = uniqueBlame
      .join(Tables.supplier(spark, sf), $"supp" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name".asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = DecisionSupport.latestShipper(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.sameElements(expectTop),
      s"window formulation ${got.toSeq} != join formulation ${expectTop.toSeq}")
  }

  test("Q2 min-cost supplier: planner decorrelates the scalar subquery") {
    import spark.implicits._
    // sf0.01: sf0.001's EUROPE supplier pool is too thin to be interesting
    val df = DecisionSupport.minCostSupplier(spark, "/root/testdata/sf0.01")
    val opt = df.queryExecution.optimizedPlan.toString
    // a CORRELATED scalar subquery prints with outer refs in its bracket —
    // `scalar-subquery#n [p_partkey#m]`; the empty-bracket form is Spark's
    // own InjectRuntimeFilter bloom probe, which is fine (and wanted)
    assert(!"scalar-subquery#\\d+ \\[[^\\]]".r.findFirstIn(opt).isDefined,
      "correlated min-cost subquery must be decorrelated into an aggregate + join")
    assert(!opt.contains("lineitem"),
      "offers relation must be materialized once — no lineitem scan may survive " +
        "downstream of the materialization (both consumers read the pinned leaf)")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every surviving row carries ITS part's European minimum cost: rerun
    // the min independently and compare
    val ps = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("c"))
    val eu = graft.sources.Tables.supplier(spark, "/root/testdata/sf0.01")
      .join(graft.sources.Tables.nation(spark, "/root/testdata/sf0.01"),
        $"s_nationkey" === $"n_nationkey")
      .join(graft.sources.Tables.region(spark, "/root/testdata/sf0.01"),
        $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "EUROPE").select($"s_suppkey")
    val minEu = ps.join(eu, $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey").agg(min($"c").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (pk, c) = (r.getAs[Long]("p_partkey"), r.getAs[Double]("ps_cost"))
      assert(minEu(pk) == c, s"part $pk: cost $c is not the European min ${minEu(pk)}")
    }
  }

  test("Q20 volume suppliers: both IN predicates become LeftSemi joins") {
    val df = DecisionSupport.volumeSuppliers(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    val semis = "LeftSemi".r.findAllIn(opt).size
    assert(semis >= 2, s"expected the doubly-nested IN to plan as two LeftSemi joins, got $semis:\n$opt")
    assert(df.collect().nonEmpty)
  }

  test("Q11 important parts: threshold reuses the materialized value relation") {
    import spark.implicits._
    val df = DecisionSupport.importantParts(spark, sf)
    // the per-part value relation is checkpointed once; the final plan must
    // read it (no second lineitem scan for the global threshold)
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("lineitem"),
      s"threshold pass must reuse the materialized value relation:\n$planStr")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("val"))
    // above-mean semantics: recompute the mean over the full relation
    val all = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(graft.sources.Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .join(graft.sources.Tables.region(spark, sf), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"l_partkey").agg(sum($"l_extendedprice".cast("decimal(18,2)")).as("v"))
    val (tot, n) = {
      val r = all.agg(sum($"v").cast("double"), count(lit(1))).first()
      (r.getDouble(0), r.getLong(1))
    }
    val mean = tot / n
    assert(vals.forall(_ > mean), "every surviving part must exceed the mean value")
    assert(all.filter($"v".cast("double") > mean).count() == rows.length,
      "no above-mean part may be dropped")
  }

  test("Q9 nation profit: rollup covers exactly the LIKE-matched lines") {
    import spark.implicits._
    val df = DecisionSupport.nationProfit(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // group count = distinct (supplier nation, order year) over bolt lines
    val expect = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf).filter($"p_name".like("%bolt%")),
        $"l_partkey" === $"p_partkey")
      .join(graft.sources.Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(graft.sources.Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey", year($"o_orderdate").as("y"))
      .distinct().count()
    assert(rows.length == expect, s"${rows.length} groups vs $expect (nation,year) pairs")
  }

  test("Q22 dormant accounts all exceed the mean positive balance") {
    import spark.implicits._
    import graft.sources.Tables
    val cust = Tables.customer(spark, sf)
    val mean = cust.filter($"c_acctbal" > 0)
      .agg((sum($"c_acctbal".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("a"))
      .first().getDouble(0)
    // recompute the population the query claims to summarize
    val viaQuery = DecisionSupport.dormantAccounts(spark, sf)
      .agg(sum($"numcust")).first().getLong(0)
    val direct = cust.filter($"c_acctbal" > mean)
      .join(Tables.orders(spark, sf).filter($"o_orderstatus" === "P")
        .select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_anti")
      .count()
    assert(viaQuery == direct)
  }
}
