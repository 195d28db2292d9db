package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Decision-support query suite — the classic TPC-H shapes expressible over
  * the driver's star schema (the reference serves exactly this class of
  * analytics through Trino/Superset; README.md:131-170). Each query is the
  * standard benchmark plan adapted to the columns the testdata carries, and
  * exercises a distinct optimizer/scale shape:
  *
  *   - Q6  forecast revenue      — pure scan + predicate pushdown, no join
  *   - Q7  volume shipping       — two dim lookups on one fact row (supplier
  *                                 AND customer nation), disjunctive pair filter
  *   - Q8  market share          — 7-way join, conditional share-of-total
  *   - Q13 order-count histogram — left join preserving zero-count keys,
  *                                 double aggregation
  *   - Q14 promo share           — join + conditional aggregate ratio
  *   - Q15 top supplier          — aggregate + scalar-subquery max (argmax)
  *   - Q17 small-quantity avg    — correlated scalar subquery, decorrelated
  *                                 into a per-key aggregate join
  *   - Q18 large orders          — HAVING subquery as a semi-join relation
  *   - Q19 disjunctive revenue   — OR-of-ANDs predicate spanning both join sides
  *   - Q22 dormant accounts      — scalar-subquery threshold + anti-join
  *   - Q4  late-order priorities — EXISTS as a LEFT SEMI join with a
  *                                 mixed equi + non-equi condition
  *   - Q12 lateness by flag      — fact-to-fact join + conditional two-way counts
  *   - Q21 latest shipper        — double-EXISTS decorrelated into windows
  *                                 over one partitioning
  *   - Q2  min-cost supplier     — correlated scalar subquery as literal SQL,
  *                                 decorrelated by the planner
  *   - Q9  nation profit         — LIKE-filtered multi-join rollup, twin
  *                                 exact decimal sums
  *   - Q11 important parts       — HAVING against a global scalar threshold,
  *                                 materialize-once + broadcast scalar
  *   - Q20 volume suppliers      — doubly-nested IN as literal SQL → two
  *                                 LeftSemi joins
  *
  * Determinism: every money aggregate is DECIMAL-accumulated and cast to
  * DOUBLE after (repo rule 1); ratios are single IEEE divisions of exact
  * values with identical formula text in both engines.
  */
object DecisionSupport {

  private def D(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(s"decimal($p,$s)")
  private def ts(s: String): Column =
    lit(java.sql.Timestamp.valueOf(s))
  private val one = lit(new java.math.BigDecimal(1))
  private def revD(price: Column, disc: Column): Column =
    D(price) * (one - D(disc, 8))

  // ---------------------------------------------------------------------------
  // Q6: forecast-revenue — the pushdown benchmark. No join at all: the three
  // predicates and the two projected columns must reach the parquet scan
  // (PushedFilters + pruned ReadSchema), then a scalar decimal aggregate.
  // At 100 TB this is the query where scan pruning IS the runtime.
  // ---------------------------------------------------------------------------
  def forecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") &&
        $"l_shipdate" < ts("1998-01-01 00:00:00") &&
        $"l_discount".between(lit(0.05), lit(0.07)) &&
        $"l_quantity" < 24)
      .agg(sum(D($"l_extendedprice") * D($"l_discount", 8))
        .cast("double").as("revenue"))
  }
  val forecastRevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE) AND l_quantity < 24
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q7: volume shipping between two nations. Each lineitem resolves BOTH its
  // supplier's and its customer's nation; only the two (supp, cust) nation
  // orderings survive. Both lookup sides are pre-pruned to the two nations
  // BEFORE their joins (the disjunction implies membership on each side), so
  // the fact joins carry 2/25ths of the dimension rows; the pair filter runs
  // post-join. One fact-fact shuffle (lineitem ⋈ orders on orderkey); the
  // supplier and pruned-customer maps join without hints (AQE broadcasts
  // them while they fit; they scale with rows, so a forced hint would be
  // wrong at 100 TB).
  // ---------------------------------------------------------------------------
  private val Q7A = "NATION_1"
  private val Q7B = "NATION_2"
  def volumeShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Seq(Q7A, Q7B)
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .filter($"n_name".isin(nations: _*))
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .filter($"n_name".isin(nations: _*))
      .select($"c_custkey", $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        revD($"l_extendedprice", $"l_discount").as("revd"))
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      // no broadcast hints on supp/cust: they scale with the row count
      // (unlike nation/region) — AQE broadcasts them while they fit and
      // falls back to shuffled joins at corpus scale
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === Q7A && $"cust_nation" === Q7B) ||
        ($"supp_nation" === Q7B && $"cust_nation" === Q7A))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("int").as("l_year"))
      .agg(sum($"revd").cast("double").as("revenue"))
  }
  val volumeShippingSql: String =
    s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, CAST(year(l_shipdate) AS INT) AS l_year,
       |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey JOIN nation ns ON s_nationkey = ns.n_nationkey
       |JOIN nation nc ON c_nationkey = nc.n_nationkey
       |WHERE (ns.n_name = '$Q7A' AND nc.n_name = '$Q7B') OR (ns.n_name = '$Q7B' AND nc.n_name = '$Q7A')
       |GROUP BY 1, 2, 3
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q8: market share of one supplier nation within a (part type, customer
  // region) market, per year. The widest join in the suite (7 tables); the
  // share is a conditional decimal sum over the total decimal sum — exact
  // numerator and denominator, ONE IEEE division per year row.
  // Scale: nation/region broadcast always; the ECONOMY part-key set and the
  // EUROPE customer map broadcast at test scale via AQE (no hint — at 100 TB
  // they exceed the threshold and AQE falls back to shuffled joins on the
  // already-shuffled orderkey/custkey chain).
  // ---------------------------------------------------------------------------
  private val Q8Nation = "NATION_5"
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val zero = lit(new java.math.BigDecimal("0.00"))
    val euCust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "EUROPE")
      .select($"c_custkey")
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val ecoParts = Tables.part(s, dir)
      .filter($"p_type" === "ECONOMY").select($"p_partkey")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        revD($"l_extendedprice", $"l_discount").as("revd"))
      .join(ecoParts, $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(euCust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("int").as("o_year"))
      .agg(
        sum(when($"supp_nation" === Q8Nation, $"revd").otherwise(zero)).as("n"),
        sum($"revd").as("d"))
      .select($"o_year",
        ($"n".cast("double") / $"d".cast("double")).as("mkt_share"))
  }
  val marketShareSql: String =
    s"""WITH flat AS (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) AS revd,
       |         ns.n_name AS supp_nation
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
       |  JOIN nation nc ON c_nationkey = nc.n_nationkey JOIN region ON nc.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey JOIN nation ns ON s_nationkey = ns.n_nationkey
       |  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE')
       |SELECT o_year,
       |       CAST(sum(CASE WHEN supp_nation = '$Q8Nation' THEN revd ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       |         / CAST(sum(revd) AS DOUBLE) AS mkt_share
       |FROM flat GROUP BY o_year
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q13: customer distribution by order count. The left join MUST keep
  // customers with zero orders (they form the c_count = 0 bucket — an inner
  // join silently drops the most interesting bar of the histogram). Double
  // aggregation: per-customer count (one shuffle on custkey), then the tiny
  // count-of-counts (second shuffle of |distinct counts| rows).
  // ---------------------------------------------------------------------------
  def orderCountDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select($"c_custkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }
  val orderCountDistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) t
      |GROUP BY c_count
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q14: promo revenue share for one ship-month — join + conditional
  // aggregate ratio. The month filter prunes the fact scan first; the part
  // join then carries only that month's rows.
  // ---------------------------------------------------------------------------
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val zero = lit(new java.math.BigDecimal("0.00"))
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1997-09-01 00:00:00") &&
        $"l_shipdate" < ts("1997-10-01 00:00:00"))
      .select($"l_partkey", revD($"l_extendedprice", $"l_discount").as("revd"))
      .join(Tables.part(s, dir).select($"p_partkey", $"p_type"),
        $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"revd").otherwise(zero)).as("n"),
        sum($"revd").as("d"))
      .select((lit(100.0) * $"n".cast("double") / $"d".cast("double"))
        .as("promo_share"))
  }
  val promoShareSql: String =
    """SELECT CAST(100 AS DOUBLE) * CAST(sum(CASE WHEN p_type = 'PROMO'
      |           THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))
      |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q15: top supplier by quarterly revenue — argmax via scalar subquery.
  // The per-supplier aggregate is computed ONCE (materialized) and feeds both
  // the 1-row max and the equality filter; the max broadcasts back as a
  // 1-row join (never a driver collect). The comparison runs on the exact
  // DECIMAL sums — comparing derived doubles would risk ties splitting on
  // the last ulp.
  // ---------------------------------------------------------------------------
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = graft.Materialize.lazyCut(
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") &&
          $"l_shipdate" < ts("1997-04-01 00:00:00"))
        .groupBy($"l_suppkey")
        .agg(sum(revD($"l_extendedprice", $"l_discount")).as("r")))
    val mx = rev.agg(max($"r").as("mr"))
    Tables.supplier(s, dir).select($"s_suppkey", $"s_name")
      .join(rev, $"s_suppkey" === $"l_suppkey")
      .join(broadcast(mx), $"r" === $"mr")
      .select($"s_suppkey", $"s_name", $"r".cast("double").as("total_revenue"))
  }
  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS r
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE r = (SELECT max(r) FROM rev)
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q17: revenue from small-quantity orders of one brand — the canonical
  // CORRELATED scalar subquery ("below 20% of this part's average quantity"),
  // decorrelated into a per-part aggregate join: that rewrite is not just a
  // Spark workaround, it IS the scalable plan (the naive correlated form
  // re-aggregates per outer row). The brand-restricted lineitem slice feeds
  // both the aggregate and the final filter — materialized once.
  // Determinism: the threshold is an exact decimal-sum mean scaled by 0.2,
  // with identical formula text in both engines.
  // ---------------------------------------------------------------------------
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bp = Tables.part(s, dir).filter($"p_brand" === "Brand#1").select($"p_partkey")
    val li = graft.Materialize.lazyCut(
      Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        .join(bp, $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice"))
    val ag = li.groupBy($"l_partkey".as("a_partkey"))
      .agg((lit(0.2) * (sum(D($"l_quantity")).cast("double") / count(lit(1))))
        .as("thr"))
    li.join(ag, $"l_partkey" === $"a_partkey")
      .filter($"l_quantity" < $"thr")
      .agg((sum(D($"l_extendedprice")).cast("double") / lit(7.0).cast("double"))
        .as("avg_yearly"))
  }
  val smallQtyRevenueSql: String =
    """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
      |li AS (SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem JOIN bp ON l_partkey = p_partkey),
      |ag AS (SELECT l_partkey AS a_partkey, CAST(0.2 AS DOUBLE) * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS thr
      |       FROM li GROUP BY l_partkey)
      |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly
      |FROM li JOIN ag ON l_partkey = a_partkey WHERE l_quantity < thr
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q18: large-volume orders — IN (... HAVING sum > T) realized as a join
  // against the per-order quantity aggregate. The aggregate doubles as the
  // output column, so the oracle's re-aggregation after the 3-way join
  // collapses to a single join here (same result: a lineitem sum per order
  // is the same number on either side of the customer join).
  // ---------------------------------------------------------------------------
  private val Q18T = 300
  def largeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sum(D($"l_quantity")).as("sq"))
      .filter($"sq" > lit(new java.math.BigDecimal(Q18T)))
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, dir).select($"c_custkey", $"c_name"),
        $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sq".cast("double").as("sum_qty"))
  }
  val largeOrdersSql: String =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       |                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $Q18T)
       |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q19: disjunctive-predicate revenue — three (brand, size, quantity)
  // baskets OR'd together, with conditions spanning BOTH join sides.
  // Catalyst extracts the per-side disjunction (p_brand ∈ {1,2,3} with its
  // size bands) and pushes it below the join, so the part scan is pruned
  // even though no single conjunct applies to every branch.
  // ---------------------------------------------------------------------------
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def basket(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      $"p_brand" === brand && $"p_size".between(1, sizeHi) &&
        $"l_quantity" >= qLo && $"l_quantity" <= qHi
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity",
        revD($"l_extendedprice", $"l_discount").as("revd"))
      .join(Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_size"),
        $"l_partkey" === $"p_partkey")
      .filter(basket("Brand#1", 15, 1, 11) ||
        basket("Brand#2", 25, 10, 20) ||
        basket("Brand#3", 35, 20, 30))
      .agg(sum($"revd").cast("double").as("revenue"))
  }
  val disjunctiveRevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q22: dormant high-balance accounts — customers above the average positive
  // balance with no open ('P') orders, summarized per segment. Two classic
  // shapes composed: a scalar-subquery threshold (1-row aggregate broadcast
  // back as a cross join — never collected to the driver) and a NOT EXISTS
  // anti-join.
  // ---------------------------------------------------------------------------
  def dormantAccounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ab = Tables.customer(s, dir)
      .filter($"c_acctbal" > 0)
      .agg((sum(D($"c_acctbal")).cast("double") / count(lit(1))).as("a"))
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .crossJoin(broadcast(ab))
      .filter($"c_acctbal" > $"a")
      .join(Tables.orders(s, dir).filter($"o_orderstatus" === "P")
        .select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(D($"c_acctbal")).cast("double").as("totacctbal"))
  }
  val dormantAccountsSql: String =
    """WITH ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
      |           FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, count(*) AS numcust,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, ab
      |WHERE c_acctbal > ab.a AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q16 shape: supplier variety per part attribute — COUNT(DISTINCT) after a
  // join. Spark plans this as a two-phase aggregate (partial distinct on
  // (group, suppkey), then the final count) so the shuffle carries distinct
  // combinations, not raw join output; the type filter prunes the part scan.
  // ---------------------------------------------------------------------------
  def supplierVariety(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey")
      .join(Tables.part(s, dir).filter($"p_type" === "STANDARD")
        .select($"p_partkey", $"p_brand", $"p_size"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(
        countDistinct($"l_suppkey").as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
  }
  val supplierVarietySql: String =
    """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
      |       count(*) AS n_lineitems
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'STANDARD'
      |GROUP BY p_brand, p_size
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q4 shape: order-priority count over a date window, where the order
  // qualifies iff ANY of its lineitems shipped late (> 60 days after the
  // order date). The EXISTS subquery is a LEFT SEMI join with a mixed
  // equi + non-equi condition — each order row is emitted at most once no
  // matter how many late lines it has, so the shuffle after the join
  // carries orders, not lineitems. The 3-month date window prunes the
  // orders scan (PushedFilters); at 100 TB with date-partitioned orders
  // that window is also a partition-pruning cut.
  // ---------------------------------------------------------------------------
  def latePriorityCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-07-01 00:00:00") &&
        $"o_orderdate" < ts("1996-10-01 00:00:00"))
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
    o.join(li,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }
  val latePriorityCountSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q12 shape: conditional two-way counts after a fact-to-fact join — for
  // every late line (shipped > 90 days after its order date) in a one-year
  // ship window, split the count by whether the order was high-priority.
  // The CASE folds what would be two scans into one aggregate pass
  // (map-side partial on l_returnflag); the ship-date range prunes the
  // lineitem scan before the join.
  // ---------------------------------------------------------------------------
  def lateByFlag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") &&
        $"l_shipdate" < ts("1998-01-01 00:00:00"))
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")
    val o = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(o, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }
  val lateByFlagSql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q21 shape: "the supplier everyone waited on" — in orders served by at
  // least two suppliers, blame the UNIQUE supplier whose latest line is
  // strictly after every other supplier's. The classic form is a double
  // correlated EXISTS / NOT EXISTS; decorrelated here into one partial
  // aggregate to (order, supplier) grain followed by three window passes
  // over the SAME l_orderkey partitioning (max, peer count, max-achiever
  // count) — a single shuffle on the fact after the per-key combine, then
  // a broadcast dim join and a top-10 TakeOrderedAndProject.
  // ---------------------------------------------------------------------------
  def latestShipper(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
    // Pre-partition on orderkey ALONE: hashpartitioning(orderkey) satisfies
    // the (orderkey, suppkey) aggregate's ClusteredDistribution (subset
    // rule) AND the window trio's orderkey distribution, so the whole
    // chain scan→agg→3 windows runs on ONE exchange. Letting the aggregate
    // pick its own (orderkey, suppkey) exchange would add a second
    // back-to-back full-data shuffle for nothing — lineitem is ~1 row per
    // (order, supplier), so the partial max that exchange enables dedupes
    // almost nothing, here or at 100 TB.
    val per = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"l_shipdate").as("sd"))
    val blamed = per
      .withColumn("mx", max($"sd").over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .filter($"sd" === $"mx" && $"nsupp" >= 2)
      .withColumn("nmax", count(lit(1)).over(w))
      .filter($"nmax" === 1)
    blamed
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name".asc)
      .limit(10)
  }
  val latestShipperSql: String =
    """WITH per AS (
      |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
      |  FROM lineitem GROUP BY l_orderkey, l_suppkey),
      |ann AS (
      |  SELECT *, max(sd) OVER (PARTITION BY l_orderkey) AS mx,
      |         count(*) OVER (PARTITION BY l_orderkey) AS nsupp
      |  FROM per),
      |top AS (
      |  SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS nmax
      |  FROM ann WHERE sd = mx AND nsupp >= 2)
      |SELECT s_name, count(*) AS numwait
      |FROM top JOIN supplier ON l_suppkey = s_suppkey
      |WHERE nmax = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 10
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q2 shape: minimum-cost supplier — the CORRELATED SCALAR SUBQUERY
  // benchmark. The testdata has no partsupp, so the part-supplier offer
  // relation is derived from lineitem: each (part, supplier) pair's cost is
  // its minimum observed unit price (a single IEEE division per row, then
  // MIN — deterministic in both engines). The offers relation feeds BOTH
  // the outer join block AND the per-part min-cost subquery; a WITH-CTE
  // would be INLINED by Catalyst into two full lineitem scan+aggregate
  // pipelines (the fact table read twice per run), so `ps` is materialized
  // ONCE (the q_chisq pattern) and registered as a view. The query text
  // over that view keeps the correlated scalar subquery verbatim, so
  // Catalyst still must DECORRELATE it into an aggregate + join
  // (RewriteCorrelatedScalarSubquery) — the spec gates BOTH that no
  // scalar-subquery survives in the optimized plan AND that lineitem is
  // scanned zero times downstream of the materialization. At 100 TB the
  // offers relation is ~|part|×|supp-per-part| rows (orders of magnitude
  // smaller than the fact); both decorrelated sides shuffle on partkey
  // once; the dim chain (supplier ⋈ nation ⋈ region) broadcasts.
  // ---------------------------------------------------------------------------
  val minCostSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_cost
      |FROM part, ps, supplier, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_type = 'STANDARD' AND p_size <= 25
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND ps_cost = (SELECT min(ps2.ps_cost)
      |                 FROM ps ps2, supplier s2, nation n2, region r2
      |                 WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      |                   AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |                   AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, s_name, p_partkey
      |LIMIT 100
      |""".stripMargin
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Sources.registerTable(s, "part", s"$dir/part.parquet")
    // one lineitem scan, ever: aggregate to the (part, supplier, min-cost)
    // offers relation, pre-join the EUROPE supplier dim chain (broadcast —
    // supplier⋈nation⋈region is dim-sized), and pin the result. Both SQL
    // consumers — the outer block AND the correlated min-cost subquery —
    // previously re-joined the full 4-relation chain each; now both read
    // ONE materialized EU-offers leaf, so the duplicated dim joins and the
    // second offers shuffle disappear while the correlated scalar subquery
    // stays verbatim in the query text (Catalyst still must decorrelate it
    // — the PlanSpec gate on RewriteCorrelatedScalarSubquery holds).
    val euSupp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_acctbal", $"s_name", $"n_name")
    // EU filter BELOW the aggregation: only EU offers are ever consumed, so
    // broadcast-joining suppliers before the groupBy drops ~4/5 of the
    // offer shuffle at the map side (min per (part, supp) commutes with a
    // supplier-level filter).
    val euOffers = graft.Materialize.lazyCut(
      Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_suppkey", ($"l_extendedprice" / $"l_quantity").as("c"))
        .join(broadcast(euSupp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey", $"s_suppkey", $"s_acctbal", $"s_name", $"n_name")
        .agg(min($"c").as("ps_cost"))
        .select($"l_partkey".as("ps_partkey"), $"s_suppkey".as("ps_suppkey"),
          $"ps_cost", $"s_acctbal", $"s_name", $"n_name"))
    euOffers.createOrReplaceTempView("ps_eu_offers")
    s.sql(
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_cost
        |FROM part, ps_eu_offers
        |WHERE p_partkey = ps_partkey
        |  AND p_type = 'STANDARD' AND p_size <= 25
        |  AND ps_cost = (SELECT min(ps2.ps_cost)
        |                 FROM ps_eu_offers ps2
        |                 WHERE ps2.ps_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, s_name, p_partkey
        |LIMIT 100
        |""".stripMargin)
  }

  // ---------------------------------------------------------------------------
  // Q9 shape: profit rollup by supplier nation and year over a LIKE-filtered
  // part set — the widest fact-side join after Q8 (part ⋈ lineitem ⋈
  // supplier ⋈ orders ⋈ nation). Cost stands in for ps_supplycost via
  // p_retailprice · quantity. Revenue and cost are accumulated as SEPARATE
  // exact decimal sums and subtracted once as doubles at the end — a single
  // decimal difference per row would couple the two engines' decimal
  // widening rules; two exact sums and one IEEE subtraction cannot diverge.
  // The LIKE filter prunes part before its join (pushed to the scan).
  // ---------------------------------------------------------------------------
  def nationProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bolts = Tables.part(s, dir)
      .filter($"p_name".like("%bolt%"))
      .select($"p_partkey", $"p_retailprice")
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey", $"l_orderkey",
        revD($"l_extendedprice", $"l_discount").as("rev"),
        D($"l_quantity").as("qty"))
      .join(bolts, $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"),
        year($"o_orderdate").cast("int").as("o_year"))
      .agg((sum($"rev").cast("double") -
        sum(D($"p_retailprice") * $"qty").cast("double")).as("sum_profit"))
  }
  val nationProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
      |         - CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q11 shape: important parts — HAVING against a GLOBAL scalar threshold.
  // Per-part value (exact decimal sum of ASIA-supplied line revenue) kept
  // only when it exceeds the corpus-wide MEAN part value. The per-part
  // relation feeds BOTH the output filter and the threshold aggregate, so
  // it is materialized ONCE (plan-gated: the final plan reads the
  // checkpoint, no second lineitem scan) and the one-row threshold joins
  // back by broadcast — the no-driver-roundtrip scalar idiom. The mean
  // (not an absolute fraction) keeps the threshold scale-free: the classic
  // query hand-scales its fraction by SF for exactly this reason.
  // ---------------------------------------------------------------------------
  def importantParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .select($"s_suppkey")
    val v = graft.Materialize.lazyCut(
      Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
        .join(asiaSupp, $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey".as("ps_partkey"))
        .agg(sum(D($"l_extendedprice")).as("vald")))
    val thr = v.agg(
      (sum($"vald").cast("double") / count(lit(1))).as("thr"))
    v.crossJoin(broadcast(thr))
      .filter($"vald".cast("double") > $"thr")
      .select($"ps_partkey", $"vald".cast("double").as("val"))
  }
  val importantPartsSql: String =
    """WITH v AS (
      |  SELECT l_partkey AS ps_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS vald
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1)
      |SELECT ps_partkey, CAST(vald AS DOUBLE) AS val
      |FROM v
      |WHERE CAST(vald AS DOUBLE) > (SELECT CAST(sum(vald) AS DOUBLE) / count(*) FROM v)
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Q20 shape: the DOUBLY-NESTED semi-join reduction — suppliers (in two
  // nations) who shipped a meaningful volume of some LIKE-matched part.
  // Run as LITERAL SQL with both predicates as IN subqueries, so the
  // planner must turn part-IN into a semi-join under the aggregate and
  // supplier-IN into a semi-join above it (spec gates TWO LeftSemi joins
  // in the optimized plan). The quantity HAVING is an exact decimal sum.
  // At 100 TB: the inner semi prunes lineitem before its (supp, part)
  // aggregate shuffle; the outer semi is a broadcast of the tiny surviving
  // supplier-key set.
  // ---------------------------------------------------------------------------
  val volumeSuppliersSql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_3', 'NATION_8') AND s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 60)
      |ORDER BY s_name
      |""".stripMargin
  def volumeSuppliers(s: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "nation", "part", "lineitem").foreach { t =>
      graft.sources.Sources.registerTable(s, t, s"$dir/$t.parquet")
    }
    s.sql(volumeSuppliersSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_min_cost_supplier"   -> minCostSupplier _,
    "q_nation_profit"       -> nationProfit _,
    "q_important_parts"     -> importantParts _,
    "q_volume_suppliers"    -> volumeSuppliers _,
    "q_late_priority"       -> latePriorityCount _,
    "q_late_by_flag"        -> lateByFlag _,
    "q_latest_shipper"      -> latestShipper _,
    "q_supplier_variety"    -> supplierVariety _,
    "q_forecast_revenue"    -> forecastRevenue _,
    "q_volume_shipping"     -> volumeShipping _,
    "q_market_share"        -> marketShare _,
    "q_order_count_dist"    -> orderCountDist _,
    "q_promo_share"         -> promoShare _,
    "q_top_supplier"        -> topSupplier _,
    "q_small_qty_revenue"   -> smallQtyRevenue _,
    "q_large_orders"        -> largeOrders _,
    "q_disjunctive_revenue" -> disjunctiveRevenue _,
    "q_dormant_accounts"    -> dormantAccounts _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_min_cost_supplier"   -> minCostSupplierSql,
    "q_nation_profit"       -> nationProfitSql,
    "q_important_parts"     -> importantPartsSql,
    "q_volume_suppliers"    -> volumeSuppliersSql,
    "q_late_priority"       -> latePriorityCountSql,
    "q_late_by_flag"        -> lateByFlagSql,
    "q_latest_shipper"      -> latestShipperSql,
    "q_supplier_variety"    -> supplierVarietySql,
    "q_forecast_revenue"    -> forecastRevenueSql,
    "q_volume_shipping"     -> volumeShippingSql,
    "q_market_share"        -> marketShareSql,
    "q_order_count_dist"    -> orderCountDistSql,
    "q_promo_share"         -> promoShareSql,
    "q_top_supplier"        -> topSupplierSql,
    "q_small_qty_revenue"   -> smallQtyRevenueSql,
    "q_large_orders"        -> largeOrdersSql,
    "q_disjunctive_revenue" -> disjunctiveRevenueSql,
    "q_dormant_accounts"    -> dormantAccountsSql,
  )
}
