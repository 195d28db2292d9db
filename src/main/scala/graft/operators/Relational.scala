package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operator set — the reference's complete query surface
  * (SURVEY.md §2) re-expressed Spark-first over the driver testdata tables.
  *
  * Each query has a paired DuckDB oracle (`oracleSql`) run by the driver on
  * the same parquet; column names are aliased identically on both sides.
  *
  * Float determinism: Spark and DuckDB may sum doubles in different orders,
  * so every aggregated money/quantity column is cast to an exact DECIMAL
  * before SUM and back to DOUBLE after — both engines then compute the same
  * exact value regardless of partitioning. This also models the reference's
  * own DECIMAL money semantics (`init-db.sql:29-30`, Trino DECIMAL(13,2)
  * dataset columns).
  *
  * Scale notes are inline per query; the common themes:
  *   - dimension joins (`nation`, `region`, per-key aggregates of bounded
  *     cardinality) are explicitly `broadcast()` — no shuffle of the fact;
  *   - fact-fact joins shuffle on the join key once and reuse it;
  *   - aggregates are partial+final hash aggregates (map-side combine), so
  *     shuffle volume is `O(groups)`, not `O(rows)`;
  *   - top-k is `TakeOrderedAndProject` (per-partition heap + driver merge),
  *     never a global sort.
  */
object Relational {

  private def D(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(s"decimal($p,$s)")

  // ---------------------------------------------------------------------------
  // P1-P4 + P17: CDC-style JSON field extraction, casts, null-rejecting filter
  // (ref: spark/SaveDelta.scala:134-149 — get_json_object per column + cast +
  //  filter(id is not null); timestamp formatting sport_generation.py:198).
  // Scale: single narrow projection stage, whole-stage codegen, no shuffle;
  // one JSON parse per row (the reference parsed 7×).
  // ---------------------------------------------------------------------------
  def cdcExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id", $"user_id",
        get_json_object($"props", "$.k").cast("int").as("k"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        $"value".cast("double").as("value"))
      .filter($"event_id".isNotNull && $"k".isNotNull)
  }
  val cdcExtractSql: String =
    """SELECT event_id, user_id,
      |       CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k,
      |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
      |       CAST(value AS DOUBLE) AS value
      |FROM events
      |WHERE event_id IS NOT NULL
      |  AND CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) IS NOT NULL
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // P3: epoch-microseconds <-> timestamp conversion
  // (ref: spark/SaveDelta.scala:143 — from_unixtime(cast(x as long)/1000000)).
  // ---------------------------------------------------------------------------
  def epochMicros(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        unix_micros($"ts").as("epoch_us"),
        expr("unix_micros(ts) div 1000000").as("epoch_s"),
        from_unixtime(expr("unix_micros(ts) div 1000000"),
          "yyyy-MM-dd HH:mm:ss").as("ts_str"))
  }
  val epochMicrosSql: String =
    """SELECT event_id,
      |       epoch_us(CAST(ts AS TIMESTAMP)) AS epoch_us,
      |       epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
      |       strftime(make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000),
      |                '%Y-%m-%d %H:%M:%S') AS ts_str
      |FROM events
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // A1: group-by count + mean per key
  // (ref: airflow/config/read_delta.py:123-127 — activities per employee:
  //  count(id_employee) AS count_activity, avg(activity_duration)).
  // Scale: partial+final hash aggregate; shuffle carries one row per customer,
  // not per order. Mean computed as exact-decimal sum / count for determinism.
  // ---------------------------------------------------------------------------
  /** Shared per-customer aggregate — the ONE definition of the decimal-sum
    * mean (determinism rule 1); aliases parameterized for reuse by the
    * left-join and flagship queries so the three can't drift apart. */
  private def custAgg(s: SparkSession, dir: String,
                      cntAlias: String, meanAlias: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as(cntAlias),
        (sum(D($"o_totalprice")).cast("double") / count(lit(1))).as(meanAlias))
  }

  def aggCountAvg(s: SparkSession, dir: String): DataFrame =
    custAgg(s, dir, "count_orders", "mean_price")
  val aggCountAvgSql: String =
    """SELECT o_custkey, count(*) AS count_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_price
      |FROM orders GROUP BY o_custkey
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // A2: group-by count, order desc, limit (top-k)
  // (ref: spark/SaveDelta.scala:236-242 — top-5 sport_type by count).
  // Scale: TakeOrderedAndProject — per-partition heaps, driver merges k rows;
  // no global sort. Tie-broken on the key so the result set is deterministic.
  // ---------------------------------------------------------------------------
  def topkGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("event_type"))
      .limit(5)
  }
  val topkGroupSql: String =
    """SELECT event_type, count(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 5
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // J1: inner equi-join fact x dim x dim
  // (ref: read_delta.py:280 — employees JOIN commute_validations USING
  //  (id_employee); manual column pruning read_delta.py:261 = the select here).
  // Scale: both dims broadcast (25 / 5 rows; at 100 TB still < 10 MB) — zero
  // shuffle of the 15k..150M-row customer side.
  // ---------------------------------------------------------------------------
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"c_name", $"n_name".as("nation"), $"r_name".as("region"))
  }
  val joinInnerSql: String =
    """SELECT c_custkey, c_name, n_name AS nation, r_name AS region
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // J2 + A1: left outer join dim x aggregated fact — keeps customers with zero
  // orders as NULL count/mean (ref: read_delta.py:285; SURVEY §7.4 risk 1).
  // Scale: the aggregate output is |customers|-sized; joined on the same key
  // the aggregation shuffled on, so AQE can plan it shuffle-free; for a
  // truly huge dim this is a co-partitioned sort-merge join, no extra pass.
  // ---------------------------------------------------------------------------
  def joinLeftAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = custAgg(s, dir, "count_orders", "mean_price")
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      .join(agg, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment", $"count_orders", $"mean_price")
  }
  val joinLeftAggSql: String =
    """SELECT c_custkey, c_acctbal, c_mktsegment, count_orders, mean_price
      |FROM customer
      |LEFT JOIN (
      |  SELECT o_custkey, count(*) AS count_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_price
      |  FROM orders GROUP BY o_custkey
      |) a ON c_custkey = o_custkey
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Flagship: the README bonus query (ref: README.md:141-164, Superset virtual
  // dataset SQL) — CTE prime + self-join, CASE bonus (P7), CASE threshold with
  // NULL->false (P8), arithmetic total (P9), ROUND half-up (P10), on top of
  // the A1 aggregate and J1/J2 joins. One query exercising most of §2.
  // Scale: one shuffle (the per-customer aggregate); the prime CTE join is on
  // the same key — kept as a join for fidelity to the reference SQL, though it
  // is semantically a projection; Catalyst executes it as a cheap same-key
  // join of two |customer|-sized sides.
  // ---------------------------------------------------------------------------
  def flagshipBonus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = custAgg(s, dir, "count_activity", "mean_price")
    val fin = Tables.customer(s, dir)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment", $"c_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(agg, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment",
        $"n_name".as("nation"), ($"c_acctbal" >= 0).as("is_valid"),
        $"count_activity", $"mean_price")
    val prime = fin.select($"c_custkey".as("p_custkey"),
      when($"is_valid",
        round(D($"c_acctbal", 12) * lit(new java.math.BigDecimal("0.05")), 2)
          .cast("double"))
        .otherwise(lit(0.0)).as("commute_prime"))
    fin.join(prime, $"c_custkey" === $"p_custkey")
      .select(
        $"c_custkey", $"c_acctbal", $"c_mktsegment", $"nation",
        $"is_valid".as("commute_valid"),
        when($"count_activity" >= 15, lit(true)).otherwise(lit(false))
          .as("is_valid_activities"),
        $"count_activity", $"mean_price", $"commute_prime",
        (D($"c_acctbal", 12) + D($"commute_prime", 13)).cast("double")
          .as("total"))
  }
  val flagshipBonusSql: String =
    """WITH agg AS (
      |  SELECT o_custkey, count(*) AS count_activity,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_price
      |  FROM orders GROUP BY o_custkey
      |),
      |final AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment, n_name AS nation,
      |         (c_acctbal >= 0) AS is_valid, count_activity, mean_price
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  LEFT JOIN agg ON o_custkey = c_custkey
      |),
      |prime AS (
      |  SELECT c_custkey AS p_custkey,
      |         CASE WHEN is_valid
      |              THEN CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)) * 0.05, 2) AS DOUBLE)
      |              ELSE CAST(0 AS DOUBLE) END AS commute_prime
      |  FROM final
      |)
      |SELECT f.c_custkey, f.c_acctbal, f.c_mktsegment, f.nation,
      |       f.is_valid AS commute_valid,
      |       CASE WHEN f.count_activity >= 15 THEN true ELSE false END AS is_valid_activities,
      |       f.count_activity, f.mean_price, p.commute_prime,
      |       CAST(CAST(f.c_acctbal AS DECIMAL(12,2)) + CAST(p.commute_prime AS DECIMAL(13,2)) AS DOUBLE) AS total
      |FROM final f JOIN prime p ON f.c_custkey = p.p_custkey
      |""".stripMargin

  /** Flagship as LITERAL SQL TEXT through the catalog — the reference's own
    * serving path: this query reaches users as SQL via Trino/Superset
    * (ref: README.md:141-164), not as DataFrame code. The ANSI text is the
    * SAME string as the DuckDB oracle, run by `spark.sql` over views
    * registered with the S13 catalog operator — one query text, two engines,
    * hash-identical results (closes the SURVEY §3.3 lifecycle). */
  def flagshipSqlText(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "nation", "orders").foreach { t =>
      graft.sources.Sources.registerTable(s, t, s"$dir/$t.parquet")
    }
    s.sql(flagshipBonusSql)
  }

  // ---------------------------------------------------------------------------
  // P11: conditional column masking — the employees_masked security view
  // (ref: init-scripts/init-db.sql:74-89 — CASE WHEN current_user =
  //  'sportadvantagebiuser' THEN NULL ELSE first_name END). The session role
  // is an engine parameter (`graft.mask.biuser`, default true = masked, the
  // analytics-role behavior the batch job reads, read_delta.py:258).
  // ---------------------------------------------------------------------------
  def maskedView(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val isBi = s.conf.get("graft.mask.biuser", "true").toBoolean
    def mask(c: Column): Column =
      when(lit(isBi), lit(null).cast("string")).otherwise(c)
    Tables.customer(s, dir)
      .select($"c_custkey", mask($"c_name").as("c_name"),
        $"c_nationkey", $"c_acctbal", mask($"c_mktsegment").as("c_mktsegment"))
  }
  val maskedViewSql: String =
    """SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_nationkey,
      |       c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
      |FROM customer
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // P12-P14: threshold validation with set-membership and interpolated error
  // message (ref: commute_validation/commute_validation.py:15-18,84-112 —
  // TRANSPORT_LIMITS per mode, "non sportif" rejection, "Distance (x) >
  // limite (y)" message). Segments stand in for transport modes; acctbal for
  // the computed distance. Pure codegen'd row-local expressions — no shuffle.
  // ---------------------------------------------------------------------------
  private val sportySegs = Seq("AUTOMOBILE", "BUILDING")
  def validateThreshold(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lim = when($"c_mktsegment" === "AUTOMOBILE", lit(5000)).otherwise(lit(7500))
    val dist = D($"c_acctbal", 12)
    Tables.customer(s, dir).select(
      $"c_custkey", $"c_mktsegment".as("transport_mode"),
      dist.cast("double").as("calculed_distance"),
      when(!$"c_mktsegment".isin(sportySegs: _*), lit(false))
        .when($"c_acctbal" <= lim, lit(true)).otherwise(lit(false)).as("is_valid"),
      when(!$"c_mktsegment".isin(sportySegs: _*),
        concat(lit("Mode de transport '"), $"c_mktsegment", lit("' non sportif")))
        .when($"c_acctbal" <= lim, lit(null).cast("string"))
        .otherwise(concat(lit("Distance ("), dist.cast("string"),
          lit(" m) > limite ("), lim.cast("string"), lit(" m)")))
        .as("error_message"))
  }
  val validateThresholdSql: String =
    """SELECT c_custkey, c_mktsegment AS transport_mode,
      |       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS calculed_distance,
      |       CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING') THEN false
      |            WHEN c_acctbal <= (CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 5000 ELSE 7500 END) THEN true
      |            ELSE false END AS is_valid,
      |       CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING')
      |              THEN 'Mode de transport ''' || c_mktsegment || ''' non sportif'
      |            WHEN c_acctbal <= (CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 5000 ELSE 7500 END)
      |              THEN CAST(NULL AS VARCHAR)
      |            ELSE 'Distance (' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
      |                 || ' m) > limite ('
      |                 || CAST((CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 5000 ELSE 7500 END) AS VARCHAR)
      |                 || ' m)' END AS error_message
      |FROM customer
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // J4: FK-integrity as anti-join (ref: init-db.sql:34,48 FOREIGN KEY — Spark
  // doesn't enforce constraints; the declarative check is a left_anti join).
  // Scale: null-aware not needed (keys non-null); broadcast-able when the
  // violating side's key set is small; else shuffled hash anti-join.
  // ---------------------------------------------------------------------------
  def antiFk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderstatus" === "P").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
  }
  val antiFkSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |""".stripMargin

  /** Semi-join (EXISTS) companion of J4. */
  def semiExists(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey")
  }
  val semiExistsSql: String =
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |""".stripMargin

  /** Full outer join (§2.3 completeness): reconcile two partial views —
    * customers holding open ('P') orders vs customers holding filled ('F')
    * ones; either side may be absent. The join keys coalesce into one
    * output key so the row is usable downstream (the standard full-outer
    * idiom); at scale this is the same single key shuffle as an inner join,
    * just without pruning unmatched rows. */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def side(status: String, as: String) =
      Tables.orders(s, dir).filter($"o_orderstatus" === status)
        .groupBy($"o_custkey").agg(count(lit(1)).as(as))
    side("P", "n_open").toDF("k_open", "n_open")
      .join(side("F", "n_filled").toDF("k_filled", "n_filled"),
        $"k_open" === $"k_filled", "full_outer")
      .select(
        coalesce($"k_open", $"k_filled").as("custkey"),
        coalesce($"n_open", lit(0L)).as("n_open"),
        coalesce($"n_filled", lit(0L)).as("n_filled"))
  }
  val joinFullOuterSql: String =
    """SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
      |       COALESCE(a.n_open, 0) AS n_open,
      |       COALESCE(b.n_filled, 0) AS n_filled
      |FROM (SELECT o_custkey, count(*) AS n_open FROM orders
      |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) a
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_filled FROM orders
      |                 WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
      |  ON a.o_custkey = b.o_custkey
      |""".stripMargin

  /** Set operations (§2.5 completeness): customers appearing in both, either,
    * or exactly one of two order-status populations — INTERSECT / UNION /
    * EXCEPT over the same key relation, tagged and unioned so one query
    * exercises all three. Set semantics (dedup) on every branch. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // each side feeds three set operators — materialize once per side or
    // the scan + distinct aggregate executes three times per side
    def keys(status: String) = graft.Materialize.lazyCut(
      Tables.orders(s, dir).filter($"o_orderstatus" === status)
        .select($"o_custkey").distinct())
    val p = keys("P"); val f = keys("F")
    p.intersect(f).withColumn("op", lit("both"))
      .union(p.union(f).distinct().withColumn("op", lit("either")))
      .union(p.except(f).withColumn("op", lit("only_open")))
  }
  val setOpsSql: String =
    """WITH p AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'),
      |f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT o_custkey, 'both' AS op FROM (SELECT * FROM p INTERSECT SELECT * FROM f) x
      |UNION ALL
      |SELECT o_custkey, 'either' AS op FROM (SELECT * FROM p UNION SELECT * FROM f) y
      |UNION ALL
      |SELECT o_custkey, 'only_open' AS op FROM (SELECT * FROM p EXCEPT SELECT * FROM f) z
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // §2.8: Great-Expectations-style data-quality checks as ONE aggregation pass
  // (ref: airflow/dags/data_validation_dag.py:306-320 — 2 not-null + 2 range
  // expectations; executed as sum(CASE WHEN violated)). At 100 TB this is a
  // single scan + scalar aggregate — the cheapest possible full-table audit.
  // ---------------------------------------------------------------------------
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def violations(c: Column): Column =
      sum(when(c, lit(1)).otherwise(lit(0))).cast("long")
    Tables.events(s, dir).agg(
      count(lit(1)).as("total_rows"),
      violations($"ts".isNull).as("null_ts"),
      violations($"event_type".isNull).as("null_event_type"),
      violations($"value" < 0).as("negative_value"),
      violations($"value".isNotNull && $"value" < 0).as("negative_nonnull_value"))
  }
  val expectationsSql: String =
    """SELECT count(*) AS total_rows,
      |       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
      |       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value,
      |       CAST(sum(CASE WHEN value IS NOT NULL AND value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_nonnull_value
      |FROM events
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // One-pass column profiler (graft.quality.Expectations.profile — the
  // deequ/GE "profile" companion to §2.8's expectation suite): per-column
  // row/null/distinct counts and typed min/max over lineitem, one scan +
  // one aggregate for ALL columns (vs the naive |columns| scans), exploded
  // to long form after aggregation. Stats are raw column values, so both
  // engines agree bit-for-bit.
  // ---------------------------------------------------------------------------
  def profileTable(s: SparkSession, dir: String): DataFrame =
    graft.quality.Expectations.profile(Tables.lineitem(s, dir),
      numeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      strings = Seq("l_returnflag", "l_linestatus"))
  val profileTableSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  min($c) AS min_str, max($c) AS max_str
         |FROM lineitem""".stripMargin
    (Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(num) ++
      Seq("l_returnflag", "l_linestatus").map(str)).mkString("\n", "\nUNION ALL\n", "\n")
  }

  // ---------------------------------------------------------------------------
  // A4: dashboard big-number totals (ref: Superset slices "Salaire annuel avec
  // prime" etc. — SUM over the analytics dataset). Exact-decimal sums.
  // ---------------------------------------------------------------------------
  def sumMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spreadForAgg, not rebalanced: the per-row decimal math lives in the
    // agg partials ABOVE the inserted exchange, so a repartition-only
    // spread parallelizes it without rebalanced's checkpoint round-trip
    // (one fewer action + no block materialization; round 18, measured)
    graft.Materialize.spreadForAgg(Tables.lineitem(s, dir)
      .select($"l_extendedprice", $"l_discount", $"l_quantity")).agg(
      sum(D($"l_extendedprice") * (lit(new java.math.BigDecimal(1)) - D($"l_discount", 8)))
        .cast("double").as("revenue"),
      sum(D($"l_quantity")).cast("double").as("sum_qty"),
      count(lit(1)).as("cnt"))
  }
  val sumMetricsSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS cnt
      |FROM lineitem
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // A5: COUNT(*) grouped by boolean flag (ref: Superset pie charts — count by
  // commute_valid / is_valid_activities).
  // ---------------------------------------------------------------------------
  def countByFlag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(($"o_orderstatus" === "F").as("is_final"))
      .agg(count(lit(1)).as("cnt"))
  }
  val countByFlagSql: String =
    """SELECT (o_orderstatus = 'F') AS is_final, count(*) AS cnt
      |FROM orders GROUP BY 1
      |""".stripMargin

  // A3: scalar COUNT(*) (ref: sql_manipulation.py:75, SaveDelta.scala:212 ...).
  def countStar(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(count(lit(1)).as("cnt"))
  val countStarSql: String = "SELECT count(*) AS cnt FROM lineitem"

  // ---------------------------------------------------------------------------
  // A6-analogue + bench workhorse: multi-aggregate pricing summary over the
  // fact table (count/sum/mean per flag pair — the reference's dashboard
  // aggregate shapes, Superset treemap/big-number, at lineitem scale).
  // Scale: classic partial+final hash agg with tiny group count; shuffle is
  // 6 rows x 32 partitions. Whole plan is one codegen stage over the scan.
  // ---------------------------------------------------------------------------
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Integer-cents kernel: every money column is a well-formed 2dp double
    // in the source, so round(x*100) recovers its exact integer cents (raw
    // parquet doubles never land on a .xx5 tie — only COMPUTED values do;
    // see the winsorize note). Per-row work is then LONG multiply-adds in
    // whole-stage codegen instead of precision-28 BigDecimal chains (the
    // decimal form was the single most expensive per-row pipeline in the
    // suite); the partial sums overflow-proof into DECIMAL(38,0) (exact at
    // any corpus size — bigint partials would pass 9.2e18 by ~sf1e3 for
    // the e6-scaled charge), and the final de-scaling multiplies by the
    // exact decimal 1e-k, so the result is the SAME rational number the
    // oracle's decimal arithmetic produces — identical double, same hash.
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax")
      .selectExpr("l_returnflag", "l_linestatus",
        "cast(round(l_quantity * 100) as long) AS qc",
        "cast(round(l_extendedprice * 100) as long) AS pc",
        "cast(round(l_discount * 100) as long) AS dc",
        "cast(round(l_tax * 100) as long) AS tc")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"qc".cast("decimal(38,0)")).as("s_qty_c"),
        sum($"pc".cast("decimal(38,0)")).as("s_price_c"),
        sum(($"pc" * (lit(100L) - $"dc")).cast("decimal(38,0)")).as("s_disc_e4"),
        sum(($"pc" * (lit(100L) - $"dc") * (lit(100L) + $"tc")).cast("decimal(38,0)"))
          .as("s_charge_e6"),
        sum($"dc".cast("decimal(38,0)")).as("s_disc_c"),
        count(lit(1)).as("count_order"))
      .selectExpr("l_returnflag", "l_linestatus",
        "cast(s_qty_c * 0.01 as double) AS sum_qty",
        "cast(s_price_c * 0.01 as double) AS sum_base_price",
        "cast(s_disc_e4 * 0.0001 as double) AS sum_disc_price",
        "cast(s_charge_e6 * 0.000001 as double) AS sum_charge",
        "cast(s_qty_c * 0.01 as double) / count_order AS avg_qty",
        "cast(s_disc_c * 0.01 as double) / count_order AS avg_disc",
        "count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |       CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Event-time tumbling-window aggregation (training-pipeline extension; the
  // reference has no windows — SURVEY §2.5 — but its event stream invites
  // them, and the streaming variant with watermarks reuses this exact shape).
  // Scale: window start is a derived grouping key — partial+final agg, one
  // shuffle of (window, type) partials.
  // ---------------------------------------------------------------------------
  def windowedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(D($"value")).cast("double").as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"cnt", $"sum_value")
  }
  val windowedAggSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |""".stripMargin

  /** Hopping (sliding) window aggregation: 1-hour windows every 30 minutes —
    * each event contributes to exactly 2 overlapping windows. Spark's
    * `window(ts, len, slide)` expands the memberships map-side (like a
    * grouping-set Expand: the shuffle carries per-(window, type) partials,
    * not 2× the events); the streaming twin is the same expression under a
    * watermark. Oracle: the window starts are reconstructed arithmetically
    * (bucket − k·slide), identical grid on both engines. */
  def hoppingAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(D($"value")).cast("double").as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"cnt", $"sum_value")
  }
  val hoppingAggSql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |w AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS window_start,
      |         event_type, value
      |  FROM e, (SELECT unnest([0, 1]) AS k) ks)
      |SELECT window_start, event_type, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Sessionization (training-pipeline extension): gap-based sessions per user
  // (30-minute inactivity gap), then per-session stats. The classic event-log
  // op the reference's event stream invites.
  // Scale: one shuffle on user_id for the window, reused by the session
  // aggregate (same key) — two logical steps, one partitioning.
  // ---------------------------------------------------------------------------
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, lit(1))
          .otherwise(lit(0)))
      .withColumn("sess_seq",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("sess_start"),
        max($"ts").as("sess_end"),
        sum(D($"value")).cast("double").as("sum_value"))
  }
  /** Per-user session FEATURE table — the canonical feature-engineering
    * rollup over the gap-sessionized relation (one row per user:
    * engagement counts, session-length extremes, monetary totals) that a
    * training pipeline joins onto labels. Everything re-aggregates the
    * sessionize output: counts are integers, durations are integer µs,
    * money re-enters decimal before the cross-session sum (re-summing the
    * per-session doubles would be order-dependent), and the single IEEE
    * division happens once per user at the end — bit-reproducible. One
    * extra user-grain shuffle on top of the session rollup. */
  def sessionFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionize(s, dir)
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum($"n_events").cast("long").as("n_events"),
        max(unix_micros($"sess_end") - unix_micros($"sess_start")).as("max_sess_us"),
        sum(unix_micros($"sess_end") - unix_micros($"sess_start")).as("total_sess_us"),
        sum($"sum_value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .selectExpr("user_id", "n_sessions", "n_events", "max_sess_us",
        "total_sess_us",
        "cast(n_events as double) / n_sessions AS events_per_session",
        "total_value")
  }
  lazy val sessionFeaturesSql: String =
    s"""WITH sess AS (${sessionizeSql.trim})
       |SELECT user_id,
       |       CAST(count(*) AS BIGINT) AS n_sessions,
       |       CAST(sum(n_events) AS BIGINT) AS n_events,
       |       CAST(max(epoch_us(sess_end) - epoch_us(sess_start)) AS BIGINT) AS max_sess_us,
       |       CAST(sum(epoch_us(sess_end) - epoch_us(sess_start)) AS BIGINT) AS total_sess_us,
       |       CAST(sum(n_events) AS DOUBLE) / count(*) AS events_per_session,
       |       CAST(sum(CAST(sum_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM sess GROUP BY user_id
       |""".stripMargin
  val sessionizeSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (
      |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM e
      |),
      |y AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1
      |                 ELSE 0 END AS new_sess
      |  FROM x
      |),
      |z AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_seq
      |  FROM y
      |)
      |SELECT user_id, sess_seq, count(*) AS n_events,
      |       min(ts) AS sess_start, max(ts) AS sess_end,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, sess_seq
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Exact quantiles per group (extension): linear-interpolated percentiles —
  // Spark `percentile` and DuckDB `quantile_cont` share the type-7 definition.
  // (For 100 TB use approx_percentile/t-digest; exact is the oracle anchor.)
  // ---------------------------------------------------------------------------
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))").as("q"))
      .selectExpr("event_type", "q[0] AS p25", "q[1] AS p50", "q[2] AS p75", "q[3] AS p95")
  }
  val quantilesSql: String =
    """SELECT event_type,
      |       quantile_cont(value, 0.25) AS p25,
      |       quantile_cont(value, 0.50) AS p50,
      |       quantile_cont(value, 0.75) AS p75,
      |       quantile_cont(value, 0.95) AS p95
      |FROM events GROUP BY event_type
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Native session-window aggregation — the SAME 30-minute-gap semantics as
  // q_sessionize, expressed through Spark's built-in `session_window`
  // (dynamic gap windows merged inside the aggregate) instead of the
  // gaps-and-islands window chain. Two engine paths, one relation: the
  // oracle replays the islands form and must produce identical sessions
  // with `sess_close = last event + gap` (the session_window upper bound).
  // This is also the exact aggregate the STREAMING sessionizer emits, so
  // batch/stream parity holds through a single native operator. One
  // shuffle on user_id; the merge of overlapping windows is map-side.
  // ---------------------------------------------------------------------------
  def sessionWindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(D($"value")).cast("double").as("sum_value"))
      .select($"user_id", $"sw.start".as("sess_start"), $"sw.end".as("sess_close"),
        $"n_events", $"sum_value")
  }
  val sessionWindowAggSql: String =
    """WITH x AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
      |         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1
      |                 ELSE 0 END AS new_sess
      |  FROM x),
      |z AS (
      |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS sess_seq
      |  FROM y)
      |SELECT user_id, min(ts) AS sess_start,
      |       max(ts) + INTERVAL 30 MINUTE AS sess_close,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, sess_seq
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Ordered string aggregation (the STRING_AGG ... ORDER BY shape): each
  // user's full event-type journey as one '>'-joined string — the
  // clickstream-path relation sequence-mining and UX funnels read. Spark
  // has no ordered string_agg, so the deterministic rewrite collects
  // (ts, event_id, type) structs, sorts the ARRAY (struct order =
  // lexicographic on the total (ts, id) key — partitioning-independent),
  // and joins map-side; DuckDB uses its native ORDER BY clause. Both must
  // emit byte-identical paths. One shuffle on user_id.
  // ---------------------------------------------------------------------------
  def eventPath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", struct(unix_micros($"ts").as("us"),
        $"event_id", $"event_type").as("e"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"e")).as("es"))
      .selectExpr("user_id",
        "CAST(size(es) AS BIGINT) AS n_events",
        "array_join(transform(es, x -> x.event_type), '>') AS path")
  }
  val eventPathSql: String =
    """SELECT user_id, count(*) AS n_events,
      |       string_agg(event_type, '>'
      |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS path
      |FROM events
      |GROUP BY user_id
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // DAU / MAU engagement ("stickiness"): per calendar month, the distinct
  // monthly actives, the per-day active sum, and their ratio — the
  // product-health number every activity dashboard leads with. Exact
  // shape: dedup to (user, day) once (the cohort-retention contract —
  // the shuffled relation is bounded by user-days, not events), derive
  // BOTH grains from that relation, and finish with one shared division.
  // Month keys are integer year*100+month — no date-type round-trips.
  // ---------------------------------------------------------------------------
  def dauMau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val userDays = graft.Materialize.lazyCut(
      Tables.events(s, dir)
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000").as("epoch_day"),
          expr("year(ts) * 100 + month(ts)").as("ym"))
        .distinct())
    val dau = userDays.groupBy($"ym", $"epoch_day")
      .agg(count(lit(1)).as("dau"))
      .groupBy($"ym")
      .agg(sum($"dau").cast("long").as("sum_dau"),
        count(lit(1)).as("n_days"))
    val mau = userDays.select($"ym", $"user_id").distinct()
      .groupBy($"ym").agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("ym"))
      .select($"ym", $"mau", $"sum_dau", $"n_days",
        ($"sum_dau".cast("double") / ($"n_days" * $"mau").cast("double"))
          .as("stickiness"))
  }
  val dauMauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS epoch_day,
      |         year(CAST(ts AS TIMESTAMP)) * 100 + month(CAST(ts AS TIMESTAMP)) AS ym
      |  FROM events),
      |d AS (SELECT ym, CAST(sum(dau) AS BIGINT) AS sum_dau, count(*) AS n_days
      |      FROM (SELECT ym, epoch_day, count(*) AS dau FROM ud GROUP BY 1, 2)
      |      GROUP BY ym),
      |m AS (SELECT ym, count(*) AS mau
      |      FROM (SELECT DISTINCT ym, user_id FROM ud) GROUP BY ym)
      |SELECT d.ym, m.mau, d.sum_dau, d.n_days,
      |       CAST(d.sum_dau AS DOUBLE) / CAST(d.n_days * m.mau AS DOUBLE) AS stickiness
      |FROM d JOIN m ON d.ym = m.ym
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Running DISTINCT count over a window — SQL engines (Spark and DuckDB
  // both) reject COUNT(DISTINCT) OVER, so the standard rewrite is spelled
  // out as an operator: flag each row that is the FIRST occurrence of its
  // (user, event_type), then running-sum the flags over the user's
  // timeline. Per-user "how many distinct behaviors has this user shown by
  // now" — the engagement-breadth feature. Two window passes (the flag
  // partitioning refines the timeline partitioning, so the second exchange
  // is key-prefix-local at scale); total (ts, event_id) tie order keeps
  // both engines on the identical row sequence.
  // ---------------------------------------------------------------------------
  def runningDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wFirst = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    val wRun = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .withColumn("first_flag",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_so_far", sum($"first_flag").over(wRun))
      .select($"event_id", $"user_id", $"n_types_so_far")
  }
  val runningDistinctSql: String =
    """WITH f AS (
      |  SELECT event_id, user_id,
      |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
      |              THEN 1 ELSE 0 END AS first_flag,
      |         CAST(ts AS TIMESTAMP) AS ts
      |  FROM events)
      |SELECT event_id, user_id,
      |       CAST(sum(first_flag) OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS n_types_so_far
      |FROM f
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Ordered-set aggregates with DISCRETE selection semantics — mode and
  // percentile_disc, the aggregates whose engine-default tie rules differ
  // (and so must be spelled out): mode breaks count ties toward the
  // SMALLEST value; median/p90 are the smallest value whose cumulative
  // count reaches the rank (percentile_disc, never interpolation).
  //
  // Scale shape: everything runs on the VALUE-COMPRESSED distribution —
  // one corpus aggregate to (type, cents, cnt), then windows/argmax over
  // that relation, which is bounded by distinct values per group, not rows.
  // The corpus is never globally sorted; exact selection at 100 TB is a
  // two-pass rank-then-probe over the compressed counts, which is exactly
  // this plan.
  // ---------------------------------------------------------------------------
  def orderedStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Materialize.lazyCut(
      Tables.events(s, dir)
        .select($"event_type", expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy($"event_type", $"cents").agg(count(lit(1)).as("cnt")))
    val cum = counts
      .withColumn("cum", sum($"cnt").over(
        Window.partitionBy($"event_type").orderBy($"cents".asc)))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"event_type")))
    val med = cum.filter($"cum" >= expr("(n + 1) div 2"))
      .groupBy($"event_type").agg(min($"cents").as("median_cents"))
    val p90 = cum.filter($"cum" >= expr("(9 * n + 9) div 10"))
      .groupBy($"event_type").agg(min($"cents").as("p90_cents"))
    val mode = counts
      .groupBy($"event_type")
      .agg(max(struct($"cnt", (-$"cents").as("neg"))).as("m"))
      .select($"event_type", $"m.cnt".as("mode_n"), (-$"m.neg").as("mode_cents"))
    val n = counts.groupBy($"event_type").agg(sum($"cnt").cast("long").as("n"))
    n.join(broadcast(mode), Seq("event_type"))
      .join(broadcast(med), Seq("event_type"))
      .join(broadcast(p90), Seq("event_type"))
      .select($"event_type", $"n", $"mode_cents", $"mode_n",
        $"median_cents", $"p90_cents")
  }
  val orderedStatsSql: String =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |counts AS (SELECT event_type, cents, count(*) AS cnt FROM v GROUP BY 1, 2),
      |cum AS (SELECT *,
      |               sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
      |               sum(cnt) OVER (PARTITION BY event_type) AS n
      |        FROM counts),
      |med AS (SELECT event_type, min(cents) AS median_cents
      |        FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |p90 AS (SELECT event_type, min(cents) AS p90_cents
      |        FROM cum WHERE cum >= (9 * n + 9) // 10 GROUP BY 1),
      |mx AS (SELECT event_type, max(cnt) AS mode_n FROM counts GROUP BY 1),
      |mode AS (SELECT counts.event_type, min(cents) AS mode_cents, mx.mode_n
      |         FROM counts JOIN mx ON counts.event_type = mx.event_type
      |                            AND counts.cnt = mx.mode_n
      |         GROUP BY counts.event_type, mx.mode_n),
      |nrel AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM counts GROUP BY 1)
      |SELECT nrel.event_type, nrel.n, mode.mode_cents, mode.mode_n,
      |       med.median_cents, p90.p90_cents
      |FROM nrel JOIN mode USING (event_type)
      |          JOIN med USING (event_type)
      |          JOIN p90 USING (event_type)
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Inter-arrival cadence profile: per event_type, the p50/p95 of the
  // per-user gap between consecutive events of that type — the
  // arrival-rate signal behind rate limiting, bot detection, and
  // freshness SLOs. Gaps are integer µs, so interpolated percentiles are
  // half-integers (exact binary rationals — the q_mad_anomalies
  // determinism argument). One user-keyed window pass + one per-type
  // percentile aggregate.
  // ---------------------------------------------------------------------------
  def interarrival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .filter($"prev_us".isNotNull)
      .select($"event_type", (unix_micros($"ts") - $"prev_us").as("gap_us"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_us, 0.5)").as("p50_gap_us"),
        expr("percentile(gap_us, 0.95)").as("p95_gap_us"),
        min($"gap_us").as("min_gap_us"), max($"gap_us").as("max_gap_us"))
  }
  val interarrivalSql: String =
    """WITH e AS (
      |  SELECT event_type, user_id, event_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |         us - lag(us) OVER (PARTITION BY user_id, event_type
      |                            ORDER BY us, event_id) AS gap_us
      |  FROM e)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |       quantile_cont(gap_us, 0.5) AS p50_gap_us,
      |       quantile_cont(gap_us, 0.95) AS p95_gap_us,
      |       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
      |       CAST(max(gap_us) AS BIGINT) AS max_gap_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Robust anomaly detection — median/MAD outlier flags per event_type
  // (the robust z-score every monitoring pipeline runs; mean/stddev are
  // poisoned by the outliers they are meant to find). Cross-engine
  // bit-exactness by construction: values enter as integer CENTS, the
  // interpolated median of integers is a half-integer (exact in binary),
  // |x − med| is a half-integer, MAD is a quarter-integer — every quantity
  // is an exact binary rational, so the strict `> 3·MAD` comparison can
  // never waver in the last ulp. (The 1.4826 normal-consistency constant
  // is deliberately omitted: it is not exactly representable; 3·MAD is the
  // documented fence.) Two grouped percentile passes + one broadcast-back
  // join — the corpus shuffles on event_type only.
  // ---------------------------------------------------------------------------
  def madAnomalies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .selectExpr("event_id", "event_type",
        "cast(round(value * 100) as bigint) AS cents")
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .selectExpr("event_type", "med", "abs(cents - med) AS adev")
      .groupBy($"event_type", $"med")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    ev.join(broadcast(mad), "event_type")
      .selectExpr("event_id", "event_type", "cents", "med", "mad",
        "abs(cents - med) > 3 * mad AS is_anomaly")
      .filter($"is_anomaly")
      .select($"event_id", $"event_type", $"cents", $"med", $"mad")
  }
  val madAnomaliesSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM ev GROUP BY 1),
      |mad AS (
      |  SELECT ev.event_type, med, quantile_cont(abs(cents - med), 0.5) AS mad
      |  FROM ev JOIN med ON ev.event_type = med.event_type
      |  GROUP BY ev.event_type, med)
      |SELECT event_id, ev.event_type, cents, med, mad
      |FROM ev JOIN mad ON ev.event_type = mad.event_type
      |WHERE abs(cents - med) > 3 * mad
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Three-step funnel (signup → click → purchase, in order): generalizes
  // q_funnel's conditional-min trick to a CHAIN — each stage's timestamp
  // is the min event at-or-after the PREVIOUS stage's, so an early click
  // before signup never counts. Two grouped left joins, each shuffling on
  // the user key only; no window over the raw stream, no per-user event
  // arrays. reached ∈ {1,2,3} is the step count; µs gaps are integer
  // arithmetic so the oracle hash-matches.
  // ---------------------------------------------------------------------------
  def funnel3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val s2 = s1.join(ev.filter($"event_type" === "click")
        .select($"user_id", $"ts"), Seq("user_id"), "left")
      .groupBy($"user_id", $"signup_ts")
      .agg(min(when($"ts" >= $"signup_ts", $"ts")).as("click_ts"))
    val s3 = s2.join(ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts"), Seq("user_id"), "left")
      .groupBy($"user_id", $"signup_ts", $"click_ts")
      .agg(min(when($"ts" >= $"click_ts", $"ts")).as("purchase_ts"))
    s3.selectExpr(
      "user_id", "signup_ts", "click_ts", "purchase_ts",
      "CAST(1 + IF(click_ts IS NOT NULL, 1, 0) + IF(purchase_ts IS NOT NULL, 1, 0) AS INT) AS reached",
      "(unix_micros(click_ts) - unix_micros(signup_ts)) div 1000000 AS secs_to_click",
      "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000 AS secs_to_purchase")
  }
  val funnel3Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT s1.user_id, s1.signup_ts,
      |         min(CASE WHEN CAST(e.ts AS TIMESTAMP) >= s1.signup_ts THEN CAST(e.ts AS TIMESTAMP) END) AS click_ts
      |  FROM s1 LEFT JOIN events e
      |    ON e.user_id = s1.user_id AND e.event_type = 'click'
      |  GROUP BY s1.user_id, s1.signup_ts),
      |s3 AS (
      |  SELECT s2.user_id, s2.signup_ts, s2.click_ts,
      |         min(CASE WHEN CAST(e.ts AS TIMESTAMP) >= s2.click_ts THEN CAST(e.ts AS TIMESTAMP) END) AS purchase_ts
      |  FROM s2 LEFT JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |  GROUP BY s2.user_id, s2.signup_ts, s2.click_ts)
      |SELECT user_id, signup_ts, click_ts, purchase_ts,
      |       CAST(1 + CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END
      |              + CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached,
      |       (epoch_us(click_ts) - epoch_us(signup_ts)) // 1000000 AS secs_to_click,
      |       (epoch_us(purchase_ts) - epoch_us(click_ts)) // 1000000 AS secs_to_purchase
      |FROM s3
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Path mining: the most common 3-step event sequences across user
  // journeys — the session-path analytics behind "users who do X then Y
  // then Z". Trigrams come from two LEAD windows over the per-user
  // event-time order (total ordering via the event_id tie-break, so both
  // engines see identical sequences); one shuffle to the user key, then
  // a count aggregate and a top-20 TakeOrdered. Generalizes the pairwise
  // transition matrix (q_transitions) to order-3 paths.
  // ---------------------------------------------------------------------------
  def pathTrigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type".as("step1"))
      .withColumn("step2", lead($"step1", 1).over(w))
      .withColumn("step3", lead($"step1", 2).over(w))
      .filter($"step3".isNotNull)
      .groupBy($"step1", $"step2", $"step3")
      .agg(count(lit(1)).as("n_paths"))
      .orderBy($"n_paths".desc, $"step1".asc, $"step2".asc, $"step3".asc)
      .limit(20)
  }
  val pathTrigramsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS step1,
      |         lead(event_type, 1) OVER w AS step2,
      |         lead(event_type, 2) OVER w AS step3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
      |SELECT step1, step2, step3, count(*) AS n_paths
      |FROM seq WHERE step3 IS NOT NULL
      |GROUP BY step1, step2, step3
      |ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
      |LIMIT 20
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Gaps-and-islands: per customer, the longest streak of CONSECUTIVE
  // order days plus activity/gap totals. The island key is the classic
  // `day - row_number()` trick — consecutive days share it, any gap
  // shifts it — computed in epoch-day integer space so both engines
  // subtract exact integers. One shuffle to the customer key; the
  // window, the island rollup, and the final per-customer aggregate all
  // reuse that partitioning.
  // ---------------------------------------------------------------------------
  def orderStreaks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"d")
    val days = Tables.orders(s, dir)
      .selectExpr("o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS d")
      .distinct()
    val islands = days
      .withColumn("grp", $"d" - row_number().over(w))
      .groupBy($"o_custkey", $"grp").agg(count(lit(1)).as("len"))
    islands.groupBy($"o_custkey")
      .agg(
        sum($"len").as("n_active_days"),
        max($"len").as("longest_streak"),
        count(lit(1)).as("n_islands"))
  }
  val orderStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT o_custkey,
      |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d
      |  FROM orders),
      |islands AS (
      |  SELECT o_custkey, d - row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS grp
      |  FROM days),
      |runs AS (
      |  SELECT o_custkey, grp, count(*) AS len
      |  FROM islands GROUP BY o_custkey, grp)
      |SELECT o_custkey,
      |       CAST(sum(len) AS BIGINT) AS n_active_days,
      |       CAST(max(len) AS BIGINT) AS longest_streak,
      |       count(*) AS n_islands
      |FROM runs GROUP BY o_custkey
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Market-basket association (event-type co-occurrence): for every pair
  // of event types, how many users do both, and is that more than chance?
  // support = P(a∧b), confidence = P(b|a), lift = P(a∧b)/(P(a)·P(b)).
  // The basket relation is the DISTINCT (user, type) projection — one
  // shuffle, after which the per-user pair expansion is bounded by the
  // type-vocabulary size squared (tiny), never by event volume. Counts are
  // exact integers; each ratio is a fixed chain of IEEE ops on them.
  // ---------------------------------------------------------------------------
  def basketLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one basket row per (user, type); feeds three consumers
    val ut = graft.Materialize.lazyCut(
      Tables.events(s, dir).select($"user_id", $"event_type").distinct())
    val nu = ut.agg(countDistinct($"user_id").as("n_users"))
    val tc = ut.groupBy($"event_type").agg(count(lit(1)).as("n_t"))
    val pairs = ut.select($"user_id", $"event_type".as("type_a"))
      .join(ut.select($"user_id", $"event_type".as("type_b")), "user_id")
      .filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(tc.select($"event_type".as("type_a"), $"n_t".as("n_a"))), "type_a")
      .join(broadcast(tc.select($"event_type".as("type_b"), $"n_t".as("n_b"))), "type_b")
      .crossJoin(broadcast(nu))
      .selectExpr(
        "type_a", "type_b", "n_ab", "n_a", "n_b", "n_users",
        "CAST(n_ab AS DOUBLE) / n_users AS support",
        "CAST(n_ab AS DOUBLE) / n_a AS confidence",
        "CAST(n_ab AS DOUBLE) * n_users / (CAST(n_a AS DOUBLE) * n_b) AS lift")
  }
  val basketLiftSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
      |tc AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_ab,
      |       ta.n_t AS n_a, tb.n_t AS n_b, n_users,
      |       CAST(n_ab AS DOUBLE) / n_users AS support,
      |       CAST(n_ab AS DOUBLE) / ta.n_t AS confidence,
      |       CAST(n_ab AS DOUBLE) * n_users / (CAST(ta.n_t AS DOUBLE) * tb.n_t) AS lift
      |FROM pairs
      |JOIN tc ta ON ta.event_type = type_a
      |JOIN tc tb ON tb.event_type = type_b
      |CROSS JOIN nu
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // A/B experiment readout: users are assigned to arms by md5 parity (the
  // same deterministic hash-split used for train/val — no RNG, so both
  // engines assign identically and a rerun reproduces the experiment),
  // the metric is "power purchaser" (>= 14 purchase events), and the
  // readout is the two-proportion pooled z-score, guarded against a
  // degenerate experiment: if either everyone or no one converts the
  // pooled variance is exactly 0 and the z-score is emitted as NULL
  // instead of a silent division-by-zero NaN/Infinity. Counts are exact
  // integers; the z is a fixed chain of IEEE ops (divisions and one
  // correctly-rounded sqrt) on those integers, so the oracle hash-matches.
  // One distinct-aggregation over the fact, then scalar land.
  // ---------------------------------------------------------------------------
  def abTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg((sum(when($"event_type" === "purchase", 1L).otherwise(0L)) >= 14)
        .cast("long").as("converted"))
      .selectExpr(
        "CASE WHEN cast(conv(substr(md5(cast(cast(user_id as string) as binary)), 1, 4), 16, 10) as int) % 2 = 0 THEN 'A' ELSE 'B' END AS arm",
        "converted")
    users.groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"converted").as("conv"))
      .agg(
        sum(when($"arm" === "A", $"n")).as("n_a"),
        sum(when($"arm" === "A", $"conv")).as("conv_a"),
        sum(when($"arm" === "B", $"n")).as("n_b"),
        sum(when($"arm" === "B", $"conv")).as("conv_b"))
      .selectExpr(
        "n_a", "conv_a", "n_b", "conv_b",
        "CAST(conv_a AS DOUBLE) / n_a AS rate_a",
        "CAST(conv_b AS DOUBLE) / n_b AS rate_b",
        "CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN CAST(NULL AS DOUBLE) ELSE " +
          "(CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / " +
          "sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (CAST(1.0 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)) END AS z_score")
  }
  val abTestSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14 AS INT) AS converted
      |  FROM events GROUP BY user_id),
      |armed AS (
      |  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INT % 2 = 0
      |              THEN 'A' ELSE 'B' END AS arm, converted
      |  FROM u),
      |g AS (SELECT arm, count(*) AS n, sum(converted) AS conv FROM armed GROUP BY arm),
      |t AS (SELECT
      |        CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
      |        CAST(sum(CASE WHEN arm = 'A' THEN conv END) AS BIGINT) AS conv_a,
      |        CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b,
      |        CAST(sum(CASE WHEN arm = 'B' THEN conv END) AS BIGINT) AS conv_b
      |      FROM g)
      |SELECT n_a, conv_a, n_b, conv_b,
      |       CAST(conv_a AS DOUBLE) / n_a AS rate_a,
      |       CAST(conv_b AS DOUBLE) / n_b AS rate_b,
      |       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN CAST(NULL AS DOUBLE) ELSE
      |         (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
      |         sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (CAST(1.0 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)) END AS z_score
      |FROM t
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Chi-square independence test: is event_type independent of weekday?
  // The full R×C grid (cross join of the two marginal-total relations,
  // observed counts left-joined so zero cells participate), expected
  // E = row·col/N, χ² = Σ (O-E)²/E. Everything is integer-exact up to
  // the per-cell division; the SUM of the irrational per-cell terms would
  // be partition-order-dependent as doubles, so each term is rounded to
  // DECIMAL(28,10) first and the decimal sum is exact — the same
  // order-independence trick as the integer-cents moments in corrStats.
  // Scale: one count aggregation over the fact; everything after is
  // R×C-sized (broadcast land).
  // ---------------------------------------------------------------------------
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Materialized once: cells feeds four consumers (row totals, column
    // totals, grand total, and the grid join) — without the barrier each
    // would re-scan and re-aggregate the fact (4 scans, plan-gated to 1).
    val cells = graft.Materialize.lazyCut(Tables.events(s, dir)
      .selectExpr("event_type", "dayofweek(ts) - 1 AS dow")
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("o")))
    val rt = cells.groupBy($"event_type").agg(sum($"o").as("rt"))
    val ct = cells.groupBy($"dow").agg(sum($"o").as("ct"))
    val n = cells.agg(sum($"o").as("n"))
    rt.crossJoin(ct).crossJoin(broadcast(n))
      .join(cells, Seq("event_type", "dow"), "left")
      .selectExpr("event_type", "dow", "rt", "ct", "n", "coalesce(o, 0L) AS o")
      .selectExpr(
        "CAST((o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "* (o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "/ (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(28,10)) AS term",
        "event_type", "dow")
      .agg(
        sum($"term").cast("double").as("chi2"),
        ((countDistinct($"event_type") - 1) * (countDistinct($"dow") - 1)).as("dof"))
  }
  val chiSquareSql: String =
    """WITH cells AS (
      |  SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |grid AS (
      |  SELECT rt.event_type, ct.dow, rt.rt, ct.ct, nn.n,
      |         COALESCE(cells.o, 0) AS o
      |  FROM rt CROSS JOIN ct CROSS JOIN nn
      |  LEFT JOIN cells ON cells.event_type = rt.event_type AND cells.dow = ct.dow)
      |SELECT CAST(sum(CAST(
      |         (o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |       AS DECIMAL(28,10))) AS DOUBLE) AS chi2,
      |       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof
      |FROM grid
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Winsorization (per-group outlier clipping): clip each event's value to
  // its group's [p05, p95] band and report the clipped aggregate — the
  // standard robust-statistics pre-step before a mean/sum that outliers
  // would otherwise dominate. Two passes: exact per-group percentile
  // bounds (one shuffle), then a BROADCAST join of the tiny bounds table
  // back onto the fact (the corpus never reshuffles for the clip) and the
  // final per-group aggregate. The clipped sum is decimal-accumulated
  // (repo rule: never sum raw doubles cross-engine).
  // ---------------------------------------------------------------------------
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type", $"value")
    val bounds = ev.groupBy($"event_type")
      .agg(expr("percentile(value, array(0.05, 0.95))").as("b"))
      .selectExpr("event_type", "b[0] AS lo", "b[1] AS hi")
    // Integer-cent clipping: the interpolated bounds are snapped OUTWARD to
    // whole cents with tie-free floor/ceil (a decimal cast of an
    // interpolated double can land on an exactly-representable .xx5 tie,
    // where Spark rounds half-up and DuckDB half-even — a raw parquet
    // value never does, a percentile midpoint can). Values become exact
    // cents via the proven DECIMAL(18,2) cast; the clipped sum is then an
    // exact integer reduction.
    ev.join(broadcast(bounds), "event_type")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc",
        "CAST(floor(lo * 100) AS BIGINT) AS loc",
        "CAST(ceil(hi * 100) AS BIGINT) AS hic")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"vc" < $"loc", 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when($"vc" > $"hic", 1L).otherwise(0L)).as("n_clipped_high"),
        // the EXPOSED bounds are the snapped integer cents, not the raw
        // interpolated percentile doubles — every output column stays
        // derived from exact integers (two engines' quantile interpolation
        // orderings need not agree to the last ulp)
        min($"loc").as("lo_cents"),
        min($"hic").as("hi_cents"),
        (sum(least(greatest($"vc", $"loc"), $"hic")).cast("double")
          / lit(100).cast("double")).as("sum_winsorized"))
  }
  val winsorizeSql: String =
    """WITH b AS (
      |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
      |         quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY event_type),
      |c AS (
      |  SELECT events.event_type,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
      |         CAST(floor(lo * 100) AS BIGINT) AS loc,
      |         CAST(ceil(hi * 100) AS BIGINT) AS hic
      |  FROM events JOIN b USING (event_type))
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(CASE WHEN vc < loc THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
      |       CAST(sum(CASE WHEN vc > hic THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
      |       min(loc) AS lo_cents, min(hic) AS hi_cents,
      |       CAST(sum(least(greatest(vc, loc), hic)) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_winsorized
      |FROM c
      |GROUP BY event_type
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Shipping-priority (TPC-H Q3 shape): the fact-to-fact join — orders ⋈
  // lineitem on orderkey. Filters push into both scans first; the aggregate
  // groups on the join key so it adds no extra shuffle; top-10 via
  // TakeOrderedAndProject. Verified at test scale: AQE converts the join to
  // broadcast because the date-filtered orders side fits under the threshold
  // — the right call; at 100 TB the same plan becomes a sort-merge join
  // shuffling once on orderkey, or no shuffle at all when both facts are
  // bucketed on it (ScaleSpec proves the bucketed plan has no Exchange).
  // ---------------------------------------------------------------------------
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-15 00:00:00"))
    val cust = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > cutoff)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(D($"l_extendedprice") * (lit(new java.math.BigDecimal(1)) - D($"l_discount", 8)))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }
  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Local-volume (TPC-H Q5 shape): a 5-way join mixing one fact-fact shuffle
  // (orders ⋈ lineitem) with broadcast dims (customer-side filter via nation/
  // region). Per-nation revenue.
  // ---------------------------------------------------------------------------
  def localVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(sum(D($"l_extendedprice") * (lit(new java.math.BigDecimal(1)) - D($"l_discount", 8)))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name".asc)
  }
  val localVolumeSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Hierarchical rollup (OLAP extension): subtotals per (flag, status), per
  // flag, and grand total in ONE pass — Expand + single aggregation, the
  // shape dashboards need without issuing three queries.
  // ---------------------------------------------------------------------------
  def rollupSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spreadForAgg: the Expand + partial agg run above the exchange —
    // no checkpoint needed (see sumMetrics)
    graft.Materialize.spreadForAgg(Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity"))
      .rollup($"l_returnflag", $"l_linestatus")
      // long-cents accumulation, not DECIMAL(28,2): the Expand feeds every
      // input row to each grouping set, so a BigDecimal-backed sum buffer
      // multiplies through the expansion (measured 14.9x on 10x data at
      // ~sf1). Σ round(q·100) / 100 is the same exact rational as the
      // decimal sum, and both double conversions are correctly rounded
      // while the cents sum stays under 2^53 (≈sf100) — identical bits.
      .agg(
        sum(expr("cast(round(l_quantity * cast(100 as double)) as bigint)"))
          .as("qc"),
        count(lit(1)).as("cnt"))
      .selectExpr("l_returnflag", "l_linestatus",
        "cast(qc as double) / cast(100 as double) AS sum_qty", "cnt")
  }
  val rollupSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |""".stripMargin

  /** Cube companion of the rollup (§2.4 completeness): all 2^k grouping
    * combinations in one pass — same partial+final aggregation, the
    * grouping-set expansion happens map-side (each input row feeds its 4
    * grouping sets before the shuffle, so the shuffle carries grouped
    * partials, not 4× the input). */
  def cubeSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spreadForAgg: same rationale as rollupSummary
    graft.Materialize.spreadForAgg(Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity"))
      .cube($"l_returnflag", $"l_linestatus")
      // same long-cents rationale as rollupSummary (4-way Expand here)
      .agg(
        sum(expr("cast(round(l_quantity * cast(100 as double)) as bigint)"))
          .as("qc"),
        count(lit(1)).as("cnt"))
      .selectExpr("l_returnflag", "l_linestatus",
        "cast(qc as double) / cast(100 as double) AS sum_qty", "cnt")
  }
  val cubeSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // RFM customer segmentation (the classic marketing mart): per customer,
  // recency (days since last order, vs the corpus max date), frequency
  // (order count), monetary (exact decimal total in cents); each metric is
  // bucketed into quintiles and the (r, f, m) segment grid is rolled up.
  // Scale shape: NOT a global ntile (that is one single-partition sort) —
  // the exact 20/40/60/80th cutoffs are computed once and broadcast back,
  // so bucketing is scan-stage arithmetic and the only shuffles are the
  // per-customer aggregate and the tiny segment rollup. Determinism:
  // cutoffs are type-7 interpolated percentiles (bit-identical in both
  // engines, the q_quantiles precedent); metrics are exact integers, so
  // the > comparisons cannot drift.
  // ---------------------------------------------------------------------------
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS p")
    val dmax = o.agg(max($"d").as("dmax"))
    val per = graft.Materialize.lazyCut(
      o.groupBy($"o_custkey")
        .agg(max($"d").as("last_d"), count(lit(1)).as("frequency"),
          sum($"p").as("mon"))
        .crossJoin(broadcast(dmax))
        .selectExpr("o_custkey",
          "cast(datediff(dmax, last_d) as bigint) AS recency",
          "frequency",
          "cast(mon * 100 as double) AS monetary_cents"))
    val cuts = per.agg(
      expr("percentile(recency, array(0.2, 0.4, 0.6, 0.8))").as("rc"),
      expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))").as("fc"),
      expr("percentile(monetary_cents, array(0.2, 0.4, 0.6, 0.8))").as("mc"))
    def bucket(c: String, cut: String) =
      s"1 + cast($c > $cut[0] as int) + cast($c > $cut[1] as int)" +
        s" + cast($c > $cut[2] as int) + cast($c > $cut[3] as int)"
    per.crossJoin(broadcast(cuts))
      .selectExpr("o_custkey",
        s"cast(${bucket("recency", "rc")} as bigint) AS r_bucket",
        s"cast(${bucket("frequency", "fc")} as bigint) AS f_bucket",
        s"cast(${bucket("monetary_cents", "mc")} as bigint) AS m_bucket")
      .groupBy($"r_bucket", $"f_bucket", $"m_bucket")
      .agg(count(lit(1)).as("n_customers"))
  }
  val rfmSegmentsSql: String = {
    def bucket(c: String, cut: String) =
      s"1 + CAST($c > $cut[1] AS INT) + CAST($c > $cut[2] AS INT)" +
        s" + CAST($c > $cut[3] AS INT) + CAST($c > $cut[4] AS INT)"
    s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
       |                  CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
       |mx AS (SELECT max(d) AS dmax FROM o),
       |per AS (
       |  SELECT o_custkey,
       |         CAST(datediff('day', max(d), (SELECT dmax FROM mx)) AS BIGINT) AS recency,
       |         count(*) AS frequency,
       |         CAST(sum(p) * 100 AS DOUBLE) AS monetary_cents
       |  FROM o GROUP BY o_custkey),
       |cuts AS (
       |  SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rc,
       |         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
       |         quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS mc
       |  FROM per)
       |SELECT CAST(${bucket("recency", "rc")} AS BIGINT) AS r_bucket,
       |       CAST(${bucket("frequency", "fc")} AS BIGINT) AS f_bucket,
       |       CAST(${bucket("monetary_cents", "mc")} AS BIGINT) AS m_bucket,
       |       count(*) AS n_customers
       |FROM per CROSS JOIN cuts
       |GROUP BY 1, 2, 3
       |""".stripMargin
  }

  /** NTILE percentile bucketing (§2.5 completeness): assign every order to
    * a salary-style decile of o_totalprice per priority class — the window
    * primitive behind quantile-bucket features. Deterministic: the window
    * order tie-breaks on the key. One shuffle on the partition column. */
  def ntileBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderpriority",
        ntile(10).over(w).cast("long").as("decile"))
  }
  val ntileBucketsSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |       ntile(10) OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
      |FROM orders
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Pivot / crosstab (OLAP extension): order counts per priority with one
  // column per order status — `groupBy.pivot` with explicit values, which
  // compiles to conditional aggregates in ONE pass (no per-status query,
  // no second shuffle). Explicit value list matters at scale: without it
  // Spark runs an extra distinct job to discover the columns.
  // ---------------------------------------------------------------------------
  def pivotStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .toDF("o_orderpriority", "n_f", "n_o", "n_p")
      .orderBy($"o_orderpriority")
  }
  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
      |       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
      |       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Running total (cumulative window): each customer's order spend as a
  // running sum in date order — the classic balance/burn-down query.
  // Exact DECIMAL accumulation (summation order is the window order, so a
  // double would drift between engines); ties broken on order key.
  // Scale: one shuffle on the customer key, per-partition sort.
  // ---------------------------------------------------------------------------
  def runningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey",
        sum(D($"o_totalprice")).over(w).cast("double").as("running_spend"))
  }
  val runningTotalSql: String =
    """SELECT o_custkey, o_orderdate, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_spend
      |FROM orders
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Top-N per group (window row_number — the per-entity-leaderboard shape):
  // each customer's 3 most expensive orders.
  // Scale: one shuffle on the group key; per-partition sort bounded by
  // group size. Tie-broken on order key for determinism.
  // ---------------------------------------------------------------------------
  def topnPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
  }
  val topnPerGroupSql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Approximate aggregates (100 TB path). HLL and quantile sketch VALUES are
  // engine-specific, so the raw estimates cannot hash-match a DuckDB oracle
  // — but their ERROR CONTRACTS can: the query emits the exact aggregates
  // plus one boolean per sketch asserting the estimate landed inside its
  // documented bound, and the oracle expects exactly those exacts with both
  // booleans TRUE. A sketch regression (or a Spark upgrade changing HLL
  // internals beyond its contract) now fails the driver gate loudly
  // instead of hiding behind a rows-only check.
  //   - approx_count_distinct: default rsd 5%; gate at 3·rsd = 15%.
  //   - approx_percentile(accuracy=1000): rank error ≤ 1/1000 of the
  //     group; gate against the exact values at ranks 0.5 ± 0.02 (20× the
  //     guarantee — the gate tests the CONTRACT, not sketch luck).
  // At scale these replace exact distinct/percentile: mergeable sketches,
  // partial aggregation, no sort, bounded memory.
  // ---------------------------------------------------------------------------
  def approxStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type", $"user_id", $"value")
    // Mixing one DISTINCT aggregate with four plain ones makes the planner
    // Expand every input row per aggregate group, and the doubled stream
    // flows through the sort-buffering exact percentile. Keep the sketch
    // aggregate Expand-free and compute the exact-distinct companion as its
    // own two-level (partial-agg friendly) count, joined back on the tiny
    // event_type key.
    val sketches = ev
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id").as("approx_users"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        expr("percentile(value, array(0.48, 0.52))").as("p_bounds"),
        count(lit(1)).as("cnt"))
    val exact = ev.groupBy($"event_type", $"user_id").agg(count(lit(1)))
      .groupBy($"event_type").agg(count(lit(1)).as("exact_users"))
    sketches.join(broadcast(exact), Seq("event_type"))
      .select($"event_type", $"exact_users", $"cnt",
        (abs($"approx_users" - $"exact_users").cast("double")
          / $"exact_users".cast("double") <= 0.15).as("hll_within_bounds"),
        ($"approx_p50" >= $"p_bounds"(0) && $"approx_p50" <= $"p_bounds"(1))
          .as("p50_within_bounds"))
  }
  val approxStatsSql: String =
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       count(*) AS cnt,
      |       TRUE AS hll_within_bounds,
      |       TRUE AS p50_within_bounds
      |FROM events
      |GROUP BY event_type
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  // Spark): per-day sketches are aggregated ONCE and stored; any coarser
  // rollup (here monthly) unions the stored sketches WITHOUT touching raw
  // rows — the 100 TB distinct-counting path, the sketch twin of
  // q_reagg_month's exact mergeable partials. DuckDB has no compatible
  // sketch binary, so the oracle follows the q_approx_stats contract: it
  // computes the exact distinct companion and the estimate is checked as a
  // within-ε boolean (lgK=12 → rsd ≈ 1.6%; ε = 10% is a wide documented
  // bound). n_days proves the union really merged multiple stored partials.
  // ---------------------------------------------------------------------------
  private val hllDailyCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** The stored daily sketch artifact: one (event_type, day) row with a
    * BINARY sketch column, persisted as parquet and READ BACK — the
    * returned relation's lineage starts at the files, so every rollup
    * provably unions stored bytes, never raw rows. Same at-rest contract
    * as the span-hash index / trained IVF layout: built once per
    * (session, dir), maintained between ingests in a real pipeline. */
  def hllDailyAtRest(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(hllDailyCache, s, dir) {
      import s.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_hll_daily_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.events(s, dir)
        .selectExpr("event_type", "user_id", "cast(ts as date) AS d")
        .groupBy($"event_type", $"d")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }

  def hllReagg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .selectExpr("event_type", "user_id", "cast(ts as date) AS d")
    // the stored daily artifact (parquet round-trip, binary sketch column)
    val daily = hllDailyAtRest(s, dir)
    val monthly = daily
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"),
        count(lit(1)).as("n_days"))
    val exact = ev
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"), $"user_id")
      .agg(count(lit(1)))
      .groupBy($"event_type", $"month").agg(count(lit(1)).as("exact_users"))
    monthly.join(exact, Seq("event_type", "month"))
      .select($"event_type", $"month", $"exact_users", $"n_days",
        (abs($"approx_users" - $"exact_users").cast("double")
          / $"exact_users".cast("double") <= 0.10).as("hll_within_bounds"))
  }
  val hllReaggSql: String =
    """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m') AS month,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |       TRUE AS hll_within_bounds
      |FROM events
      |GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Mergeable QUANTILE sketches (Spark 4.1's built-in DataSketches KLL
  // functions — guide preference (a), compose built-ins; no custom
  // aggregate needed): per-day KLL sketches of event value are stored at
  // rest; the monthly percentile rollup MERGES ~1 KB stored sketches — the
  // 100 TB quantile path (the exact `percentile` form buffers and sorts
  // every raw value per group; sketches make the rollup O(groups), not
  // O(rows)). KLL compaction is randomized by design, so the oracle
  // follows the q_approx_stats WITHIN-BOUNDS contract: the merged sketch's
  // p50/p95 estimates are checked against the exact rank they land on
  // (k=200 → normalized rank error ≈1.65%; the 10% gate is ~6× headroom,
  // so a pass is the algorithm's guarantee, not luck).
  // ---------------------------------------------------------------------------
  private val kllDailyCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Stored daily KLL sketch artifact — parquet round-trip so every rollup
    * provably consumes sketch BYTES (DataSketches wire format, readable by
    * any binding), never raw rows. Same at-rest contract as
    * hllDailyAtRest. */
  def kllDailyAtRest(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(kllDailyCache, s, dir) {
      import s.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_kll_daily_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.events(s, dir)
        .selectExpr("event_type", "cast(ts as date) AS d", "value")
        .groupBy($"event_type", $"d")
        .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }

  def kllReagg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = kllDailyAtRest(s, dir)
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("kll_merge_agg_double(sk)").as("msk"), count(lit(1)).as("n_days"))
      .selectExpr("event_type", "month", "n_days",
        "kll_sketch_get_quantile_double(msk, cast(0.5 as double)) AS p50",
        "kll_sketch_get_quantile_double(msk, cast(0.95 as double)) AS p95")
    // exact-rank check of the estimates: one pass over raw rows (gate-side
    // only — production consumes the estimates directly)
    Tables.events(s, dir)
      .selectExpr("event_type", "date_format(cast(ts as date), 'yyyy-MM') AS month", "value")
      .join(broadcast(monthly), Seq("event_type", "month"))
      .groupBy($"event_type", $"month", $"n_days")
      .agg(count(lit(1)).as("exact_n"),
        sum(when($"value" <= $"p50", 1L).otherwise(0L)).as("le50"),
        sum(when($"value" <= $"p95", 1L).otherwise(0L)).as("le95"))
      .select($"event_type", $"month", $"n_days", $"exact_n",
        (abs($"le50".cast("double") / $"exact_n".cast("double") - 0.5) <= 0.10)
          .as("p50_within_bounds"),
        (abs($"le95".cast("double") / $"exact_n".cast("double") - 0.95) <= 0.10)
          .as("p95_within_bounds"))
  }
  val kllReaggSql: String =
    """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m') AS month,
      |       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |       CAST(count(*) AS BIGINT) AS exact_n,
      |       TRUE AS p50_within_bounds,
      |       TRUE AS p95_within_bounds
      |FROM events
      |GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Mergeable SET-OPERATION sketches (Spark 4.1's built-in DataSketches
  // theta functions — guide preference (a), compose built-ins): theta
  // sketches support INTERSECTION — "distinct users who did BOTH purchase
  // AND error this month" — which HLL structurally cannot answer and the
  // exact path needs a user-grain shuffle for. Daily per-type sketches are
  // stored at rest; the monthly per-type union merges stored bytes; the
  // intersection runs on two driver-sized merged sketches. Theta sketching
  // is pure hashing (deterministic, exact below the nominal-entries
  // threshold); the gate still uses the within-bounds contract so it holds
  // in estimation mode at any scale (rse ≈1.6% at lgK=12; 10% is wide).
  // ---------------------------------------------------------------------------
  private val thetaDailyCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Stored daily theta sketch artifact (per event_type, per day, over
    * user_id) — parquet round-trip, same at-rest contract as kllDailyAtRest. */
  def thetaDailyAtRest(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(thetaDailyCache, s, dir) {
      import s.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_theta_daily_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.events(s, dir)
        .selectExpr("event_type", "cast(ts as date) AS d", "user_id")
        .groupBy($"event_type", $"d")
        .agg(expr("theta_sketch_agg(user_id)").as("sk"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }

  def thetaIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = thetaDailyAtRest(s, dir)
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("theta_union_agg(sk)").as("msk"), count(lit(1)).as("n_days"))
    val both = monthly.filter($"event_type" === "purchase")
      .select($"month", $"msk".as("psk"), $"n_days".as("n_days_purchase"))
      .join(monthly.filter($"event_type" === "error")
        .select($"month", $"msk".as("esk"), $"n_days".as("n_days_error")), "month")
      .selectExpr("month", "n_days_purchase", "n_days_error",
        "theta_sketch_estimate(theta_intersection(psk, esk)) AS est_both")
    val exact = Tables.events(s, dir)
      .filter($"event_type".isin("purchase", "error"))
      .selectExpr("date_format(cast(ts as date), 'yyyy-MM') AS month",
        "user_id", "event_type")
      .groupBy($"month", $"user_id")
      .agg(countDistinct($"event_type").as("nt"))
      .filter($"nt" === 2)
      .groupBy($"month").agg(count(lit(1)).as("exact_both"))
    both.join(exact, Seq("month"), "left")
      .select($"month", $"n_days_purchase", $"n_days_error",
        coalesce($"exact_both", lit(0L)).as("exact_both"),
        (abs($"est_both" - coalesce($"exact_both", lit(0L)).cast("double"))
          <= greatest(coalesce($"exact_both", lit(0L)).cast("double") * 0.10,
            lit(1.0))).as("est_within_bounds"))
  }
  /** Set DIFFERENCE over the same stored daily sketches: distinct users
    * who purchased but never hit an error that month (A\B — churn-style
    * cohort isolation, or "crawl docs NOT in the benchmark" in
    * decontamination terms). Completes the theta set algebra
    * (union / intersection / difference) over one at-rest artifact. */
  def thetaDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = thetaDailyAtRest(s, dir)
      .groupBy($"event_type", expr("date_format(d, 'yyyy-MM')").as("month"))
      .agg(expr("theta_union_agg(sk)").as("msk"))
    val diff = monthly.filter($"event_type" === "purchase")
      .select($"month", $"msk".as("psk"))
      .join(monthly.filter($"event_type" === "error")
        .select($"month", $"msk".as("esk")), "month")
      .selectExpr("month",
        "theta_sketch_estimate(theta_difference(psk, esk)) AS est_only")
    val exact = Tables.events(s, dir)
      .filter($"event_type".isin("purchase", "error"))
      .selectExpr("date_format(cast(ts as date), 'yyyy-MM') AS month",
        "user_id", "event_type")
      .groupBy($"month", $"user_id")
      .agg(collect_set($"event_type").as("ts_set"))
      .filter(array_contains($"ts_set", "purchase") && !array_contains($"ts_set", "error"))
      .groupBy($"month").agg(count(lit(1)).as("exact_only"))
    diff.join(exact, Seq("month"), "left")
      .select($"month",
        coalesce($"exact_only", lit(0L)).as("exact_only"),
        (abs($"est_only".cast("double") - coalesce($"exact_only", lit(0L)).cast("double"))
          <= greatest(coalesce($"exact_only", lit(0L)).cast("double") * 0.10,
            lit(1.0))).as("est_within_bounds"))
  }
  val thetaDiffSql: String =
    """WITH u AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month, user_id,
      |         bool_or(event_type = 'purchase') AS p,
      |         bool_or(event_type = 'error') AS e
      |  FROM events WHERE event_type IN ('purchase', 'error')
      |  GROUP BY 1, 2),
      |m AS (SELECT month FROM u GROUP BY month HAVING bool_or(p) AND bool_or(e))
      |SELECT u.month,
      |       CAST(count(*) FILTER (WHERE p AND NOT e) AS BIGINT) AS exact_only,
      |       TRUE AS est_within_bounds
      |FROM u JOIN m ON u.month = m.month GROUP BY u.month
      |""".stripMargin

  val thetaIntersectSql: String =
    """WITH p AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
      |         count(DISTINCT CAST(ts AS DATE)) AS n_days_purchase
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |e AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
      |         count(DISTINCT CAST(ts AS DATE)) AS n_days_error
      |  FROM events WHERE event_type = 'error' GROUP BY 1),
      |u AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month, user_id
      |  FROM events WHERE event_type IN ('purchase', 'error')
      |  GROUP BY 1, 2 HAVING count(DISTINCT event_type) = 2),
      |x AS (SELECT month, CAST(count(*) AS BIGINT) AS exact_both FROM u GROUP BY month)
      |SELECT p.month, CAST(p.n_days_purchase AS BIGINT) AS n_days_purchase,
      |       CAST(e.n_days_error AS BIGINT) AS n_days_error,
      |       coalesce(x.exact_both, 0) AS exact_both,
      |       TRUE AS est_within_bounds
      |FROM p JOIN e ON p.month = e.month
      |LEFT JOIN x ON p.month = x.month
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Mergeable FREQUENT-ITEMS sketches (custom FreqSketchAgg family,
  // graft.functions.FreqSketch — the one DataSketches family Spark 4.1
  // has no SQL surface for, so guide preference (b) applies): per-day
  // per-type sketches over user_id are stored at rest; the heavy-hitter
  // report merges stored sketch bytes and asks each merged sketch for the
  // users STRICTLY above an activity threshold. The threshold is
  // 1.5× the per-type mean events/user, computed in pure integer
  // arithmetic (ceil(3c/2u) = (3c + 2u - 1) div 2u) so both engines agree
  // bit-for-bit. The emitted max_error column (getMaximumError) is pinned
  // to 0 by the oracle: purge-free sketches are EXACT, so the gate proves
  // exactness at test scale while the ε = N/maxMapSize bound is the
  // documented behavior beyond it.
  // ---------------------------------------------------------------------------
  private val freqDailyCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Stored daily frequent-items sketch artifact (per event_type, per day,
    * over user_id) — parquet round-trip, same at-rest contract as
    * kllDailyAtRest/thetaDailyAtRest. */
  def freqDailyAtRest(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(freqDailyCache, s, dir) {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_freq_daily_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.events(s, dir)
        .selectExpr("event_type", "cast(ts as date) AS d", "user_id")
        .groupBy($"event_type", $"d")
        .agg(expr("freq_sketch_agg(user_id)").as("sk"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }

  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val merged = freqDailyAtRest(s, dir)
      .groupBy($"event_type")
      .agg(expr("freq_merge_agg(sk)").as("msk"), count(lit(1)).as("n_days"))
    // gate-side threshold from exact totals (integer ceil, engine-agnostic)
    val thr = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("c"), countDistinct($"user_id").as("u"))
      .selectExpr("event_type", "(3 * c + 2 * u - 1) div (2 * u) AS t")
    merged.join(broadcast(thr), "event_type")
      .selectExpr("event_type", "n_days", "t AS threshold",
        "freq_max_error(msk) AS max_error",
        "explode(freq_items(msk, t)) AS it")
      .selectExpr("event_type", "it.item AS user_id", "it.est AS est_n",
        "threshold", "n_days", "max_error")
  }
  val heavyHittersSql: String =
    """WITH tot AS (
      |  SELECT event_type, count(*) AS c, count(DISTINCT user_id) AS u,
      |         count(DISTINCT CAST(ts AS DATE)) AS n_days
      |  FROM events GROUP BY 1),
      |thr AS (SELECT event_type, n_days, (3 * c + 2 * u - 1) // (2 * u) AS t FROM tot),
      |cnt AS (SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2)
      |SELECT c.event_type, c.user_id, CAST(c.n AS BIGINT) AS est_n,
      |       CAST(t.t AS BIGINT) AS threshold,
      |       CAST(t.n_days AS BIGINT) AS n_days,
      |       CAST(0 AS BIGINT) AS max_error
      |FROM cnt c JOIN thr t ON c.event_type = t.event_type
      |WHERE c.n > t.t
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // S1+P1-P4 batch form: Debezium-envelope parsing through the REAL streaming
  // parse path (graft.streaming.CdcIngest.parseEnvelope — one from_json of the
  // full envelope schema). Envelopes are constructed from events columns
  // identically on both engines, then round-tripped; missing fields surface
  // as typed NULLs, non-insert envelopes (no id) would be dropped by P4.
  // ---------------------------------------------------------------------------
  def envelopeParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the JSON build + from_json cost dominates and runs pre-shuffle —
    // rebalance the projected events first (guarded; see Materialize)
    val raw = graft.Materialize.rebalanced(Tables.events(s, dir)
      .select($"event_id", $"user_id", $"ts", $"event_type")).select(
      concat(
        lit("{\"payload\": {\"after\": {\"id\": "), $"event_id",
        lit(", \"id_employee\": "), $"user_id",
        lit(", \"start_datetime\": "), unix_micros($"ts"),
        lit(", \"sport_type\": \""), $"event_type",
        lit("\"}}}")).as("value"))
    graft.streaming.CdcIngest.parseEnvelope(raw)
  }
  val envelopeParseSql: String =
    """WITH raw AS (
      |  SELECT '{"payload": {"after": {"id": ' || event_id
      |      || ', "id_employee": ' || user_id
      |      || ', "start_datetime": ' || epoch_us(CAST(ts AS TIMESTAMP))
      |      || ', "sport_type": "' || event_type || '"}}}' AS value
      |  FROM events
      |)
      |SELECT CAST(value->>'$.payload.after.id' AS INTEGER) AS id,
      |       CAST(value->>'$.payload.after.id_employee' AS INTEGER) AS id_employee,
      |       strftime(make_timestamp((CAST(value->>'$.payload.after.start_datetime' AS BIGINT) // 1000000) * 1000000),
      |                '%Y-%m-%d %H:%M:%S') AS start_datetime,
      |       value->>'$.payload.after.sport_type' AS sport_type,
      |       CAST(NULL AS INTEGER) AS activity_duration,
      |       CAST(NULL AS DOUBLE) AS distance,
      |       CAST(NULL AS VARCHAR) AS comment
      |FROM raw
      |WHERE CAST(value->>'$.payload.after.id' AS INTEGER) IS NOT NULL
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Window-function breadth (§2.5 completeness): lag/lead/first_value over
  // the event-time axis plus dense_rank/percent_rank/cume_dist over the
  // value axis — the remaining analytic-window surface in ONE pass. Both
  // windows partition on user_id, so the whole query is a single shuffle on
  // the user key followed by two per-partition sorts. percent_rank and
  // cume_dist are single IEEE divisions of exact integer rank/count pairs,
  // so they hash-match across engines; double orderings pin NULLS FIRST
  // explicitly (Spark's ASC default) because DuckDB defaults to NULLS LAST.
  // ---------------------------------------------------------------------------
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wt = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wtf = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wv = Window.partitionBy($"user_id").orderBy($"value".asc_nulls_first)
    Tables.events(s, dir).select(
      $"user_id", $"event_id",
      lag($"value", 1).over(wt).as("prev_value"),
      lead($"value", 1).over(wt).as("next_value"),
      first($"event_type").over(wtf).as("first_type"),
      dense_rank().over(wv).cast("long").as("value_drank"),
      percent_rank().over(wv).as("value_prank"),
      cume_dist().over(wv).as("value_cdist"))
  }
  val windowFuncsSql: String =
    """SELECT user_id, event_id,
      |       lag(value, 1) OVER wt AS prev_value,
      |       lead(value, 1) OVER wt AS next_value,
      |       first_value(event_type) OVER (wt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
      |       CAST(dense_rank() OVER wv AS BIGINT) AS value_drank,
      |       percent_rank() OVER wv AS value_prank,
      |       cume_dist() OVER wv AS value_cdist
      |FROM events
      |WINDOW wt AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC),
      |       wv AS (PARTITION BY user_id ORDER BY value ASC NULLS FIRST)
      |""".stripMargin

  /** GROUPING SETS companion of rollup/cube (§2.4 completeness): exactly the
    * requested subtotal combinations — here (status, priority), (status),
    * (priority) — in one Expand + single aggregation pass; the sets are
    * distinguishable by their NULL patterns because the two grouping columns
    * never hold NULLs in the data. */
  def groupingSetsSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"),
          Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      // same long-cents rationale as rollupSummary (3-way Expand here)
      .agg(
        count(lit(1)).as("cnt"),
        sum(expr("cast(round(o_totalprice * cast(100 as double)) as bigint)"))
          .as("pc"))
      .selectExpr("o_orderstatus", "o_orderpriority", "cnt",
        "cast(pc as double) / cast(100 as double) AS sum_price")
  }
  val groupingSetsSummarySql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority))
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Correlation / dispersion statistics (§2.6 extension): Pearson corr,
  // population covariance and stddev of (quantity, extendedprice) per return
  // flag. Built-in corr()/stddev() stream doubles in partition order — not
  // reproducible across engines — so the moments are accumulated as EXACT
  // DECIMAL sums (partial+final agg, one shuffle of 6 decimals per group)
  // and the closed-form combination runs once per group in doubles. The
  // formula TEXT is spliced into both engines verbatim: equal parse trees ⇒
  // equal IEEE evaluation order ⇒ equal bits (sqrt is correctly rounded by
  // IEEE 754, unlike ln — the BM25 rule). This is also the 100 TB shape:
  // decimal partials are mergeable, so no second pass and no double drift.
  // ---------------------------------------------------------------------------
  // Moments are accumulated over INTEGER CENTS (xc = round(100·qty),
  // yc = round(100·price)): every per-row product fits a BIGINT exactly and
  // the group sums are exact integers. The double combination then performs
  // ONE correctly-rounded integer→double conversion per sum — casting a
  // scale-4 DECIMAL directly would double-round on DuckDB (int128→double,
  // then an inexact 10⁻⁴ descale) once sums pass 2⁵³, and the last ulp
  // diverges from Java's single-rounding BigDecimal. corr is
  // scale-invariant; covar/stddev descale by exact power-of-ten double
  // constants (one extra division, identical on both engines).
  private val corrMoments =
    // spliced after per-group integer sums are cast to double as
    // nd/sxd/syd/sxxd/syyd/sxyd
    Seq(
      "(nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) AS corr_qty_price",
      "(nd * sxyd - sxd * syd) / (nd * nd) / cast(10000 as double) AS covar_pop",
      "sqrt(nd * sxxd - sxd * sxd) / nd / cast(100 as double) AS stddev_pop_qty",
      "sqrt(nd * syyd - syd * syd) / nd / cast(100 as double) AS stddev_pop_price")
  private val centX = "cast(round(l_quantity * cast(100 as double)) as bigint)"
  private val centY = "cast(round(l_extendedprice * cast(100 as double)) as bigint)"

  def corrStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // no rebalance here: the per-row work is primitive-long arithmetic
    // (integer cents), which the single scan task does faster than a
    // barrier round-trip costs — measured flat-to-worse with the spread
    Tables.lineitem(s, dir)
      .selectExpr("l_returnflag", s"$centX AS xc", s"$centY AS yc")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        // xc ≤ 5e3 and yc ≤ ~1e7 cents, so sx/sy/sxx stay inside BIGINT
        // through sf1000 — plain long sums, codegen primitive. The two
        // sums whose per-row products reach 1e14 (yc², xc·yc) WOULD pass
        // 2⁶³ by sf1/sf100; instead of per-row DECIMAL accumulation
        // (BigDecimal per row — it was 75% of this query's wall), each is
        // accumulated as TWO long sums — quotient and remainder by 2³⁰ —
        // which are exact with headroom past sf100, and reassembled in
        // DECIMAL on the handful of group rows. DuckDB's native HUGEINT
        // sum produces the identical exact integer, so the oracle needs
        // no split.
        sum($"xc").as("sx"),
        sum($"yc").as("sy"),
        sum($"xc" * $"xc").as("sxx"),
        sum(expr("(yc * yc) div 1073741824")).as("syy_hi"),
        sum(expr("(yc * yc) % 1073741824")).as("syy_lo"),
        sum(expr("(xc * yc) div 1073741824")).as("sxy_hi"),
        sum(expr("(xc * yc) % 1073741824")).as("sxy_lo"))
      .selectExpr(Seq("l_returnflag", "n",
        "cast(n as double) AS nd", "cast(sx as double) AS sxd",
        "cast(sy as double) AS syd", "cast(sxx as double) AS sxxd",
        // same DECIMAL→double conversion path as before the split — the
        // reassembled integers are bit-identical, so the hash contract holds
        "cast(cast(syy_hi as decimal(38,0)) * 1073741824 + syy_lo as double) AS syyd",
        "cast(cast(sxy_hi as decimal(38,0)) * 1073741824 + sxy_lo as double) AS sxyd"): _*)
      .selectExpr(Seq("l_returnflag", "n") ++ corrMoments: _*)
  }
  val corrStatsSql: String =
    s"""WITH c AS (
       |  SELECT l_returnflag, $centX AS xc, $centY AS yc FROM lineitem),
       |m AS (
       |  SELECT l_returnflag, count(*) AS n,
       |         sum(xc) AS sx, sum(yc) AS sy,
       |         sum(xc * xc) AS sxx, sum(yc * yc) AS syy,
       |         sum(xc * yc) AS sxy
       |  FROM c GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n,
       |         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
       |         CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
       |         CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
       |  FROM m)
       |SELECT l_returnflag, n,
       |       ${corrMoments.mkString(",\n       ")}
       |FROM d
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Autocorrelation function (ACF) of the daily revenue series at lags
  // 1..7 — the seasonality probe behind every forecasting dashboard (a
  // weekly cycle shows as a lag-7 peak). The series is exact integer
  // cents per day; each lag's Pearson correlation comes from the same
  // exact-DECIMAL moment accumulation as q_corr_stats (built-in corr()
  // streams doubles in partition order — not cross-engine-reproducible),
  // with the closed form spliced verbatim into both engines. Scale shape:
  // one orders scan to the daily rollup (shared by the lag spine and the
  // shifted side), a 7-way lag explode of the DAY-GRAIN relation (bounded
  // by days·7, not orders), one equi-join on the shifted day, one moment
  // aggregate. A day's cents pass ~3e9 once per-day order density grows
  // 10× (the sf1 shape), so a raw x·y long multiply overflows int64; each
  // operand splits by 2³⁰ (x = xq·2³⁰ + xr) and every moment accumulates
  // as FOUR exact long sums — Σ xq·yq, Σ(xq·yr + yq·xr), and the xr·yr
  // product split once more into div/mod-2³⁰ sums — reassembled in
  // DECIMAL only on the 7 lag rows (the q_corr_stats primitive-long
  // pattern, one level deeper because here the per-row PRODUCT itself
  // overflows). Exact while a day's cents stay under 2⁶⁰ (≫ sf1000).
  // ---------------------------------------------------------------------------
  private val AcfLags = 7
  private val acfExpr =
    "(nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) AS acf"

  def acf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = graft.Materialize.shared(
      Tables.orders(s, dir)
        .selectExpr("o_orderdate AS day",
          "cast(round(o_totalprice * cast(100 as double)) as bigint) AS cents")
        .groupBy($"day")
        .agg(sum($"cents").cast("long").as("x")))
    daily
      .selectExpr(s"explode(sequence(1, $AcfLags)) AS lag", "day", "x")
      .selectExpr("lag", "date_add(day, lag) AS day2", "x")
      .join(daily.select($"day".as("day2"), $"x".as("y")), "day2")
      .selectExpr("lag",
        "x div 1073741824 AS xq", "x % 1073741824 AS xr",
        "y div 1073741824 AS yq", "y % 1073741824 AS yr")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("xq * 1073741824 + xr")).as("sx"),
        sum(expr("yq * 1073741824 + yr")).as("sy"),
        sum(expr("xq * xq")).as("sxx_hi"),
        sum(expr("2 * xq * xr")).as("sxx_mid"),
        sum(expr("(xr * xr) div 1073741824")).as("sxx_lohi"),
        sum(expr("(xr * xr) % 1073741824")).as("sxx_lolo"),
        sum(expr("yq * yq")).as("syy_hi"),
        sum(expr("2 * yq * yr")).as("syy_mid"),
        sum(expr("(yr * yr) div 1073741824")).as("syy_lohi"),
        sum(expr("(yr * yr) % 1073741824")).as("syy_lolo"),
        sum(expr("xq * yq")).as("sxy_hi"),
        sum(expr("xq * yr + yq * xr")).as("sxy_mid"),
        sum(expr("(xr * yr) div 1073741824")).as("sxy_lohi"),
        sum(expr("(xr * yr) % 1073741824")).as("sxy_lolo"))
      // Σ x·y = 2⁶⁰·Σhi + 2³⁰·(Σmid + Σlohi) + Σlolo, reassembled in
      // DECIMAL on the lag rows. The sums pass 2^53 (unlike q_corr_stats
      // at tested SFs), and DuckDB's wide-int → double cast is two-step
      // (upper·2^64 + lower: DOUBLE-rounded), while the JVM's is
      // single-rounded — route BOTH engines through the exact decimal
      // string, whose parse (strtod / Double.parseDouble) is correctly
      // rounded by spec
      .selectExpr(Seq("cast(lag as bigint) AS lag", "n_pairs",
        "cast(n_pairs as double) AS nd",
        "cast(cast(sx as string) as double) AS sxd",
        "cast(cast(sy as string) as double) AS syd") ++
        Seq("sxx", "syy", "sxy").map { m =>
          s"cast(cast(cast(${m}_hi as decimal(38,0)) * 1152921504606846976 + " +
            s"(cast(${m}_mid as decimal(38,0)) + ${m}_lohi) * 1073741824 + " +
            s"${m}_lolo as string) as double) AS ${m}d"
        }: _*)
      .selectExpr("lag", "n_pairs", acfExpr)
  }
  val acfSql: String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |         CAST(sum(cast(round(o_totalprice * cast(100 as double)) as bigint)) AS BIGINT) AS x
       |  FROM orders GROUP BY 1),
       |p AS (
       |  SELECT l.lag, a.x AS x, b.x AS y
       |  FROM daily a
       |  CROSS JOIN (SELECT unnest(range(1, ${AcfLags + 1})) AS lag) l
       |  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
       |m AS (
       |  SELECT lag, count(*) AS n_pairs,
       |         sum(x) AS sx, sum(y) AS sy,
       |         -- HUGEINT operand: the per-row product passes int64 once a
       |         -- day's cents pass ~3e9 (10x per-day density); the exact
       |         -- 128-bit sums equal the engine's split-long reassembly
       |         sum(CAST(x AS HUGEINT) * x) AS sxx,
       |         sum(CAST(y AS HUGEINT) * y) AS syy,
       |         sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM p GROUP BY lag),
       |d AS (
       |  SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |         CAST(n_pairs AS DOUBLE) AS nd,
       |         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
       |         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
       |         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
       |         CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
       |         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd
       |  FROM m)
       |SELECT lag, n_pairs, $acfExpr
       |FROM d
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // One-sided CUSUM change-point detection over the daily revenue series —
  // the standard drift alarm (Page 1954): S_t = max(0, S_{t−1} + (x_t − T))
  // crossing a threshold flags a sustained upward shift. The recursion has
  // a CLOSED WINDOW FORM — S_t = P_t − min(0, min_{j≤t} P_j) with
  // P_t = Σ_{i≤t}(x_i − T) — so the whole detector is two window passes of
  // EXACT integer arithmetic (no fold, no recursion, no doubles): the
  // reference level T is the integer-division daily mean and the alarm
  // threshold is 2T. Scale: day-grain relation (bounded by days, not
  // orders); the unpartitioned windows run over that value-compressed
  // series, the q_ewma contract.
  // ---------------------------------------------------------------------------
  def cusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = graft.Materialize.shared(
      Tables.orders(s, dir)
        .selectExpr("CAST(o_orderdate AS DATE) AS day",
          "cast(round(o_totalprice * cast(100 as double)) as bigint) AS cents")
        .groupBy($"day")
        .agg(sum($"cents").cast("long").as("x")))
    val target = daily.agg(
      expr("sum(x) div count(*)").cast("long").as("t_cents"))
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(target))
      .withColumn("p", sum($"x" - $"t_cents").over(w))
      .withColumn("runmin", least(min($"p").over(w), lit(0L)))
      .selectExpr("day", "x", "p - runmin AS s",
        "(p - runmin) > 2 * t_cents AS alarm")
  }
  val cusumSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(cast(round(o_totalprice * cast(100 as double)) as bigint)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(x) // count(*) AS BIGINT) AS t_cents FROM daily),
      |p AS (
      |  SELECT day, x, t_cents,
      |         CAST(sum(x - t_cents) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      |  FROM daily CROSS JOIN t),
      |r AS (
      |  SELECT day, x, t_cents, p,
      |         least(CAST(min(p) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
      |           CAST(0 AS BIGINT)) AS runmin
      |  FROM p)
      |SELECT day, x, CAST(p - runmin AS BIGINT) AS s,
      |       (p - runmin) > 2 * t_cents AS alarm
      |FROM r
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Revenue-concentration audit: the economic Gini coefficient and the
  // Lorenz decile table over per-customer lifetime spend — the "does 1% of
  // accounts carry the corpus" question (and, over per-source token
  // counts, the mix-concentration twin). Exactness: spend is integer
  // cents; the Gini closed form G = (2·Σ(rank·x) − (n+1)·Σx) / (n·Σx)
  // uses rank-weighted sums accumulated in exact DECIMAL, string-routed to
  // double (the >2⁵³ rule) for ONE final division.
  //
  // Scale shape — DISTRIBUTED exact ranking, not a global-sort window
  // (the ntile trap): rows bucket by value range (x div W), the
  // unpartitioned prefix-count window runs over BUCKET AGGREGATES
  // (bounded by value-range/W, ~thousands of rows at any corpus size),
  // per-row ranks come from per-bucket windows (partition-parallel), and
  // rank = bucket prefix + intra-bucket rank. Ties (same x) always land
  // in one bucket, so the (x, custkey) total order is preserved exactly.
  // Deciles use the explicit formula ((rank−1)·10) div n + 1 on both
  // engines instead of ntile — same semantics everywhere, no global sort.
  // ---------------------------------------------------------------------------
  private val GiniBucketW = 1000000L // $10k value buckets

  /** (o_custkey, x, r): exact dense ranks by (x, custkey), distributed. */
  private def spendRanked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val spend = graft.Materialize.shared(
      Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * cast(100 as double)) AS BIGINT)"))
          .cast("long").as("x"))
        .withColumn("bkt", expr(s"x div ${GiniBucketW}L")))
    val bstats = spend.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("c_lt", coalesce(
        sum($"cnt").over(Window.orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"c_lt")
    spend
      .withColumn("ir", row_number().over(
        Window.partitionBy($"bkt").orderBy($"x".asc, $"o_custkey".asc)))
      .join(broadcast(bstats), "bkt")
      .selectExpr("o_custkey", "x", "c_lt + ir AS r")
  }
  /** Shared DuckDB CTE prefix mirroring [[spendRanked]]. */
  private val spendRankedCte =
    s"""WITH spend AS MATERIALIZED (
       |  SELECT o_custkey,
       |         CAST(sum(CAST(round(o_totalprice * cast(100 as double)) AS BIGINT)) AS BIGINT) AS x,
       |         CAST(sum(CAST(round(o_totalprice * cast(100 as double)) AS BIGINT)) AS BIGINT) // $GiniBucketW AS bkt
       |  FROM orders GROUP BY o_custkey),
       |bstats AS (
       |  SELECT bkt, COALESCE(CAST(sum(cnt) OVER (ORDER BY bkt
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS c_lt
       |  FROM (SELECT bkt, count(*) AS cnt FROM spend GROUP BY bkt) b),
       |ranked AS (
       |  SELECT o_custkey, x, c_lt + ir AS r
       |  FROM (SELECT o_custkey, x, bkt,
       |               row_number() OVER (PARTITION BY bkt ORDER BY x ASC, o_custkey ASC) AS ir
       |        FROM spend) s JOIN bstats USING (bkt))""".stripMargin

  def wealthGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spendRanked(s, dir)
      .agg(count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).as("sx"),
        sum(($"r" * $"x").cast("decimal(38,0)")).as("srx"))
      .selectExpr("n",
        "cast(cast(sx as string) as double) AS sxd",
        "cast(cast(srx as string) as double) AS srxd")
      .selectExpr("n AS n_customers",
        "(cast('2.0' as double) * srxd - (n + 1) * sxd) / (n * sxd) AS gini")
  }
  val wealthGiniSql: String =
    s"""$spendRankedCte,
       |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(r * x) AS srx FROM ranked),
       |d AS (SELECT n, CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
       |             CAST(CAST(srx AS VARCHAR) AS DOUBLE) AS srxd FROM m)
       |SELECT n AS n_customers,
       |       (cast('2.0' as double) * srxd - (n + 1) * sxd) / (n * sxd) AS gini
       |FROM d
       |""".stripMargin

  def lorenz(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ranked = spendRanked(s, dir)
    val n1 = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n1))
      .selectExpr("x", "((r - 1) * 10) div n + 1 AS decile")
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        sum($"x".cast("decimal(38,0)")).as("cents"))
      .withColumn("total", sum($"cents").over(Window.partitionBy()))
      .withColumn("cum", sum($"cents").over(
        Window.orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .selectExpr("cast(decile as bigint) AS decile", "n_customers",
        "cast(cents as long) AS cents",
        "cast(cast(cents as string) as double) / cast(cast(total as string) as double) AS share",
        "cast(cast(cum as string) as double) / cast(cast(total as string) as double) AS cum_share")
  }
  val lorenzSql: String =
    s"""$spendRankedCte,
       |nn AS (SELECT count(*) AS n FROM ranked),
       |dec AS (SELECT x, ((r - 1) * 10) // n + 1 AS decile FROM ranked CROSS JOIN nn),
       |g AS (SELECT decile, count(*) AS n_customers, sum(x) AS cents FROM dec GROUP BY decile),
       |w AS (SELECT decile, n_customers, cents,
       |             sum(cents) OVER () AS total,
       |             sum(cents) OVER (ORDER BY decile
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM g)
       |SELECT CAST(decile AS BIGINT) AS decile, n_customers,
       |       CAST(cents AS BIGINT) AS cents,
       |       CAST(CAST(cents AS VARCHAR) AS DOUBLE) / CAST(CAST(total AS VARCHAR) AS DOUBLE) AS share,
       |       CAST(CAST(cum AS VARCHAR) AS DOUBLE) / CAST(CAST(total AS VARCHAR) AS DOUBLE) AS cum_share
       |FROM w
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Herfindahl–Hirschman market-concentration index per nation — the
  // antitrust/marketplace-health scalar (Σ share², 1/n = perfectly split,
  // 1.0 = monopoly) over supplier revenue shares. Exact rational form:
  // HHI = Σ cents_s² / (Σ cents_s)² — both sums are exact integers, each
  // squared in DECIMAL(38,0) on Spark / HUGEINT on DuckDB (per-supplier
  // cents pass 2³¹·√(int64) territory at scale, so int64 squares would
  // wrap), string-routed to double for ONE division (rule 9). Shape: the
  // supplier dim broadcasts into the fact scan, then two hash aggregates
  // (supplier grain → nation grain) — nothing shuffles wider than the
  // supplier count.
  // ---------------------------------------------------------------------------
  def hhi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_suppkey",
        expr("CAST(round(l_extendedprice * cast(100 as double)) AS BIGINT)").as("c"))
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey", $"s_suppkey")
      .agg(sum($"c".cast("decimal(38,0)")).cast("decimal(38,0)").as("cents"))
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"cents").cast("decimal(38,0)").as("tot"),
        sum($"cents" * $"cents").as("sq"))
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .selectExpr("n_name", "n_suppliers",
        "cast(cast(sq as string) as double) / " +
          "(cast(cast(tot as string) as double) * cast(cast(tot as string) as double)) AS hhi")
  }
  val hhiSql: String =
    """WITH sup AS (
      |  SELECT s_nationkey, l.l_suppkey,
      |         CAST(sum(CAST(round(l_extendedprice * cast(100 as double)) AS BIGINT)) AS HUGEINT) AS cents
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY s_nationkey, l.l_suppkey),
      |n AS (
      |  SELECT s_nationkey, count(*) AS n_suppliers,
      |         sum(cents) AS tot, sum(cents * cents) AS sq
      |  FROM sup GROUP BY s_nationkey)
      |SELECT n_name, n_suppliers,
      |       CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
      |         (CAST(CAST(tot AS VARCHAR) AS DOUBLE) * CAST(CAST(tot AS VARCHAR) AS DOUBLE)) AS hhi
      |FROM n JOIN nation ON s_nationkey = n_nationkey
      |""".stripMargin

  /** Fixed-bin histogram (dashboard primitive): order totals into 20 equal
    * bins of width 30000 with an overflow bin — the bucket id is an explicit
    * floor-of-division formula (identical text on both engines) rather than
    * an engine width_bucket, whose edge-case conventions differ. One
    * partial+final aggregation; the bucket expression evaluates in the scan. */
  private val histBucket =
    "least(cast(19 as bigint), cast(floor(o_totalprice / cast(30000 as double)) as bigint))"
  def histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .selectExpr(s"$histBucket AS bucket", "o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        sum(D($"o_totalprice")).cast("double").as("sum_price"))
  }
  val histogramSql: String =
    s"""SELECT $histBucket AS bucket, count(*) AS n_orders,
       |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM orders GROUP BY 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Scalar-function breadth (§2.6 completeness): the reference's only JSON
  // op is get_json_object×7 (SaveDelta.scala:140-147 — re-expressed as ONE
  // from_json in q_envelope_parse); this query keeps the per-path
  // get_json_object surface itself exercised over the events.props column.
  // Pure per-row codegen'd expressions, no shuffle.
  // ---------------------------------------------------------------------------
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .selectExpr(
        "event_id",
        "cast(get_json_object(props, '$.k') as int) AS k",
        "(cast(get_json_object(props, '$.k') as int) % 2 = 0) AS k_even",
        "cast(get_json_object(props, '$.missing') as int) AS k_missing")
  }
  val jsonExtractSql: String =
    """SELECT event_id,
      |       CAST(props->>'$.k' AS INT) AS k,
      |       (CAST(props->>'$.k' AS INT) % 2 = 0) AS k_even,
      |       CAST(props->>'$.missing' AS INT) AS k_missing
      |FROM events
      |""".stripMargin

  /** String-function breadth (§2.6): case mapping, padding, reversal,
    * token extraction, replacement and edit distance in one codegen'd scan —
    * levenshtein is the fuzzy-matching primitive entity resolution needs,
    * exercised here with exact-integer determinism. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .selectExpr(
        "c_custkey",
        "upper(c_name) AS up_name",
        "lpad(c_name, 25, '_') AS padded",
        "reverse(c_name) AS rev_name",
        "split_part(c_name, '#', 2) AS name_num",
        "substr(c_name, length(c_name) - 2, 3) AS tail3",
        "replace(c_mktsegment, 'A', '@') AS seg_repl",
        "levenshtein(lower(c_name), lower(c_mktsegment)) AS seg_lev")
  }
  val stringFuncsSql: String =
    """SELECT c_custkey,
      |       upper(c_name) AS up_name,
      |       lpad(c_name, 25, '_') AS padded,
      |       reverse(c_name) AS rev_name,
      |       split_part(c_name, '#', 2) AS name_num,
      |       substr(c_name, length(c_name) - 2, 3) AS tail3,
      |       replace(c_mktsegment, 'A', '@') AS seg_repl,
      |       levenshtein(lower(c_name), lower(c_mktsegment)) AS seg_lev
      |FROM customer
      |""".stripMargin

  /** Date-part aggregation (§2.6): orders rolled up by (year, quarter) —
    * the calendar-dimension shape every dashboard needs; the date parts are
    * derived grouping keys evaluated in the scan, one partial+final agg. */
  def dateAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .selectExpr("year(o_orderdate) AS o_year",
        "quarter(o_orderdate) AS o_quarter", "o_totalprice")
      .groupBy($"o_year", $"o_quarter")
      .agg(count(lit(1)).as("n_orders"),
        sum(D($"o_totalprice")).cast("double").as("sum_price"))
  }
  val dateAggSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2
      |""".stripMargin

  /** TPC-H Q10 shape (§2.3 breadth): revenue lost to returned items per
    * customer, top 20. Three-table join where the fact side shuffles once
    * on the join key chain and the final top-k is TakeOrderedAndProject
    * (revenue desc, tie-broken on the key — never a global sort). */
  def topReturns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val one = lit(new java.math.BigDecimal(1))
    val li = Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        (D($"l_extendedprice") * (one - D($"l_discount", 8))).as("rev"))
    li.join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir).select($"c_custkey", $"c_name"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name")
      .agg(sum($"rev").cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }
  val topReturnsSql: String =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                 * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Funnel conversion (event-sequence analytics): per user, first signup and
  // the first purchase AT OR AFTER it — the two-step funnel with
  // time-to-convert. The conditional min folds the sequence constraint into
  // the aggregate (no window over the full event stream, no self-join
  // explosion): one shuffle to the user key, then a conditional-min agg.
  // Time-to-convert is integer µs arithmetic, so the oracle hash-matches.
  // ---------------------------------------------------------------------------
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val purchase = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts")
    signup.join(purchase, Seq("user_id"), "left")
      .groupBy($"user_id", $"signup_ts")
      .agg(min(when($"ts" >= $"signup_ts", $"ts")).as("first_purchase_ts"))
      .selectExpr("user_id", "signup_ts", "first_purchase_ts",
        "first_purchase_ts IS NOT NULL AS converted",
        // `div` truncates toward zero — and so does DuckDB's `//` (verified:
        // -7 // 2 = -3 in DuckDB 1.x), so the two engines agree for ANY sign
        // of the delta. Here the delta is additionally non-negative by
        // construction: the conditional min above only admits purchases at or
        // after signup_ts.
        "(unix_micros(first_purchase_ts) - unix_micros(signup_ts)) div 1000000 AS secs_to_convert")
  }
  val funnelSql: String =
    """WITH su AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |pu AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (
      |  SELECT su.user_id, signup_ts,
      |         min(CASE WHEN p_ts >= signup_ts THEN p_ts END) AS first_purchase_ts
      |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
      |  GROUP BY su.user_id, signup_ts)
      |SELECT user_id, signup_ts, first_purchase_ts,
      |       first_purchase_ts IS NOT NULL AS converted,
      |       (epoch_us(first_purchase_ts) - epoch_us(signup_ts)) // 1000000 AS secs_to_convert
      |FROM f
      |""".stripMargin

  /** Day-cohort retention: users grouped by their first-active day, with
    * distinct-user counts at day offsets 0/1/7 — the standard retention
    * triangle, one row per cohort. The event stream is reduced to DISTINCT
    * (user, day) pairs FIRST: everything downstream (cohort min, offset
    * membership) is day-granular, so the cohort join shuffles at most
    * |users|×|days| rows instead of full event cardinality — at 100 TB the
    * difference between joining billions of raw events and millions of
    * user-days. Three bounded shuffles: the user-day dedup, the per-user min
    * (cohort assignment), and the per-cohort conditional distinct counts. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("d"))
      .distinct()
    val cohorts = ev.groupBy($"user_id").agg(min($"d").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .withColumn("off", datediff($"d", $"cohort_day"))
      .groupBy($"cohort_day")
      .agg(
        countDistinct(when($"off" === 0, $"user_id")).as("d0_users"),
        countDistinct(when($"off" === 1, $"user_id")).as("d1_users"),
        countDistinct(when($"off" === 7, $"user_id")).as("d7_users"))
      .orderBy($"cohort_day")
  }
  val cohortRetentionSql: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |c AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
      |j AS (SELECT e.user_id, cohort_day, datediff('day', cohort_day, d) AS off
      |      FROM e JOIN c ON e.user_id = c.user_id)
      |SELECT cohort_day,
      |       count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS d0_users,
      |       count(DISTINCT CASE WHEN off = 1 THEN user_id END) AS d1_users,
      |       count(DISTINCT CASE WHEN off = 7 THEN user_id END) AS d7_users
      |FROM j GROUP BY cohort_day ORDER BY cohort_day
      |""".stripMargin

  /** Event-path transition matrix: counts of consecutive (from → to) event
    * type pairs per user timeline — the Markov-transition view behind path
    * and drop-off analysis. One shuffle on user_id for the lead() window,
    * then a tiny (|types|²) aggregate. */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
  val transitionsSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS next_type
      |  FROM events)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n_transitions
      |FROM t WHERE next_type IS NOT NULL
      |GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // SCD2 history construction — the batch-apply face of the reference's CDC
  // domain: an ordered change stream becomes type-2 dimension rows with
  // [valid_from, valid_to) intervals and an is_current flag. One shuffle on
  // the business key; the interval close is a lead() in the same partition
  // sort. At 100 TB this runs per ingest increment against the affected
  // keys only (join the delta's key set first); the full-history rebuild
  // here is the semantics anchor.
  // ---------------------------------------------------------------------------
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"event_id", $"value",
        $"ts".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
  }
  val scd2HistorySql: String =
    """WITH ch AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, event_id, value,
      |       ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
      |FROM ch
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // SCD1 latest-wins MERGE (the Delta/Iceberg MERGE INTO shape, expressed
  // relationally): a current-state snapshot (latest purchase per user
  // before the cutoff) merged with a change batch (after the cutoff).
  // Keys present in both take the delta's value ('update'); delta-only
  // keys are 'insert'; base-only keys carry forward 'unchanged'. The
  // full-outer join IS the merge — at 100 TB the base is the stored
  // snapshot partitioned by key, the delta is a day of CDC (broadcast- or
  // shuffle-joined by AQE), and the output overwrites the snapshot.
  // Latest-per-key is a row_number window with a total ordering
  // (ts, event_id), so both engines pick the identical row.
  // ---------------------------------------------------------------------------
  def scd1Merge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    def latest(d: DataFrame) = d
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"value", $"ts")
    val ev = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val base = latest(ev.filter($"ts" < cutoff))
      .select($"user_id", $"value".as("base_value"), $"ts".as("base_ts"))
    val delta = latest(ev.filter($"ts" >= cutoff))
      .select($"user_id", $"value".as("delta_value"), $"ts".as("delta_ts"))
    base.join(delta, Seq("user_id"), "full_outer")
      .select($"user_id",
        coalesce($"delta_value", $"base_value").as("value"),
        coalesce($"delta_ts", $"base_ts").as("last_ts"),
        when($"delta_ts".isNotNull && $"base_ts".isNotNull, "update")
          .when($"delta_ts".isNotNull, "insert")
          .otherwise("unchanged").as("change_type"))
  }
  val scd1MergeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |base AS (
      |  SELECT user_id, value AS base_value, ts AS base_ts
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM ev WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1),
      |delta AS (
      |  SELECT user_id, value AS delta_value, ts AS delta_ts
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM ev WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1)
      |SELECT COALESCE(base.user_id, delta.user_id) AS user_id,
      |       COALESCE(delta_value, base_value) AS value,
      |       COALESCE(delta_ts, base_ts) AS last_ts,
      |       CASE WHEN delta_ts IS NOT NULL AND base_ts IS NOT NULL THEN 'update'
      |            WHEN delta_ts IS NOT NULL THEN 'insert'
      |            ELSE 'unchanged' END AS change_type
      |FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Mergeable partial re-aggregation: daily per-customer partials roll up to
  // monthly WITHOUT touching raw rows — the incremental-warehouse pattern
  // (partials are the stored artifact; count partials merge by sum, decimal
  // sum partials merge exactly by sum). At 100 TB the daily relation is what
  // a scheduled job materializes per partition; the monthly merge reads
  // |customers|×|days| rows, not |orders|.
  // ---------------------------------------------------------------------------
  def reaggMonth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .select($"o_custkey", to_date($"o_orderdate").as("d"), $"o_totalprice")
      .groupBy($"o_custkey", $"d")
      .agg(count(lit(1)).as("n"), sum(D($"o_totalprice")).as("ss"))
    daily
      .groupBy($"o_custkey", trunc($"d", "month").as("month"))
      .agg(
        sum($"n").cast("long").as("n_orders"),
        sum($"ss").cast("double").as("sum_price"))
  }
  val reaggMonthSql: String =
    """WITH daily AS (
      |  SELECT o_custkey, CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
      |         count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_custkey, CAST(date_trunc('month', d) AS DATE) AS month,
      |       CAST(sum(n) AS BIGINT) AS n_orders,
      |       CAST(sum(s) AS DOUBLE) AS sum_price
      |FROM daily GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // RANGE-frame window (value-based frame, vs the ROWS frames elsewhere):
  // trailing-30-day spend per customer — the frame is defined by the ORDER
  // VALUE (epoch day), so same-day orders fall in each other's frames and
  // the result is deterministic REGARDLESS of tie order (rows-frames need a
  // tie-break; range-frames don't — that is the point of the shape). One
  // shuffle on the customer key.
  // ---------------------------------------------------------------------------
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"d_epoch")
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        datediff(to_date($"o_orderdate"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("bigint").as("d_epoch"),
        $"o_totalprice")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum(D($"o_totalprice")).over(w).cast("double").as("trailing_30d_spend"),
        count(lit(1)).over(w).cast("long").as("trailing_30d_orders"))
  }
  val rangeFrameSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) AS BIGINT) AS d_epoch,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey ORDER BY d_epoch
      |                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend,
      |       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY d_epoch
      |                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_30d_orders
      |FROM o
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Exponentially-weighted moving average per user (feature-store primitive:
  // recency-weighted activity level). EWMA is inherently ORDER-DEPENDENT
  // float math, so it is computed as an order-fixed sequential fold over the
  // time-sorted values (repo rule 2) — α = 1/4 and (1−α) = 3/4 are exact
  // binary fractions, and both engines execute the identical IEEE sequence,
  // so the hashes match. Zero-seeded by definition (documented; the oracle
  // mirrors). One shuffle on user_id; the per-user array is bounded by that
  // user's event count (the labelCentroids-style caveat: per-entity history
  // must fit one group — cap or pre-window per key at extreme fan-in).
  // ---------------------------------------------------------------------------
  def ewma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"value")
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("aggregate(array_sort(collect_list(struct(ts, event_id, value))), cast(0 as double), (acc, x) -> acc * cast(0.75 as double) + x.value * cast(0.25 as double))")
          .as("ewma_value"))
  }
  val ewmaSql: String =
    """SELECT user_id, count(*) AS n_events,
      |       list_reduce(list_prepend(CAST(0 AS DOUBLE), list(value ORDER BY ts, event_id)),
      |                   (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)) AS ewma_value
      |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      |      FROM events WHERE value IS NOT NULL) e
      |GROUP BY user_id
      |""".stripMargin

  /** queries + oracle pairs exported to SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ewma"           -> ewma _,
    "q_scd2"           -> scd2History _,
    "q_scd1_merge"     -> scd1Merge _,
    "q_winsorize"      -> winsorize _,
    "q_chisq"          -> chiSquare _,
    "q_ab_test"        -> abTest _,
    "q_basket_lift"    -> basketLift _,
    "q_streaks"        -> orderStreaks _,
    "q_path_trigrams"  -> pathTrigrams _,
    "q_funnel3"        -> funnel3 _,
    "q_reagg_month"    -> reaggMonth _,
    "q_range_frame"    -> rangeFrame _,
    "q_cdc_extract"    -> cdcExtract _,
    "q_epoch_micros"   -> epochMicros _,
    "q_agg_count_avg"  -> aggCountAvg _,
    "q_topk_group"     -> topkGroup _,
    "q_join_inner"     -> joinInner _,
    "q_join_left_agg"  -> joinLeftAgg _,
    "q_flagship_bonus" -> flagshipBonus _,
    "q_flagship_sql"   -> flagshipSqlText _,
    "q_masked_view"    -> maskedView _,
    "q_validate_threshold" -> validateThreshold _,
    "q_anti_fk"        -> antiFk _,
    "q_semi_exists"    -> semiExists _,
    "q_join_full"      -> joinFullOuter _,
    "q_set_ops"        -> setOps _,
    "q_expectations"   -> expectations _,
    "q_profile"        -> profileTable _,
    "q_sum_metrics"    -> sumMetrics _,
    "q_count_by_flag"  -> countByFlag _,
    "q_count_star"     -> countStar _,
    "q_pricing_summary" -> pricingSummary _,
    "q_envelope_parse" -> envelopeParse _,
    "q_windowed_agg"   -> windowedAgg _,
    "q_hopping_agg"    -> hoppingAgg _,
    "q_sessionize"     -> sessionize _,
    "q_session_features" -> sessionFeatures _,
    "q_mad_anomalies"  -> madAnomalies _,
    "q_interarrival"   -> interarrival _,
    "q_quantiles"      -> quantiles _,
    "q_ordered_stats"  -> orderedStats _,
    "q_running_distinct" -> runningDistinct _,
    "q_event_path"     -> eventPath _,
    "q_dau_mau"        -> dauMau _,
    "q_session_window" -> sessionWindowAgg _,
    "q_approx_stats"   -> approxStats _,
    "q_rollup"         -> rollupSummary _,
    "q_cube"           -> cubeSummary _,
    "q_ntile"          -> ntileBuckets _,
    "q_rfm"            -> rfmSegments _,
    "q_hll_reagg"      -> hllReagg _,
    "q_kll_reagg"      -> kllReagg _,
    "q_theta_intersect" -> thetaIntersect _,
    "q_theta_diff"     -> thetaDiff _,
    "q_heavy_hitters"  -> heavyHitters _,
    "q_pivot"          -> pivotStatus _,
    "q_running_total"  -> runningTotal _,
    "q_topn_per_group" -> topnPerGroup _,
    "q_shipping_priority" -> shippingPriority _,
    "q_local_volume"   -> localVolume _,
    "q_window_funcs"   -> windowFuncs _,
    "q_grouping_sets"  -> groupingSetsSummary _,
    "q_corr_stats"     -> corrStats _,
    "q_acf"            -> acf _,
    "q_cusum"          -> cusum _,
    "q_wealth_gini"    -> wealthGini _,
    "q_lorenz"         -> lorenz _,
    "q_hhi"            -> hhi _,
    "q_histogram"      -> histogram _,
    "q_json_extract"   -> jsonExtract _,
    "q_string_funcs"   -> stringFuncs _,
    "q_date_agg"       -> dateAgg _,
    "q_top_returns"    -> topReturns _,
    "q_funnel"         -> funnel _,
    "q_cohort"         -> cohortRetention _,
    "q_transitions"    -> transitions _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_ewma"           -> ewmaSql,
    "q_scd2"           -> scd2HistorySql,
    "q_scd1_merge"     -> scd1MergeSql,
    "q_winsorize"      -> winsorizeSql,
    "q_chisq"          -> chiSquareSql,
    "q_ab_test"        -> abTestSql,
    "q_basket_lift"    -> basketLiftSql,
    "q_streaks"        -> orderStreaksSql,
    "q_path_trigrams"  -> pathTrigramsSql,
    "q_funnel3"        -> funnel3Sql,
    "q_reagg_month"    -> reaggMonthSql,
    "q_range_frame"    -> rangeFrameSql,
    "q_envelope_parse" -> envelopeParseSql,
    "q_windowed_agg"   -> windowedAggSql,
    "q_hopping_agg"    -> hoppingAggSql,
    "q_sessionize"     -> sessionizeSql,
    "q_session_features" -> sessionFeaturesSql,
    "q_mad_anomalies"  -> madAnomaliesSql,
    "q_interarrival"   -> interarrivalSql,
    "q_quantiles"      -> quantilesSql,
    "q_ordered_stats"  -> orderedStatsSql,
    "q_running_distinct" -> runningDistinctSql,
    "q_event_path"     -> eventPathSql,
    "q_dau_mau"        -> dauMauSql,
    "q_session_window" -> sessionWindowAggSql,
    "q_rollup"         -> rollupSummarySql,
    "q_cube"           -> cubeSummarySql,
    "q_ntile"          -> ntileBucketsSql,
    "q_rfm"            -> rfmSegmentsSql,
    "q_hll_reagg"      -> hllReaggSql,
    "q_kll_reagg"      -> kllReaggSql,
    "q_theta_intersect" -> thetaIntersectSql,
    "q_theta_diff"     -> thetaDiffSql,
    "q_heavy_hitters"  -> heavyHittersSql,
    "q_pivot"          -> pivotStatusSql,
    "q_running_total"  -> runningTotalSql,
    "q_topn_per_group" -> topnPerGroupSql,
    "q_approx_stats"   -> approxStatsSql,
    "q_shipping_priority" -> shippingPrioritySql,
    "q_local_volume"   -> localVolumeSql,
    "q_cdc_extract"    -> cdcExtractSql,
    "q_epoch_micros"   -> epochMicrosSql,
    "q_agg_count_avg"  -> aggCountAvgSql,
    "q_topk_group"     -> topkGroupSql,
    "q_join_inner"     -> joinInnerSql,
    "q_join_left_agg"  -> joinLeftAggSql,
    "q_flagship_bonus" -> flagshipBonusSql,
    "q_flagship_sql"   -> flagshipBonusSql,
    "q_masked_view"    -> maskedViewSql,
    "q_validate_threshold" -> validateThresholdSql,
    "q_anti_fk"        -> antiFkSql,
    "q_semi_exists"    -> semiExistsSql,
    "q_join_full"      -> joinFullOuterSql,
    "q_set_ops"        -> setOpsSql,
    "q_expectations"   -> expectationsSql,
    "q_profile"        -> profileTableSql,
    "q_sum_metrics"    -> sumMetricsSql,
    "q_count_by_flag"  -> countByFlagSql,
    "q_count_star"     -> countStarSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_window_funcs"   -> windowFuncsSql,
    "q_grouping_sets"  -> groupingSetsSummarySql,
    "q_corr_stats"     -> corrStatsSql,
    "q_acf"            -> acfSql,
    "q_cusum"          -> cusumSql,
    "q_wealth_gini"    -> wealthGiniSql,
    "q_lorenz"         -> lorenzSql,
    "q_hhi"            -> hhiSql,
    "q_histogram"      -> histogramSql,
    "q_json_extract"   -> jsonExtractSql,
    "q_string_funcs"   -> stringFuncsSql,
    "q_date_agg"       -> dateAggSql,
    "q_top_returns"    -> topReturnsSql,
    "q_funnel"         -> funnelSql,
    "q_cohort"         -> cohortRetentionSql,
    "q_transitions"    -> transitionsSql,
  )
}
