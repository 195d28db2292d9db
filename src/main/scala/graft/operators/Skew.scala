package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-mitigation operators (builder mandate: salting for skew; AQE handles
  * moderate skew automatically — `spark.sql.adaptive.skewJoin` — but a
  * pathological hot key, e.g. one user with 10% of a 100 TB event log, needs
  * explicit salting because a single post-split partition must still hold the
  * whole hot-key aggregate/join-side).
  *
  * Both helpers are pure plan rewrites — deterministic salts from xxhash64 of
  * a unique column, no RNG, so results are replayable.
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates (count/sum):
    * phase 1 aggregates on (key, salt) — splitting a hot key across
    * `buckets` reducers — phase 2 re-aggregates on key alone. The phase-2
    * input is `buckets` rows per key, so its shuffle is trivially small.
    *
    * @param saltFrom unique-ish column used to derive the deterministic salt
    */
  def saltedCountSum(df: DataFrame, key: String, value: Column,
                     saltFrom: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(value).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_cnt")).cast("long").as("cnt"), sum(col("_sum")).as("sum"))

  /** Salted broadcast-free join for a skewed big side: the big side gets a
    * deterministic salt in [0, buckets); the small side is replicated once
    * per salt value (explode, ×buckets rows); the join key becomes
    * (key, salt), so a hot key's rows spread over `buckets` tasks.
    * Semantics identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  // ---------------------------------------------------------------------------
  // Oracle-paired queries: salting must be INVISIBLE in results — the oracle
  // is the plain GROUP BY / plain inner join, so the driver's hash compare
  // proves the two-phase rewrite is semantics-preserving.
  // ---------------------------------------------------------------------------

  /** Salted per-customer order aggregate; oracle = plain GROUP BY. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    saltedCountSum(Tables.orders(s, dir), "o_custkey",
      col("o_totalprice").cast("decimal(18,2)"), col("o_orderkey"), buckets = 32)
      .select(col("o_custkey"), col("cnt"),
        col("sum").cast("double").as("sum_price"))
  val saltedAggSql: String =
    """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY o_custkey
      |""".stripMargin

  /** Salted orders⋈customer join; oracle = plain inner join. */
  def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val small = Tables.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    saltedJoin(big, small, "o_custkey", col("o_orderkey"), buckets = 8)
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
  }
  val saltedJoinSql: String =
    """SELECT o_orderkey, o_custkey, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |""".stripMargin

  /** Join-size / skew estimator — the optimizer-statistics pass that
    * decides WHEN the salted rewrites above are worth their overhead: per
    * join key column, the degree histogram in log₂ buckets plus the exact
    * self-join cardinality contribution Σd² per bucket (the quantity a
    * skew-join planner compares against the per-task budget; one hot key's
    * d² dominating the sum is the signal to salt).
    *
    * Shape: ONE fact scan (both key columns melt through a single explode),
    * one aggregate to per-key degrees, one tiny rollup. Exact BIGINT
    * throughout; the log₂ bucket is `length(bin(d)) − 1` — identical
    * base-2 string semantics on both engines, no floating log. */
  def joinEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val deg = Tables.lineitem(s, dir)
      .selectExpr("explode(array(struct('l_partkey' AS join_col, l_partkey AS k)," +
        " struct('l_suppkey' AS join_col, l_suppkey AS k))) AS e")
      .select($"e.join_col", $"e.k")
      .groupBy($"join_col", $"k").agg(count(lit(1)).as("d"))
    deg.withColumn("bucket", expr("length(bin(d)) - 1"))
      .groupBy($"join_col", $"bucket")
      .agg(count(lit(1)).as("n_keys"),
        sum($"d").cast("long").as("rows"),
        sum($"d" * $"d").cast("long").as("est_pairs"))
  }
  val joinEstimateSql: String =
    """WITH m AS (
      |  SELECT 'l_partkey' AS join_col, l_partkey AS k FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey' AS join_col, l_suppkey AS k FROM lineitem),
      |deg AS (SELECT join_col, k, count(*) AS d FROM m GROUP BY 1, 2)
      |SELECT join_col, CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
      |       count(*) AS n_keys,
      |       CAST(sum(d) AS BIGINT) AS rows,
      |       CAST(sum(d * d) AS BIGINT) AS est_pairs
      |FROM deg GROUP BY 1, 2
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_agg"    -> saltedAgg _,
    "q_salted_join"   -> saltedJoinQ _,
    "q_join_estimate" -> joinEstimate _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_salted_agg"    -> saltedAggSql,
    "q_salted_join"   -> saltedJoinSql,
    "q_join_estimate" -> joinEstimateSql,
  )
}
