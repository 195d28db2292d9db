package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Temporal joins over the `events` stream table — the two classic operators
  * Spark has no native form for (builder guide: "as-of join, range join"),
  * built by composing built-ins (preference (a)): no custom strategy needed,
  * and the plans stay inside whole-stage codegen.
  *
  * As-of join (point-in-time attribution): for each left event, the latest
  * right event of the same key at-or-before it. The distributed shape is NOT
  * an inequality join (unbounded pair explosion): tag both sides, union,
  * and take a running `last(..., ignoreNulls)` over
  * `(key ORDER BY ts, side)` — exactly one shuffle on the key, identical to
  * what a sort-merge join would pay, regardless of time skew. The DuckDB
  * oracle uses its NATIVE `ASOF LEFT JOIN`, so two entirely different
  * algorithms must produce hash-identical rows.
  *
  * Range join (interval aggregation): count right events inside a bounded
  * window after each left event. The distributed shape buckets time by the
  * window length, replicates each left row to the (at most 2) buckets its
  * window overlaps, joins on `(key, bucket)`, then applies the precise
  * range predicate — bounded 2× replication instead of an O(n·m)
  * inequality join. All window arithmetic is integer epoch-µs on both
  * engines, so no timestamp-interval semantics can diverge.
  */
object Temporal {

  private val HourUs = 3600000000L // 1 h in epoch-µs

  /** Generic as-of join: for every `left` row, the latest `right` row with
    * `right.tsCol <= left.tsCol` for the same `key`. `right` must be unique
    * per (key, ts) — pre-aggregate it if not, or ties are nondeterministic
    * (DuckDB's ASOF has the same contract). Right payload columns come back
    * null when no prior right row exists (left-join semantics). The output
    * also carries `_rts`, the matched right row's timestamp (null when
    * unmatched) — callers compute lags from it or drop it. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol)
    // side 0 = right, 1 = left: at equal ts the right row sorts first, so
    // "at-or-before" includes it (matches ASOF's >= semantics).
    val taggedRight = right.select(
      Seq(col(key), col(tsCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col) :+ col(tsCol).as("_rts"): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(tsCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast("timestamp").as("_rts"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
      last(col("_rts"), ignoreNulls = true).over(w).as("_rts")
    taggedRight.unionByName(taggedLeft)
      .select(Seq(col(key), col(tsCol), col("_side")) ++ leftCols.map(col) ++ carried: _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Purchase → latest at-or-before signup of the same user (point-in-time
    * attribution). Signups are deduped to one per (user, ts) with max
    * event_id, identically on both engines, so as-of ties cannot occur. */
  def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("signup_id"))
    asofJoin(purchases, signups, "user_id", "ts", Seq("signup_id"))
      .select($"event_id", $"user_id", $"signup_id",
        (unix_micros($"ts") - unix_micros($"_rts")).as("lag_us"))
  }
  val asofAttributionSql: String =
    """WITH s AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS signup_id
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id, CAST(ts AS TIMESTAMP)
      |),
      |p AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, s.signup_id,
      |       epoch_us(p.ts) - epoch_us(s.ts) AS lag_us
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
      |""".stripMargin

  /** Per error event: how many purchases the same user made within the next
    * hour, window [ts, ts+1h). Bucketed band join: each error is replicated
    * to the ≤2 hour-buckets its window overlaps; purchases join on
    * (user_id, bucket); the precise µs predicate filters the boundary. */
  def rangeJoinCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", unix_micros($"ts").as("e_us"))
    // `div`, not `/`: Column `/` is double division, and epoch-µs values are
    // large enough that a misrounded bucket would silently drop matches.
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p_us"))
      .withColumn("bucket", expr(s"p_us div $HourUs"))
    val replicated = errors.select($"event_id", $"user_id", $"e_us",
      explode(array_distinct(array(
        expr(s"e_us div $HourUs"),
        expr(s"(e_us + ${HourUs - 1}) div $HourUs")))).as("bucket"))
    val matched = replicated.join(purchases, Seq("user_id", "bucket"))
      .filter($"p_us" >= $"e_us" && $"p_us" < $"e_us" + HourUs)
      .groupBy($"event_id").agg(count(lit(1)).as("n"))
    errors.join(matched, Seq("event_id"), "left")
      .select($"event_id", $"user_id",
        coalesce($"n", lit(0L)).cast("long").as("n_purchases"))
  }
  val rangeJoinCountSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
      |  FROM events WHERE event_type = 'error'
      |),
      |p AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT e.event_id, e.user_id,
      |       CAST(count(p.p_us) AS BIGINT) AS n_purchases
      |FROM e LEFT JOIN p
      |  ON p.user_id = e.user_id AND p.p_us >= e.e_us AND p.p_us < e.e_us + 3600000000
      |GROUP BY e.event_id, e.user_id
      |""".stripMargin

  /** First-touch revenue attribution: each purchase's value is credited to
    * the event type that OPENED the user's preceding hour of activity — the
    * marketing-attribution window query. Shape: ONE range-frame window per
    * user (the sessionizer's partitioning) computing min(struct(ts, type))
    * over [t−1h, t] — the struct-min carries the touch's type out of the
    * frame directly, so there is no self-join back to resolve the touch
    * instant and the only corpus exchange is the user_id hash. Struct
    * ordering is lexicographic (ts, then type) in both engines, which
    * makes equal-µs ties deterministic. Revenue folds in integer cents. */
  def firstTouch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("tsu"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"tsu".asc)
      .rangeBetween(-HourUs, 0)
    ev.withColumn("touch", min(struct($"tsu", $"event_type")).over(w))
      .filter($"event_type" === "purchase")
      .groupBy($"touch.event_type".as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"cents").cast("long").as("revenue_cents"))
  }
  val firstTouchSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_type, cents,
      |         min(struct_pack(tsu := tsu, event_type := event_type)) OVER (
      |           PARTITION BY user_id ORDER BY tsu
      |           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS touch
      |  FROM ev)
      |SELECT touch.event_type AS touch_type, count(*) AS n_purchases,
      |       CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM f
      |WHERE f.event_type = 'purchase'
      |GROUP BY touch.event_type
      |""".stripMargin

  /** SCD2 point-in-time lookup (the temporal-dimension face of
    * `q_scd2`): every click event is enriched with the purchase-dimension
    * VERSION that was valid at the click's instant — the "what did this
    * user's profile look like when they clicked" join every
    * warehouse-with-history runs.
    *
    * Because SCD2 intervals per key are chained and non-overlapping, the
    * interval-containment join (`valid_from <= ts < valid_to`) is exactly
    * an AS-OF join on `valid_from` — so the distributed shape reuses
    * [[asofJoin]]'s tag-union-window plan: one shuffle on the user key,
    * no inequality pair explosion, regardless of how many versions a hot
    * key accumulates. The oracle states the textbook interval predicate;
    * two different algorithms must agree row-for-row.
    *
    * Versions are deduped to one per (user, ts) with the max event_id
    * winning (`max_by` / `arg_max` — identical tie rule on both engines),
    * which also removes the zero-length `[t, t)` intervals duplicate
    * change timestamps would otherwise create. */
  def scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val versions = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("version_id"),
        expr("max_by(value, event_id)").as("version_value"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    asofJoin(clicks, versions, "user_id", "ts",
      Seq("version_id", "version_value"))
      .select($"event_id", $"user_id", $"version_id", $"version_value",
        (unix_micros($"ts") - unix_micros($"_rts")).as("age_us"))
  }
  val scd2LookupSql: String =
    """WITH v AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS valid_from,
      |         max(event_id) AS version_id,
      |         arg_max(value, event_id) AS version_value
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id, CAST(ts AS TIMESTAMP)),
      |dim AS (
      |  SELECT user_id, valid_from, version_id, version_value,
      |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
      |  FROM v),
      |c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, dim.version_id, dim.version_value,
      |       epoch_us(c.ts) - epoch_us(dim.valid_from) AS age_us
      |FROM c LEFT JOIN dim
      |  ON dim.user_id = c.user_id AND dim.valid_from <= c.ts
      | AND (dim.valid_to IS NULL OR c.ts < dim.valid_to)
      |""".stripMargin

  /** Time-weighted average (TWAP): each user's purchase value integrated
    * over the time it was "in effect" — Σ cents·Δt / Σ Δt, where Δt is the
    * µs gap to the NEXT purchase (step-function integration, the
    * finance/metrics standard). Users need ≥ 2 purchases spanning > 0 µs.
    *
    * Exactness: numerator and span are BIGINT (cents ≤ 10⁵ × month-scale
    * µs gaps ≈ 2.6e17 per user — inside int64); the final twap is ONE
    * int64→double conversion + one IEEE division, both correctly rounded
    * and identical across engines. One user-keyed window + one aggregate —
    * the sessionizer's exact shuffle shape. */
  def twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_us", lead(unix_micros($"ts"), 1).over(w))
      .filter($"next_us".isNotNull)
      .withColumn("gap_us", $"next_us" - unix_micros($"ts"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"gap_us").cast("long").as("span_us"),
        sum($"cents" * $"gap_us").cast("long").as("twap_num"))
      .filter($"span_us" > 0)
      .withColumn("twap_cents",
        $"twap_num".cast("double") / $"span_us".cast("double"))
  }
  val twapSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id, cents,
      |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           - epoch_us(ts) AS gap_us
      |  FROM p)
      |SELECT user_id, count(*) AS n_intervals,
      |       CAST(sum(gap_us) AS BIGINT) AS span_us,
      |       CAST(sum(cents * gap_us) AS BIGINT) AS twap_num,
      |       CAST(sum(cents * gap_us) AS DOUBLE) / CAST(sum(gap_us) AS DOUBLE) AS twap_cents
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY user_id
      |HAVING sum(gap_us) > 0
      |""".stripMargin

  /** Out-of-orderness profile — the watermark-sizing query: with
    * `event_id` as the arrival (ingestion) order, how far behind each
    * user's running-max event time do events arrive? `lateness =
    * running_max(ts) − ts` per user stream, aggregated per event type
    * (n, max, p50, p95). This is the empirical distribution
    * `withWatermark` delays should be read from — every streaming twin in
    * `graft.streaming` picks its watermark from exactly this curve.
    *
    * Scale: the running max is a user-keyed window (arbitrarily parallel),
    * not a global one; the final rollup is 5 rows. Lateness is integer µs;
    * interpolated percentiles of integers are exact binary rationals (the
    * q_interarrival determinism argument). */
  def outOfOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("late_us", max($"us").over(w) - $"us")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"late_us" > 0, 1L).otherwise(0L)).cast("long").as("n_late"),
        max($"late_us").as("max_late_us"),
        expr("percentile(late_us, 0.5)").as("p50_late_us"),
        expr("percentile(late_us, 0.95)").as("p95_late_us"))
  }
  val outOfOrderSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |l AS (
      |  SELECT event_type,
      |         max(us) OVER (PARTITION BY user_id ORDER BY event_id
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - us AS late_us
      |  FROM e)
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |       CAST(max(late_us) AS BIGINT) AS max_late_us,
      |       quantile_cont(late_us, 0.5) AS p50_late_us,
      |       quantile_cont(late_us, 0.95) AS p95_late_us
      |FROM l GROUP BY event_type
      |""".stripMargin

  /** Point-in-time-correct training-matrix assembly — the feature-store
    * operator: every purchase becomes a training row whose label is its
    * value and whose features are the user's click/view/error counts
    * STRICTLY BEFORE that instant. "Strictly before" is the leakage
    * boundary: a feature computed at-or-after the label's timestamp trains
    * on the future.
    *
    * Distributed shape: NOT a per-label correlated join (O(labels ×
    * history) pair blowup on hot users) — one user-keyed window pass with
    * `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` over epoch-µs
    * computes every running count in the same shuffle the sessionizer
    * pays. The oracle runs the textbook correlated left-join aggregation —
    * two different algorithms, one result. Same-µs events of other types
    * are excluded by both (the range frame ends 1 µs before the label). */
  def featureMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("n_click_before",
        coalesce(sum(when($"event_type" === "click", 1L)).over(w), lit(0L)))
      .withColumn("n_view_before",
        coalesce(sum(when($"event_type" === "view", 1L)).over(w), lit(0L)))
      .withColumn("n_error_before",
        coalesce(sum(when($"event_type" === "error", 1L)).over(w), lit(0L)))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"n_click_before", $"n_view_before",
        $"n_error_before", $"cents".as("label_cents"))
  }
  val featureMatrixSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |p AS (SELECT * FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |       CAST(count(*) FILTER (h.event_type = 'click') AS BIGINT) AS n_click_before,
      |       CAST(count(*) FILTER (h.event_type = 'view') AS BIGINT) AS n_view_before,
      |       CAST(count(*) FILTER (h.event_type = 'error') AS BIGINT) AS n_error_before,
      |       p.cents AS label_cents
      |FROM p LEFT JOIN e h
      |  ON h.user_id = p.user_id AND h.us < p.us
      |GROUP BY p.event_id, p.user_id, p.cents
      |""".stripMargin

  /** Bitemporal time travel — "what did we BELIEVE at transaction time K
    * about the state valid at V": purchases carry two time axes (valid
    * time = ts, transaction time = the monotone ingestion id), and the
    * query reconstructs the latest-valid version under BOTH cutoffs for a
    * 2×2 grid of (knowledge, validity) checkpoints — the audit query
    * behind "reproduce the report as it was published" (K = then) vs
    * "as corrected today" (K = now).
    *
    * Shape: the 4-row checkpoint grid broadcasts against the fact table
    * (one scan, no per-checkpoint rescans); one (user, checkpoint)-keyed
    * rank window picks each belief. Cutoff K1 is derived from the data
    * ((min+max) div 2 of the ingestion ids — engine-exact integers), so
    * the query is self-contained at any scale factor. */
  def bitemporal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir).filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val kBounds = p.agg(
      expr("(min(event_id) + max(event_id)) div 2").as("k1"),
      max($"event_id").as("k2"))
    val grid = kBounds.selectExpr(
      "explode(array(struct('k1' AS k_label, k1 AS k_id), struct('k2' AS k_label, k2 AS k_id))) AS kg")
      .select($"kg.k_label", $"kg.k_id")
      .crossJoin(s.sql(
        """SELECT explode(array(
          |  struct('v1' AS v_label, TIMESTAMP '2024-01-15 00:00:00' AS v_ts),
          |  struct('v2' AS v_label, TIMESTAMP '2024-02-01 00:00:00' AS v_ts))) AS vg
          |""".stripMargin).select($"vg.v_label", $"vg.v_ts"))
    val w = Window.partitionBy($"user_id", $"k_label", $"v_label")
      .orderBy($"ts".desc, $"event_id".desc)
    p.crossJoin(broadcast(grid))
      .filter($"event_id" <= $"k_id" && $"ts" <= $"v_ts")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"k_label", $"v_label", $"cents", $"event_id")
  }
  val bitemporalSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |kb AS (SELECT (min(event_id) + max(event_id)) // 2 AS k1,
      |              max(event_id) AS k2 FROM p),
      |kg AS (SELECT 'k1' AS k_label, k1 AS k_id FROM kb
      |       UNION ALL SELECT 'k2', k2 FROM kb),
      |vg AS (SELECT 'v1' AS v_label, TIMESTAMP '2024-01-15 00:00:00' AS v_ts
      |       UNION ALL SELECT 'v2', TIMESTAMP '2024-02-01 00:00:00'),
      |r AS (
      |  SELECT p.user_id, kg.k_label, vg.v_label, p.cents, p.event_id,
      |         row_number() OVER (PARTITION BY p.user_id, kg.k_label, vg.v_label
      |                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
      |  FROM p, kg, vg
      |  WHERE p.event_id <= kg.k_id AND p.ts <= vg.v_ts)
      |SELECT user_id, k_label, v_label, cents, event_id
      |FROM r WHERE rn = 1
      |""".stripMargin

  private val DayUs = 86400000000L

  /** Conversion-window funnel: of each day's signups, how many converted
    * to a purchase WITHIN 24 HOURS — the time-bounded funnel product
    * analytics runs (the unbounded `q_funnel` answers "ever converted";
    * this answers "converted inside the SLA window", a different number).
    *
    * Distributed shape: the bounded-bucket band join (the
    * [[rangeJoinCount]] plan) — each signup replicates to the ≤ 2
    * day-buckets its window overlaps, purchases join on (user, bucket),
    * the precise µs predicate trims the boundary, and min() picks the
    * first conversion. Never an unbounded inequality join. Day keys are
    * epoch-day integers (µs div 86400e6) — engine-exact, no date-type
    * round-trips. */
  def funnelWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val su = ev.filter($"event_type" === "signup")
      .select($"event_id".as("sid"), $"user_id", unix_micros($"ts").as("s_us"))
    val pu = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p_us"))
      .withColumn("bucket", expr(s"p_us div $DayUs"))
    val repl = su.select($"sid", $"user_id", $"s_us",
      explode(array_distinct(array(
        expr(s"s_us div $DayUs"),
        expr(s"(s_us + ${DayUs - 1}) div $DayUs")))).as("bucket"))
    val firstConv = repl.join(pu, Seq("user_id", "bucket"))
      .filter($"p_us" >= $"s_us" && $"p_us" < $"s_us" + DayUs)
      .groupBy($"sid").agg(min($"p_us").as("c_us"))
    su.join(firstConv, Seq("sid"), "left")
      .groupBy(expr(s"s_us div $DayUs").as("signup_day"))
      .agg(count(lit(1)).as("n_signups"),
        count($"c_us").as("n_converted"),
        sum($"c_us" - $"s_us").cast("long").as("sum_lag_us"))
  }
  val funnelWindowSql: String =
    s"""WITH su AS (
       |  SELECT event_id AS sid, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us
       |  FROM events WHERE event_type = 'signup'),
       |pu AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
       |  FROM events WHERE event_type = 'purchase'),
       |conv AS (
       |  SELECT su.sid, min(pu.p_us) AS c_us
       |  FROM su JOIN pu
       |    ON pu.user_id = su.user_id
       |   AND pu.p_us >= su.s_us AND pu.p_us < su.s_us + $DayUs
       |  GROUP BY su.sid)
       |SELECT su.s_us // $DayUs AS signup_day,
       |       count(*) AS n_signups,
       |       CAST(count(conv.c_us) AS BIGINT) AS n_converted,
       |       CAST(sum(conv.c_us - su.s_us) AS BIGINT) AS sum_lag_us
       |FROM su LEFT JOIN conv ON conv.sid = su.sid
       |GROUP BY 1
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitemporal"     -> bitemporal _,
    "q_funnel_window"  -> funnelWindow _,
    "q_asof_join"      -> asofAttribution _,
    "q_range_join"     -> rangeJoinCount _,
    "q_attribution"    -> firstTouch _,
    "q_scd2_lookup"    -> scd2Lookup _,
    "q_twap"           -> twap _,
    "q_out_of_order"   -> outOfOrder _,
    "q_feature_matrix" -> featureMatrix _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_bitemporal"   -> bitemporalSql,
    "q_funnel_window" -> funnelWindowSql,
    "q_asof_join"    -> asofAttributionSql,
    "q_range_join"   -> rangeJoinCountSql,
    "q_attribution"  -> firstTouchSql,
    "q_scd2_lookup"  -> scd2LookupSql,
    "q_twap"           -> twapSql,
    "q_out_of_order"   -> outOfOrderSql,
    "q_feature_matrix" -> featureMatrixSql,
  )
}
