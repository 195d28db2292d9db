package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model-evaluation statistics over scored rows — the offline-eval
  * counterpart to the training-data ops (quality scores, curation gates,
  * kNN label accuracy). The reference's analytics layer stops at counts
  * and averages (SURVEY §2.4); a training pipeline additionally needs
  * threshold-free ranking metrics (ROC AUC) and calibration tables for
  * the quality classifiers it trains (e.g. the fastText-style filters
  * whose scores gate curation recipes).
  *
  * Both queries treat `events` as a scored eval set: `value` is the
  * model score, `event_type = 'purchase'` is the positive label. Both
  * are EXACT and cross-engine reproducible: every accumulation is an
  * integer (or exact-decimal) sum, with one IEEE division per output
  * column — the q_corr_stats contract (no streaming-double drift, no
  * libm ln).
  */
object Eval {

  // ---------------------------------------------------------------------------
  // Exact ROC AUC via the Mann–Whitney rank statistic, tie-corrected with
  // average ranks: AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N). Computed at
  // the DISTINCT-SCORE grain: one groupBy collapses the corpus to
  // (score, count, positives), a running count gives each tie group its
  // rank offset, and the rank sum folds into one integer S2 =
  // Σ p·(2·cum + c + 1) (twice the positive rank sum, kept doubled so it
  // stays integral). AUC = (S2 − P(P+1)) / (2·P·N) — exact integers into
  // one final division, so both engines agree bit-for-bit.
  //
  // Scale shape: the only per-row pass is the map-side-combined groupBy;
  // everything after runs at the distinct-score grain. Scores here are
  // cent-quantized (two decimals), so that grain is bounded by the score
  // codomain (~50k rows at ANY corpus size), not by |rows| — which is why
  // the unpartitioned running-count window over it is safe at 100 TB
  // (same boundedness argument as the zipf top-100 window). For
  // continuous unquantized scores the same plan runs after a fixed-
  // precision round of the score column.
  // ---------------------------------------------------------------------------
  def auc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byScore = Tables.events(s, dir)
      .selectExpr("value AS score",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS y")
      .groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").as("p"))
    val w = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum", coalesce(sum($"c").over(w), lit(0L)))
      // per-group product in DECIMAL(38,0): at petabyte row counts the
      // bigint product p·(2·cum+c+1) would overflow; decimal partials
      // merge exactly (the corr-stats rule)
      .agg(
        sum($"p".cast("decimal(38,0)")).as("pos"),
        sum($"c".cast("decimal(38,0)")).as("tot"),
        sum(($"p".cast("decimal(38,0)")
          * (lit(2) * $"cum" + $"c" + lit(1)).cast("decimal(38,0)")).cast("decimal(38,0)")).as("s2"))
      .selectExpr(
        "cast(pos as bigint) AS n_pos",
        "cast(tot - pos as bigint) AS n_neg",
        "cast(s2 - pos * (pos + 1) as double) / cast(2 * pos * (tot - pos) as double) AS auc")
  }
  val aucSql: String =
    """WITH s AS (
      |  SELECT value AS score,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (SELECT score, count(*) AS c, sum(y) AS p FROM s GROUP BY score),
      |r AS (SELECT c, p,
      |             COALESCE(sum(c) OVER (ORDER BY score
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |      FROM g),
      |a AS (SELECT sum(p) AS pos, sum(c) AS tot,
      |             sum(p * (2 * cum + c + 1)) AS s2
      |      FROM r)
      |SELECT CAST(pos AS BIGINT) AS n_pos,
      |       CAST(tot - pos AS BIGINT) AS n_neg,
      |       CAST(s2 - pos * (pos + 1) AS DOUBLE)
      |         / CAST(2 * pos * (tot - pos) AS DOUBLE) AS auc
      |FROM a
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Calibration table (reliability diagram data): fixed-width score bins
  // with observed positive rate and mean score per bin — the standard
  // check that a quality classifier's scores mean what they claim before
  // they gate a curation recipe. Fixed-width binning by an explicit
  // floor-of-division formula (the q_histogram rule — engine
  // width_bucket edge conventions differ); one partial+final aggregation,
  // bucket evaluates in the scan. Mean score sums cent-exact
  // DECIMAL(18,2) (never raw doubles — summation order), one division
  // per output column.
  // ---------------------------------------------------------------------------
  /** Fixed-width score bin (the q_histogram explicit-formula rule) —
    * package-visible so the streaming drift monitor bins identically. */
  private[graft] def bucketExpr(c: String): String =
    s"least(cast(9 as bigint), cast(floor($c / cast(50 as double)) as bigint))"
  private val calBucket = bucketExpr("score")
  def calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .selectExpr("value AS score",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS y")
      .selectExpr(s"$calBucket AS bucket", "score", "y")
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n"),
        sum($"y").cast("long").as("n_pos"),
        sum($"score".cast("decimal(18,2)")).as("ssum"))
      .selectExpr("bucket", "n", "n_pos",
        "cast(n_pos as double) / cast(n as double) AS pos_rate",
        "cast(ssum as double) / cast(n as double) AS mean_score")
  }
  val calibrationSql: String =
    s"""WITH s AS (
       |  SELECT value AS score,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events)
       |SELECT $calBucket AS bucket,
       |       count(*) AS n,
       |       CAST(sum(y) AS BIGINT) AS n_pos,
       |       CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
       |       CAST(CAST(sum(CAST(score AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS mean_score
       |FROM s GROUP BY 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Distribution-drift report: total variation distance between the score
  // distributions of the FIRST and SECOND half of the ingest (event_id is
  // ingest-ordered — the dedup-incremental split convention), per event
  // type. TVD = ½·Σ_b |p_b − q_b| is the drift statistic that needs NO
  // logarithm (PSI and KL divide by libm ln — not bit-portable, the BM25
  // rule) and has a clean exact form: with integer bin counts c1/c2 and
  // window totals n1/n2,  TVD = Σ_b |c1_b·n2 − c2_b·n1| / (2·n1·n2) —
  // an exact integer numerator summed in DECIMAL(38,0), ONE IEEE division
  // per type. The pipeline use: re-train / re-weight triggers when a
  // source's incoming quality-score distribution drifts from the corpus.
  //
  // Scale shape: one partial+final count aggregation at (type, half, bin)
  // grain — map-side combined, so the shuffle carries ≤ types·2·bins rows
  // per task regardless of |events|; the totals join is a broadcast of
  // |types| rows. Nothing after the first aggregation scales with input.
  // ---------------------------------------------------------------------------
  def driftTvd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val split = ev.agg(max($"event_id")).first().getLong(0) / 2L + 1L
    val binned = ev.selectExpr("event_type",
      s"CASE WHEN event_id < ${split}L THEN 0 ELSE 1 END AS half",
      s"$calBucket".replace("score", "value") + " AS bucket")
    val counts = graft.Materialize.lazyCut(
      binned.groupBy($"event_type", $"bucket")
        .agg(
          sum(when($"half" === 0, lit(1L)).otherwise(lit(0L))).as("c1"),
          sum(when($"half" === 1, lit(1L)).otherwise(lit(0L))).as("c2")))
    val totals = counts.groupBy($"event_type")
      .agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    counts.join(broadcast(totals), "event_type")
      .groupBy($"event_type")
      .agg(
        first($"n1").as("n1"), first($"n2").as("n2"),
        sum(abs($"c1" * $"n2" - $"c2" * $"n1").cast("decimal(38,0)")).as("num"))
      .selectExpr("event_type",
        "cast(n1 as bigint) AS n_first", "cast(n2 as bigint) AS n_second",
        "cast(num as double) / cast(2 * n1 * n2 as double) AS tvd")
  }
  val driftTvdSql: String = {
    val bucket = calBucket.replace("score", "value")
    s"""WITH sp AS (SELECT max(event_id) // 2 + 1 AS split FROM events),
       |b AS (SELECT event_type,
       |             CASE WHEN event_id < (SELECT split FROM sp) THEN 0 ELSE 1 END AS half,
       |             $bucket AS bucket
       |      FROM events),
       |c AS (SELECT event_type, bucket,
       |             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
       |             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
       |      FROM b GROUP BY event_type, bucket),
       |t AS (SELECT event_type, sum(c1) AS n1, sum(c2) AS n2
       |      FROM c GROUP BY event_type)
       |SELECT c.event_type,
       |       CAST(t.n1 AS BIGINT) AS n_first,
       |       CAST(t.n2 AS BIGINT) AS n_second,
       |       CAST(sum(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS DOUBLE)
       |         / CAST(2 * t.n1 * t.n2 AS DOUBLE) AS tvd
       |FROM c JOIN t ON c.event_type = t.event_type
       |GROUP BY c.event_type, t.n1, t.n2
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Precision/recall/F1 threshold sweep (PR-curve table): one row per
  // candidate decision threshold (the 10 bin lower bounds), with the
  // confusion counts and ratios a pipeline reads to PICK the gating
  // threshold for a quality classifier. Counts fold from the same
  // (bin, count, positives) grain as the calibration table; TP/FP at each
  // threshold are SUFFIX sums over the 10-row bin relation (descending
  // running-total window — bounded grain, same argument as q_auc), and
  // precision/recall/F1 are exact integer ratios: F1 = 2·TP/(2·TP+FP+FN)
  // — one division per output column, no intermediate float compounding.
  // ---------------------------------------------------------------------------
  def prCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binned = Tables.events(s, dir)
      .selectExpr("value AS score",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS y")
      .selectExpr(s"$calBucket AS bucket", "y")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("c"), sum($"y").as("p"))
    val wSuffix = Window.orderBy($"bucket".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("npred", sum($"c").over(wSuffix))
      .withColumn("tp", sum($"p").over(wSuffix))
      .withColumn("pos", sum($"p").over(wAll))
      .selectExpr(
        "cast(bucket * 50 as bigint) AS threshold",
        "npred AS n_pred_pos", "tp",
        "cast(tp as double) / cast(npred as double) AS precision",
        "cast(tp as double) / cast(pos as double) AS recall",
        "cast(2 * tp as double) / cast(npred + pos as double) AS f1")
  }
  val prCurveSql: String =
    s"""WITH s AS (
       |  SELECT value AS score,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events),
       |b AS (SELECT $calBucket AS bucket, count(*) AS c, sum(y) AS p
       |      FROM s GROUP BY 1),
       |r AS (SELECT bucket,
       |             sum(c) OVER (ORDER BY bucket DESC
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS npred,
       |             sum(p) OVER (ORDER BY bucket DESC
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
       |             sum(p) OVER () AS pos
       |      FROM b)
       |SELECT CAST(bucket * 50 AS BIGINT) AS threshold,
       |       CAST(npred AS BIGINT) AS n_pred_pos,
       |       CAST(tp AS BIGINT) AS tp,
       |       CAST(tp AS DOUBLE) / CAST(npred AS DOUBLE) AS precision,
       |       CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) AS recall,
       |       CAST(2 * tp AS DOUBLE) / CAST(npred + pos AS DOUBLE) AS f1
       |FROM r
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Volume-trend detection: per event type, the OLS slope and intercept of
  // DAILY event counts against the epoch-day index — the ingest-health
  // trend a pipeline watches for a decaying source (negative slope) or a
  // runaway crawler (positive). Same exactness recipe as q_corr_stats:
  // (day, count) pairs are exact integers, the five moment sums accumulate
  // in DECIMAL(38,0), and the closed-form slope/intercept text is spliced
  // into both engines verbatim. The day index derivation differs per
  // engine (unix_date vs epoch seconds / 86400 — both exact integers);
  // only the FLOAT formula must be textually identical.
  //
  // Scale shape: one partial+final count to the (type, day) grain — the
  // only pass over raw events — then moments over types × days rows.
  // ---------------------------------------------------------------------------
  private val olsFormulas = Seq(
    "(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope",
    "(syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd AS intercept")

  def trendSlope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .selectExpr("event_type", "unix_date(cast(ts as date)) AS x")
      .groupBy($"event_type", $"x")
      .agg(count(lit(1)).as("y"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).as("sx"),
        sum($"y".cast("decimal(38,0)")).as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"))
      .selectExpr("event_type", "n AS n_days",
        "cast(n as double) AS nd", "cast(sx as double) AS sxd",
        "cast(sy as double) AS syd", "cast(sxx as double) AS sxxd",
        "cast(sxy as double) AS sxyd")
      .selectExpr(Seq("event_type", "n_days") ++ olsFormulas: _*)
  }
  val trendSlopeSql: String =
    s"""WITH d AS (
       |  SELECT event_type,
       |         CAST(date_part('epoch', CAST(ts AS DATE)) AS BIGINT) // 86400 AS x
       |  FROM events),
       |g AS (SELECT event_type, x, count(*) AS y FROM d GROUP BY 1, 2),
       |m AS (SELECT event_type, count(*) AS n,
       |             sum(x) AS sx, sum(y) AS sy,
       |             sum(x * x) AS sxx, sum(x * y) AS sxy
       |      FROM g GROUP BY event_type),
       |f AS (SELECT event_type, n AS n_days,
       |             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
       |             CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
       |             CAST(sxy AS DOUBLE) AS sxyd
       |      FROM m)
       |SELECT event_type, n_days,
       |       ${olsFormulas.mkString(",\n       ")}
       |FROM f
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Deterministic Poisson-bootstrap confidence interval — error bars for a
  // corpus statistic in ONE pass, no resampling loop: the classic
  // large-scale bootstrap (per (row, replicate) weight ~ Poisson(1),
  // within-replicate weighted mean, percentile CI over replicates), made
  // engine-reproducible by drawing the weights from md5 instead of an RNG.
  // The 48-bit hash of (doc_id, replicate) compares against PRECOMPUTED
  // integer thresholds floor(CDF_Poisson(1)(k)·2^48) — pure integer
  // comparisons, no libm exp at query time (the e^-1 family is baked into
  // the literals below). Metric here: mean document length in chars.
  // Scale: the replicate dimension multiplies COMPUTE, not shuffle — the
  // per-replicate integer sums combine map-side, so the exchange carries
  // B rows per partition; the percentile window runs over B rows total.
  // ---------------------------------------------------------------------------
  private val BootB = 200
  /** floor(P(Poisson(1) ≤ k) · 2^48) for k = 0..6; u ≥ last → weight 7.
    * Constants from the exact cumulative sums of e^-1/k! — computed once
    * here, integer literals in both engines' SQL. */
  private val poissonThresholds = Seq(
    103548857136060L, 207097714272121L, 258872142840152L, 276130285696162L,
    280444821410164L, 281307728552965L, 281451546410098L)

  private def bootWeightCase(u: String): String =
    poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $u < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")
  private def bootWeightCaseDuck(u: String): String =
    poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  def bootstrapCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val uExpr = "cast(conv(substr(md5(cast(concat(cast(doc_id as string), '#', cast(b as string)) as binary)), 1, 12), 16, 10) as bigint)"
    // Two round-18 measured fixes: (1) the md5 draw is projected ONCE per
    // replicate row before the CASE — inlining it into every WHEN branch
    // recomputed it per threshold probe; (2) the doc×B explode and the md5
    // run ABOVE a spreadForAgg exchange (only the tiny (doc_id, y)
    // relation shuffles), so the replicate build parallelizes instead of
    // serializing on a one-row-group scan. 1.88 s -> ~0.5 s at sf0.1.
    val reps = graft.Materialize.spreadForAgg(
      Tables.documents(s, dir)
        .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS y"))
      .selectExpr("doc_id", "y", s"explode(sequence(1, $BootB)) AS b")
      .selectExpr("b", "y", s"$uExpr AS u")
      .selectExpr("b", "y", s"${bootWeightCase("u")} AS w")
      .groupBy($"b")
      .agg(sum($"w" * $"y").as("swy"), sum($"w").as("sw"))
      .selectExpr("b",
        "CASE WHEN sw = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) END AS mean_b")
    // B rows: the rank window is over the replicate relation, never the corpus
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy($"mean_b".asc, $"b".asc)))
    val lo = ranked.filter($"rn" === BootB / 20).selectExpr("mean_b AS ci_lo")
    val hi = ranked.filter($"rn" === BootB - BootB / 20).selectExpr("mean_b AS ci_hi")
    val point = Tables.documents(s, dir)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length($"text").cast("long")).as("sy"))
      .selectExpr("n_docs", "CAST(sy AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_len")
    point.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
  }
  val bootstrapCiSql: String = {
    val uDuck = "('0x' || substr(md5(doc_id::VARCHAR || '#' || b::VARCHAR), 1, 12))::BIGINT"
    s"""WITH reps AS (
       |  SELECT b, CAST(sum(w * y) AS BIGINT) AS swy, CAST(sum(w) AS BIGINT) AS sw
       |  FROM (
       |    SELECT b, CAST(length(text) AS BIGINT) AS y,
       |           ${bootWeightCaseDuck(uDuck)} AS w
       |    FROM documents, (SELECT unnest(range(1, ${BootB + 1})) AS b) bs)
       |  GROUP BY b),
       |means AS (
       |  SELECT b, CASE WHEN sw = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) END AS mean_b
       |  FROM reps),
       |ranked AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b ASC, b ASC) AS rn FROM means),
       |lo AS (SELECT mean_b AS ci_lo FROM ranked WHERE rn = ${BootB / 20}),
       |hi AS (SELECT mean_b AS ci_hi FROM ranked WHERE rn = ${BootB - BootB / 20}),
       |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(sum(CAST(length(text) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS BIGINT) AS mean_len
       |       FROM documents)
       |SELECT n_docs, mean_len, ci_lo, ci_hi FROM pt, lo, hi
       |""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bootstrap_ci"  -> bootstrapCi _,
    "q_auc"         -> auc _,
    "q_calibration" -> calibration _,
    "q_drift_tvd"   -> driftTvd _,
    "q_pr_curve"    -> prCurve _,
    "q_trend_slope" -> trendSlope _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_bootstrap_ci" -> bootstrapCiSql,
    "q_auc"         -> aucSql,
    "q_calibration" -> calibrationSql,
    "q_drift_tvd"   -> driftTvdSql,
    "q_pr_curve"    -> prCurveSql,
    "q_trend_slope" -> trendSlopeSql,
  )
}
