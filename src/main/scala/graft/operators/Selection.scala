package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-SELECTION operators for the training-data pipeline: importance
  * weighting against a target distribution (DSIR), closed-form model
  * fitting from distributed sufficient statistics (ridge regression), and
  * Pareto-front document curation. These are the "which data do I keep"
  * layer that sits between the quality/dedup passes and the shard writer.
  *
  * Scale shape shared by all three: ONE corpus scan producing tiny
  * (O(buckets) / O(1) / O(distinct-value)) intermediates, never a
  * corpus-sized shuffle. Cross-engine exactness follows the repo contract:
  * integer sufficient statistics (order-independent sums), then closed-form
  * double arithmetic spliced VERBATIM into both the Spark and DuckDB query
  * texts so every IEEE operation happens in the same order.
  */
object Selection {
  import Tok.{toksDuck, toksExpr}

  // ---------------------------------------------------------------------------
  // DSIR-style importance weights (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): score each raw document by
  // how much its hashed-unigram profile resembles a TARGET subcorpus (here
  // the English slice) relative to the raw corpus. The published estimator
  // is a product of per-feature probability ratios (a log-sum); libm `log`
  // is not bit-portable across engines (same reason BM25 here uses a
  // rational idf), so the score is the RATIO-OF-AVERAGES form — per-doc
  // integer sums of target/raw bucket counts with add-one smoothing,
  // finishing in exactly one double expression shared by both engines:
  //   score = ((sum_ct + n) * (Nraw + B)) / ((sum_cr + n) * (Ntgt + B))
  // which is > 1 iff the doc's tokens are on average more frequent in the
  // target than in the raw corpus. Ranking by it reproduces the
  // frequency-ratio family of DSIR at any corpus size.
  //
  // Scale: bucket count tables are B = 64 rows → broadcast joins; the only
  // shuffle carries (doc_id, integer partial sums) with map-side combine.
  // The count tables are exactly the "hashed n-gram statistics" DSIR
  // persists once per target — at 100 TB they are a stored artifact and the
  // scoring pass is a single scan + broadcast.
  // ---------------------------------------------------------------------------
  private val B = 64
  /** Stable token → bucket hash, identical on both engines (md5 prefix as
    * integer, mod B). Same construction as TextAnalysis's bigram hash. */
  private def tokHashSparkOn(v: String) =
    s"cast(conv(substr(md5(cast($v as binary)), 1, 15), 16, 10) as bigint) % $B"
  private val tokHashSpark = tokHashSparkOn("tok")
  private val tokHashDuck = s"('0x' || substr(md5(tok), 1, 15))::BIGINT % $B"
  private val TargetPred = "lang = 'en'"

  /** The finishing score expression — ONE shared text so the batch query,
    * the DuckDB oracle, and the streaming scorer produce the bit-identical
    * double from the same integer sufficient statistics. */
  private[graft] val dsirScoreExpr =
    s"(CAST(sum_ct + n_tokens AS DOUBLE) * CAST(nraw + $B AS DOUBLE)) / (CAST(sum_cr + n_tokens AS DOUBLE) * CAST(ntgt + $B AS DOUBLE))"

  /** The DSIR statistics as a ONE-ROW at-rest artifact: dense per-bucket
    * count arrays (index b+1) + totals. This is what DSIR persists once per
    * target corpus; scoring any stream or shard of raw docs is then a
    * stateless broadcast of ~2·B longs — see [[graft.streaming.DsirScore]]. */
  private[graft] def dsirArtifact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("doc_id", TargetPred + " AS is_tgt", "explode(toks) AS tok")
      .selectExpr("doc_id", "is_tgt", s"$tokHashSpark AS b")
    val raw = toks.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = toks.filter($"is_tgt").groupBy($"b").agg(count(lit(1)).as("ct"))
    // dense 0..B-1 bucket domain so array indexing needs no join at read time
    s.range(0, B).toDF("b")
      .join(raw, Seq("b"), "left").join(tgt, Seq("b"), "left")
      .selectExpr("b", "coalesce(cr, 0L) AS cr", "coalesce(ct, 0L) AS ct")
      .agg(collect_list(struct($"b", $"cr", $"ct")).as("rows"))
      .selectExpr(
        "transform(array_sort(rows), x -> x.cr) AS cr_arr",
        "transform(array_sort(rows), x -> x.ct) AS ct_arr")
      .selectExpr("cr_arr", "ct_arr",
        "aggregate(cr_arr, 0L, (a, x) -> a + x) AS nraw",
        "aggregate(ct_arr, 0L, (a, x) -> a + x) AS ntgt")
  }

  /** Per-row integer sufficient statistics from the artifact arrays — the
    * stateless scoring kernel (token array + broadcast arrays → three
    * longs). Exact integer folds, so ordering cannot matter. */
  private[graft] val dsirRowStats = Seq(
    "CAST(size(toks) AS BIGINT) AS n_tokens",
    s"aggregate(transform(toks, t -> element_at(ct_arr, cast(${tokHashSparkOn("t")} as int) + 1)), 0L, (a, x) -> a + x) AS sum_ct",
    s"aggregate(transform(toks, t -> element_at(cr_arr, cast(${tokHashSparkOn("t")} as int) + 1)), 0L, (a, x) -> a + x) AS sum_cr")

  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // One tokenize+hash pass feeds the raw counts, the target counts, and
    // the per-doc scoring join — materialized so the chain runs once.
    val toks = graft.Materialize.lazyCut(
      Tables.documents(s, dir)
        .withColumn("toks", expr(toksExpr))
        .selectExpr("doc_id", TargetPred + " AS is_tgt", "explode(toks) AS tok")
        .selectExpr("doc_id", "is_tgt", s"$tokHashSpark AS b"))
    val raw = toks.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = toks.filter($"is_tgt").groupBy($"b").agg(count(lit(1)).as("ct"))
    // Bucket table: B rows, zero-filled where the target never saw the
    // bucket (add-one smoothing handles the zeros). Materialized: it feeds
    // BOTH the per-doc scoring join and the totals row — without the
    // barrier each consumer re-aggregates the full exploded corpus.
    val buckets = graft.Materialize.lazyCut(
      raw.join(tgt, Seq("b"), "left")
        .selectExpr("b", "cr", "coalesce(ct, 0L) AS ct"))
    val totals = buckets.agg(
      sum($"cr").cast("long").as("nraw"), sum($"ct").cast("long").as("ntgt"))
    toks.join(broadcast(buckets), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum($"ct").cast("long").as("sum_ct"),
        sum($"cr").cast("long").as("sum_cr"))
      .crossJoin(broadcast(totals))
      .selectExpr("doc_id", "n_tokens",
        s"$dsirScoreExpr AS dsir_score",
        s"$dsirScoreExpr >= CAST(1.0 AS DOUBLE) AS selected")
  }
  val dsirWeightsSql: String =
    s"""WITH tk AS (SELECT doc_id, $TargetPred AS is_tgt, unnest($toksDuck) AS tok
       |            FROM documents),
       |toks AS (SELECT doc_id, is_tgt, $tokHashDuck AS b FROM tk),
       |raw AS (SELECT b, count(*) AS cr FROM toks GROUP BY b),
       |tgt AS (SELECT b, count(*) AS ct FROM toks WHERE is_tgt GROUP BY b),
       |buckets AS (SELECT raw.b, cr, coalesce(ct, 0) AS ct
       |            FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
       |totals AS (SELECT CAST(sum(cr) AS BIGINT) AS nraw,
       |                  CAST(sum(ct) AS BIGINT) AS ntgt FROM buckets),
       |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |                   CAST(sum(ct) AS BIGINT) AS sum_ct,
       |                   CAST(sum(cr) AS BIGINT) AS sum_cr
       |            FROM toks JOIN buckets USING (b) GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |       (CAST(sum_ct + n_tokens AS DOUBLE) * CAST(nraw + $B AS DOUBLE)) / (CAST(sum_cr + n_tokens AS DOUBLE) * CAST(ntgt + $B AS DOUBLE)) AS dsir_score,
       |       (CAST(sum_ct + n_tokens AS DOUBLE) * CAST(nraw + $B AS DOUBLE)) / (CAST(sum_cr + n_tokens AS DOUBLE) * CAST(ntgt + $B AS DOUBLE)) >= CAST(1.0 AS DOUBLE) AS selected
       |FROM per_doc, totals
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Closed-form ridge regression from distributed sufficient statistics —
  // the canonical "train a linear quality model at 100 TB" pattern: the
  // corpus pass aggregates the 9 Gram/moment sums (all BIGINT-exact because
  // the features are integers: token count, stopword count → char count),
  // and the 3×3 ridge system (X'X + λI)β = X'y is solved in closed form by
  // Cramer's rule on the driver-free single-row relation. The whole model
  // fit is ONE map-side-combinable aggregate — no iteration, no collect, no
  // gradient steps; adding features grows the aggregate quadratically in d
  // (d ≤ a few dozen for quality models), never in corpus size.
  // Exactness: integer sums are order-independent; the Cramer expressions
  // are ONE shared SQL fragment evaluated in IEEE double identically by
  // both engines.
  // ---------------------------------------------------------------------------
  private val Lambda = 1 // ridge strength on the two slope terms (not the intercept)

  /** Cramer's-rule fragment for [[ridgeFit]], valid verbatim in Spark SQL
    * and DuckDB over columns (n, s1, s2, sy, s11, s12, s22, s1y, s2y). */
  private val cramer: Seq[String] = {
    val a = Map(
      "a11" -> "CAST(n AS DOUBLE)", "a12" -> "CAST(s1 AS DOUBLE)", "a13" -> "CAST(s2 AS DOUBLE)",
      "a22" -> s"CAST(s11 + $Lambda AS DOUBLE)", "a23" -> "CAST(s12 AS DOUBLE)",
      "a33" -> s"CAST(s22 + $Lambda AS DOUBLE)",
      "b1" -> "CAST(sy AS DOUBLE)", "b2" -> "CAST(s1y AS DOUBLE)", "b3" -> "CAST(s2y AS DOUBLE)")
    def det3(c1: (String, String, String), c2: (String, String, String), c3: (String, String, String)) =
      s"(${a(c1._1)} * (${a(c2._2)} * ${a(c3._3)} - ${a(c2._3)} * ${a(c3._2)}) - ${a(c2._1)} * (${a(c1._2)} * ${a(c3._3)} - ${a(c1._3)} * ${a(c3._2)}) + ${a(c3._1)} * (${a(c1._2)} * ${a(c2._3)} - ${a(c1._3)} * ${a(c2._2)}))"
    // columns of A (symmetric) and the rhs b, as (row1,row2,row3) triples
    val cA1 = ("a11", "a12", "a13"); val cA2 = ("a12", "a22", "a23"); val cA3 = ("a13", "a23", "a33")
    val cB = ("b1", "b2", "b3")
    val det = det3(cA1, cA2, cA3)
    Seq(
      "CAST(n AS BIGINT) AS n_docs",
      s"${det3(cB, cA2, cA3)} / $det AS beta0",
      s"${det3(cA1, cB, cA3)} / $det AS beta1",
      s"${det3(cA1, cA2, cB)} / $det AS beta2")
  }

  /** Scala mirror of the [[cramer]] SQL — IDENTICAL operation structure so
    * a JVM evaluation over the same integer sufficient statistics produces
    * the bit-identical doubles (JVM fp is strict; no FMA fusion). This is
    * what the STREAMING model-fit state fold finishes with, letting the
    * stream's emitted coefficients equal the batch query exactly. */
  def solveRidge(n: Long, s1: Long, s2: Long, sy: Long, s11: Long,
                 s12: Long, s22: Long, s1y: Long, s2y: Long): (Double, Double, Double) = {
    val a = Map(
      "a11" -> n.toDouble, "a12" -> s1.toDouble, "a13" -> s2.toDouble,
      "a22" -> (s11 + Lambda).toDouble, "a23" -> s12.toDouble,
      "a33" -> (s22 + Lambda).toDouble,
      "b1" -> sy.toDouble, "b2" -> s1y.toDouble, "b3" -> s2y.toDouble)
    def det3(c1: (String, String, String), c2: (String, String, String), c3: (String, String, String)): Double =
      a(c1._1) * (a(c2._2) * a(c3._3) - a(c2._3) * a(c3._2)) -
        a(c2._1) * (a(c1._2) * a(c3._3) - a(c1._3) * a(c3._2)) +
        a(c3._1) * (a(c1._2) * a(c2._3) - a(c1._3) * a(c2._2))
    val cA1 = ("a11", "a12", "a13"); val cA2 = ("a12", "a22", "a23"); val cA3 = ("a13", "a23", "a33")
    val cB = ("b1", "b2", "b3")
    val det = det3(cA1, cA2, cA3)
    (det3(cB, cA2, cA3) / det, det3(cA1, cB, cA3) / det, det3(cA1, cA2, cB) / det)
  }

  private val stopPred =
    TextAnalysis.stopwords.map(w => s"'$w'").mkString("t IN (", ",", ")")

  private def ridgeStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("source",
        "CAST(size(toks) AS BIGINT) AS x1",
        s"CAST(size(filter(toks, t -> $stopPred)) AS BIGINT) AS x2",
        "CAST(length(text) AS BIGINT) AS y")
      .selectExpr("source", "x1", "x2", "y", "x1*x1 AS x11", "x1*x2 AS x12",
        "x2*x2 AS x22", "x1*y AS x1y", "x2*y AS x2y", "y*y AS yy")

  // Supported scale bound for the BIGINT moment sums: Σx² < 2^63 holds up
  // to ~10^10 docs of ~10^4 tokens (n·x̄² ≈ 10^18 < 9.2·10^18); past that
  // Spark wraps while DuckDB promotes to HUGEINT — divergent, so beyond
  // the bound widen these sums to DECIMAL(38,0) (a one-line change: every
  // consumer, the Cramer fragment included, casts them to DOUBLE anyway).
  private def ridgeAggs = Seq(
    count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
    sum("y").as("sy"), sum("x11").as("s11"), sum("x12").as("s12"),
    sum("x22").as("s22"), sum("x1y").as("s1y"), sum("x2y").as("s2y"),
    sum("yy").as("syy"))

  /** DuckDB stats CTE shared by the fit and eval oracles. */
  private def ridgeStatsCte(groupCols: Seq[String]): String = {
    val sel = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val grp = if (groupCols.isEmpty) "" else groupCols.mkString("GROUP BY ", ", ", "")
    s"""WITH f AS (SELECT source, len(toks) AS x1,
       |                  len(list_filter(toks, t -> $stopPred)) AS x2,
       |                  length(text) AS y
       |           FROM (SELECT source, text, $toksDuck AS toks FROM documents)),
       |stats AS (SELECT $sel count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
       |                 sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
       |                 sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
       |                 sum(y*y) AS syy
       |          FROM f $grp)""".stripMargin
  }

  private def ridgeSqlBody(groupCols: Seq[String]): String = {
    val sel = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    s"""${ridgeStatsCte(groupCols)}
       |SELECT $sel ${cramer.mkString(",\n       ")}
       |FROM stats
       |""".stripMargin
  }

  def ridgeFit(s: SparkSession, dir: String): DataFrame =
    ridgeStats(s, dir).agg(ridgeAggs.head, ridgeAggs.tail: _*)
      .selectExpr(cramer: _*)
  val ridgeFitSql: String = ridgeSqlBody(Nil)

  // ---------------------------------------------------------------------------
  // Grouped model fitting — ONE corpus pass fits an independent ridge model
  // per source. This is the at-scale shape for per-domain / per-language /
  // per-tenant models: the sufficient statistics carry the GROUP BY key, so
  // fitting 10,000 models costs exactly one scan plus a 10,000-row
  // aggregate; the closed-form solve runs per row of the stats relation.
  // The degenerate-group case is real here (a source whose docs all share
  // a token count makes X'X singular) — ridge λ keeps the system
  // invertible, which is WHY the regularized form is the grouped default.
  // ---------------------------------------------------------------------------
  def ridgeBySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ridgeStats(s, dir).groupBy($"source")
      .agg(ridgeAggs.head, ridgeAggs.tail: _*)
      .selectExpr("source" +: cramer: _*)
  }
  val ridgeBySourceSql: String = ridgeSqlBody(Seq("source"))

  // ---------------------------------------------------------------------------
  // Model evaluation from the SAME sufficient statistics — for linear
  // models the training statistics are also the evaluation: the residual
  // sum of squares expands algebraically over (Σy², Σy, Σx·y, X'X, β), so
  // per-source R² and RMSE cost ZERO additional passes — the one scan that
  // fit 10k models also scored them. ss_res can go slightly negative only
  // through fp cancellation (guarded with greatest); ridge β is not the OLS
  // minimizer, so r2 may be < 1 even on perfectly linear groups — that gap
  // IS the regularization cost, worth seeing in the report.
  // ---------------------------------------------------------------------------
  private val ssResExpr =
    "CAST(syy AS DOUBLE) + CAST(n_docs AS DOUBLE) * beta0 * beta0 + beta1 * beta1 * CAST(s11 AS DOUBLE) + beta2 * beta2 * CAST(s22 AS DOUBLE) + CAST(2.0 AS DOUBLE) * (beta0 * beta1 * CAST(s1 AS DOUBLE) + beta0 * beta2 * CAST(s2 AS DOUBLE) + beta1 * beta2 * CAST(s12 AS DOUBLE)) - CAST(2.0 AS DOUBLE) * (beta0 * CAST(sy AS DOUBLE) + beta1 * CAST(s1y AS DOUBLE) + beta2 * CAST(s2y AS DOUBLE))"
  private val ssTotExpr =
    "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n_docs AS DOUBLE)"
  private val ridgeEvalFinal = Seq(
    "source", "n_docs", "beta0", "beta1", "beta2",
    "CASE WHEN ss_tot > CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) - ss_res / ss_tot ELSE CAST(0.0 AS DOUBLE) END AS r2",
    "sqrt(greatest(ss_res, CAST(0.0 AS DOUBLE)) / CAST(n_docs AS DOUBLE)) AS rmse")

  def ridgeEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ridgeStats(s, dir).groupBy($"source")
      .agg(ridgeAggs.head, ridgeAggs.tail: _*)
      .selectExpr(Seq("source", "sy", "syy", "s1", "s2", "s11", "s12",
        "s22", "s1y", "s2y") ++ cramer: _*)
      .selectExpr("source", "n_docs", "beta0", "beta1", "beta2",
        s"$ssTotExpr AS ss_tot", s"$ssResExpr AS ss_res")
      .selectExpr(ridgeEvalFinal: _*)
  }
  val ridgeEvalSql: String =
    s"""${ridgeStatsCte(Seq("source"))},
       |solved AS (
       |  SELECT source, sy, syy, s1, s2, s11, s12, s22, s1y, s2y,
       |         ${cramer.mkString(",\n         ")}
       |  FROM stats),
       |scored AS (
       |  SELECT source, n_docs, beta0, beta1, beta2,
       |         $ssTotExpr AS ss_tot, $ssResExpr AS ss_res
       |  FROM solved)
       |SELECT ${ridgeEvalFinal.mkString(",\n       ")}
       |FROM scored
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Pareto-front curation (the 2-D skyline): keep every document not
  // DOMINATED on (token count, distinct-token count) — no other doc is ≥ on
  // both axes and > on at least one. The classic curation question "which
  // docs are on the efficient frontier of length vs lexical diversity".
  //
  // Scale: the naive skyline is the O(n²) NOT-EXISTS self-join (that is the
  // oracle). The distributed plan exploits 2-D structure: group docs by x
  // (token count) keeping only each x's max y — the relation collapses to
  // |distinct x| rows (value-compressed, independent of corpus size) — then
  // one window pass in x-DESC order keeps the points whose y strictly
  // exceeds every higher-x point's y (running max). Dominance ties are
  // exact: equal (x, y) pairs never dominate each other, so every doc
  // matching a surviving (x, ymax) pair is on the front. The only
  // corpus-sized ops are the grouped max and the final semi-join back.
  // ---------------------------------------------------------------------------
  private def paretoFeats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("doc_id",
        "CAST(size(toks) AS BIGINT) AS n_tokens",
        "CAST(size(array_distinct(toks)) AS BIGINT) AS distinct_tokens")

  /** 2-D skyline of a (doc_id, n_tokens, distinct_tokens) relation. */
  private def skylineDocs(feats: DataFrame): DataFrame = {
    val s = feats.sparkSession
    import s.implicits._
    val byX = feats.groupBy($"n_tokens")
      .agg(max($"distinct_tokens").as("ymax"))
    // |distinct n_tokens| rows: the single-partition window is over a
    // value-compressed relation whose size is bounded by the value domain
    // (max doc length), not the corpus.
    val w = Window.orderBy($"n_tokens".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = byX
      .withColumn("prev_best", max($"ymax").over(w))
      .filter($"prev_best".isNull || $"ymax" > $"prev_best")
      .select($"n_tokens", $"ymax".as("distinct_tokens"))
    feats.join(front, Seq("n_tokens", "distinct_tokens"))
      .select($"doc_id", $"n_tokens", $"distinct_tokens")
  }

  def paretoDocs(s: SparkSession, dir: String): DataFrame =
    skylineDocs(paretoFeats(s, dir))

  // ---------------------------------------------------------------------------
  // Incremental Pareto-front maintenance: skylines satisfy
  //   front(C ∪ D) = front(front(C) ∪ D)
  // (a point dominated within C stays dominated in any superset, and an
  // undominated point of C ∪ D from C is by definition in front(C)), so a
  // delta batch only competes against the STORED front — O(|front| + |Δ|)
  // work per ingest, never a corpus re-scan. Same 90/10 doc_id split
  // convention as the other incremental passes; the stored front is the
  // pinned at-rest artifact. The oracle is the FULL-corpus naive skyline —
  // hash equality IS the merge-property proof at every scale factor.
  // ---------------------------------------------------------------------------
  def paretoIncr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = paretoFeats(s, dir)
    val split = Tables.documents(s, dir)
      .selectExpr("((max(doc_id) + 1) * 9) div 10 AS sp")
    val corpus = feats.join(broadcast(split), $"doc_id" < $"sp", "inner")
      .select($"doc_id", $"n_tokens", $"distinct_tokens")
    val delta = feats.join(broadcast(split), $"doc_id" >= $"sp", "inner")
      .select($"doc_id", $"n_tokens", $"distinct_tokens")
    val storedFront = graft.Materialize.lazyCut(skylineDocs(corpus))
    skylineDocs(storedFront.union(delta))
  }
  val paretoDocsSql: String =
    s"""WITH f AS (SELECT doc_id, len(toks) AS n_tokens,
       |                  len(list_distinct(toks)) AS distinct_tokens
       |           FROM (SELECT doc_id, $toksDuck AS toks FROM documents))
       |SELECT doc_id, n_tokens, distinct_tokens
       |FROM f a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM f b
       |  WHERE b.n_tokens >= a.n_tokens AND b.distinct_tokens >= a.distinct_tokens
       |    AND (b.n_tokens > a.n_tokens OR b.distinct_tokens > a.distinct_tokens))
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Priority sampling (Duffield, Lund & Thorup, JACM 2007): the weighted
  // without-replacement sampling scheme whose k-sample supports unbiased
  // subset-sum estimation with near-optimal variance — the right primitive
  // for "estimate corpus statistics from a tiny stored sample" at 100 TB.
  // Each row gets priority q = w / u with u uniform in (0,1]; the sample is
  // the top-k by q per stratum, and with τ = the (k+1)-th priority the
  // estimator ŵ = max(w, τ) is unbiased for every row's weight (rows beyond
  // the sample estimate 0). Strata smaller than k+1 are taken whole (τ = 0,
  // estimate exact).
  //
  // Cross-engine exactness: u is a DYADIC rational — a 52-bit md5-derived
  // integer h mapped to (h+1)/2^52 — so u, q = w/u, and max(w, τ) are all
  // single IEEE operations both engines perform identically; the estimator
  // sum over the ≤k sampled rows is an ORDERED left fold (by doc_id) so
  // summation order cannot matter — priorities are unbounded (w/u with u
  // down to 2⁻⁵²), which rules out both decimal casts (Spark's
  // double→decimal goes through the shortest string repr, not the exact
  // value) and fixed-point integer accumulation (overflow): the k-element
  // ordered fold is the only exact form, and k is tiny by construction.
  // Randomness is the hash, so the "draw" is
  // reproducible — the property tests re-check the estimator against the
  // exact stratum totals on every run.
  //
  // Scale: ONE scan; the only shuffle carries (source, doc_id, w, q) into a
  // per-stratum top-(k+1) — with a rank-k windowed filter Spark runs this
  // as partial top-k inside each map task (WindowGroupLimit pushdown), so
  // the exchange is k+1 rows per stratum per mapper, never the corpus.
  // ---------------------------------------------------------------------------
  private val SampleK = 10
  private val U52 = "4503599627370496.0" // 2^52 as an exact double literal
  private val uExprSpark =
    s"(CAST(CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 13), 16, 10) AS BIGINT) AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST($U52 AS DOUBLE)"
  private val uExprDuck =
    s"(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST($U52 AS DOUBLE)"

  def prioritySample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pri = Tables.documents(s, dir)
      .selectExpr("source", "doc_id", "CAST(n_chars AS BIGINT) AS w",
        s"CAST(n_chars AS DOUBLE) / ($uExprSpark) AS q")
    val w = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id".asc)
    val ranked = pri.withColumn("rk", row_number().over(w))
      .filter($"rk" <= SampleK + 1)
    // τ per stratum = the (k+1)-th priority (0.0 when the stratum has ≤ k
    // rows); the sample is ranks 1..k estimating ŵ = max(w, τ).
    val tau = ranked.groupBy($"source")
      .agg(max(when($"rk" === SampleK + 1, $"q").otherwise(lit(0.0))).as("tau"))
    val est = ranked.filter($"rk" <= SampleK)
      .join(broadcast(tau), "source")
      .selectExpr("source", "doc_id",
        "greatest(CAST(w AS DOUBLE), tau) AS w_est", "tau")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"), max($"tau").as("tau"),
        expr("aggregate(transform(array_sort(collect_list(struct(doc_id, w_est))), x -> x.w_est), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("est_total"))
    val truth = Tables.documents(s, dir).groupBy($"source")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(n_chars AS BIGINT)")).cast("long").as("true_total"))
    truth.join(est, "source")
      .select($"source", $"n_rows", $"n_sampled", $"tau", $"est_total", $"true_total")
  }
  val prioritySampleSql: String =
    s"""WITH pri AS (
       |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
       |         CAST(n_chars AS DOUBLE) / ($uExprDuck) AS q
       |  FROM documents),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rk
       |  FROM pri),
       |tau AS (
       |  SELECT source, max(CASE WHEN rk = ${SampleK + 1} THEN q ELSE CAST(0.0 AS DOUBLE) END) AS tau
       |  FROM ranked WHERE rk <= ${SampleK + 1} GROUP BY source),
       |est AS (
       |  SELECT r.source, count(*) AS n_sampled, max(t.tau) AS tau,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list(greatest(CAST(w AS DOUBLE), t.tau) ORDER BY doc_id)),
       |           (a, x) -> a + x) AS est_total
       |  FROM ranked r JOIN tau t ON r.source = t.source
       |  WHERE rk <= $SampleK GROUP BY r.source),
       |truth AS (
       |  SELECT source, count(*) AS n_rows,
       |         CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS true_total
       |  FROM documents GROUP BY source)
       |SELECT source, n_rows, n_sampled, tau, est_total, true_total
       |FROM truth JOIN est USING (source)
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // K-fold cross-validation from ONE corpus pass — the sufficient-statistic
  // algebra taken to its conclusion: per-fold statistics are a K-row
  // aggregate, the TOTAL is their sum, and fold k's training statistics are
  // total − fold_k (integer subtraction — leave-one-fold-out costs nothing).
  // Each fold's model solves the same Cramer fragment over its train stats
  // and scores the HELD-OUT fold via the algebraic residual expansion, so
  // K models are trained AND evaluated leakage-free in a single scan plus
  // a K-row computation. At 100 TB this is the only affordable CV shape:
  // the naive form re-scans the corpus K times.
  //
  // Folds are md5 buckets of doc_id (the q_ab_test idiom) —
  // engine/run/partitioning-independent assignment.
  // ---------------------------------------------------------------------------
  private val KFolds = 5
  private val foldSpark =
    s"cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 4), 16, 10) as int) % $KFolds"
  private val foldDuck =
    s"('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % $KFolds"
  private val statNames =
    Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")

  /** [[ssResExpr]] over prefixed held-out-fold stat columns. */
  private def ssResOver(p: String): String =
    s"CAST(${p}syy AS DOUBLE) + CAST(${p}n AS DOUBLE) * beta0 * beta0 + beta1 * beta1 * CAST(${p}s11 AS DOUBLE) + beta2 * beta2 * CAST(${p}s22 AS DOUBLE) + CAST(2.0 AS DOUBLE) * (beta0 * beta1 * CAST(${p}s1 AS DOUBLE) + beta0 * beta2 * CAST(${p}s2 AS DOUBLE) + beta1 * beta2 * CAST(${p}s12 AS DOUBLE)) - CAST(2.0 AS DOUBLE) * (beta0 * CAST(${p}sy AS DOUBLE) + beta1 * CAST(${p}s1y AS DOUBLE) + beta2 * CAST(${p}s2y AS DOUBLE))"
  private def ssTotOver(p: String): String =
    s"CAST(${p}syy AS DOUBLE) - CAST(${p}sy AS DOUBLE) * CAST(${p}sy AS DOUBLE) / CAST(${p}n AS DOUBLE)"
  private val kfoldFinal = Seq(
    "fold", "n_train", "n_test", "beta0", "beta1", "beta2",
    "CASE WHEN ss_tot > CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) - ss_res / ss_tot ELSE CAST(0.0 AS DOUBLE) END AS r2",
    "sqrt(greatest(ss_res, CAST(0.0 AS DOUBLE)) / CAST(n_test AS DOUBLE)) AS rmse")

  def kfoldRidge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr(s"$foldSpark AS fold",
        "CAST(size(toks) AS BIGINT) AS x1",
        s"CAST(size(filter(toks, t -> $stopPred)) AS BIGINT) AS x2",
        "CAST(length(text) AS BIGINT) AS y")
      .selectExpr("fold", "x1", "x2", "y", "x1*x1 AS x11", "x1*x2 AS x12",
        "x2*x2 AS x22", "x1*y AS x1y", "x2*y AS x2y", "y*y AS yy")
    val stats = graft.Materialize.lazyCut(
      feats.groupBy($"fold").agg(ridgeAggs.head, ridgeAggs.tail: _*))
    val totAggs = statNames.map(c => sum(col(c)).cast("long").as(s"t_$c"))
    val tot = stats.agg(totAggs.head, totAggs.tail: _*)
    val train = stats.crossJoin(broadcast(tot)).selectExpr(
      Seq("fold") ++ statNames.map(c => s"t_$c - $c AS $c") ++
        statNames.map(c => s"$c AS h$c"): _*)
    train
      .selectExpr(Seq("fold") ++ statNames.map(c => s"h$c") ++ cramer: _*)
      .selectExpr("fold", "n_docs AS n_train", "hn AS n_test",
        "beta0", "beta1", "beta2",
        s"${ssTotOver("h")} AS ss_tot", s"${ssResOver("h")} AS ss_res")
      .selectExpr(kfoldFinal: _*)
  }
  val kfoldRidgeSql: String = {
    val sums = statNames.map(c => s"sum($c) AS t_$c").mkString(", ")
    val trainCols = statNames.map(c => s"t_$c - $c AS $c").mkString(", ")
    val holdCols = statNames.map(c => s"$c AS h$c").mkString(", ")
    val hNames = statNames.map(c => s"h$c").mkString(", ")
    s"""WITH f AS (
       |  SELECT $foldDuck AS fold, len(toks) AS x1,
       |         len(list_filter(toks, t -> $stopPred)) AS x2,
       |         length(text) AS y
       |  FROM (SELECT doc_id, text, $toksDuck AS toks FROM documents)),
       |stats AS (SELECT fold, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
       |                 sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
       |                 sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
       |                 sum(y*y) AS syy
       |          FROM f GROUP BY fold),
       |tot AS (SELECT ${statNames.map(c => s"CAST(sum($c) AS BIGINT) AS t_$c").mkString(", ")} FROM stats),
       |train AS (SELECT fold, $trainCols, $holdCols FROM stats, tot),
       |solved AS (SELECT fold, $hNames,
       |                  ${cramer.mkString(",\n                  ")}
       |           FROM train),
       |ev AS (SELECT fold, n_docs AS n_train, hn AS n_test,
       |              beta0, beta1, beta2,
       |              ${ssTotOver("h")} AS ss_tot, ${ssResOver("h")} AS ss_res
       |       FROM solved)
       |SELECT ${kfoldFinal.mkString(",\n       ")}
       |FROM ev
       |""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_priority_sample" -> prioritySample _,
    "q_dsir_weights"    -> dsirWeights _,
    "q_ridge_fit"       -> ridgeFit _,
    "q_ridge_by_source" -> ridgeBySource _,
    "q_ridge_eval"      -> ridgeEval _,
    "q_kfold_ridge"     -> kfoldRidge _,
    "q_pareto_docs"     -> paretoDocs _,
    "q_pareto_incr"     -> paretoIncr _)

  def oracleSql: Map[String, String] = Map(
    "q_priority_sample" -> prioritySampleSql,
    "q_dsir_weights"    -> dsirWeightsSql,
    "q_ridge_fit"       -> ridgeFitSql,
    "q_ridge_by_source" -> ridgeBySourceSql,
    "q_ridge_eval"      -> ridgeEvalSql,
    "q_kfold_ridge"     -> kfoldRidgeSql,
    "q_pareto_docs"     -> paretoDocsSql,
    // incremental maintenance must reproduce the full-corpus skyline
    "q_pareto_incr"     -> paretoDocsSql)
}
