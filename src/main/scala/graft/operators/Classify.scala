package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed CLASSIFIER training — a damped-Newton (IRLS-shaped) logistic
  * fit from sufficient statistics, the "train a quality/language classifier
  * over the whole corpus" operator of a training-data pipeline (fastText-
  * style doc filters, CCNet-style LM gates are all this shape).
  *
  * Like ridge ([[Selection]]), the model is fit WITHOUT gradient descent or
  * a driver-side solver: each Newton step is ONE map-side-combinable
  * aggregate over the corpus producing a d²-sized statistics row, and the
  * 3×3 damped system (H + λI)δ = g is solved in closed form by Cramer's
  * rule inside the query. Two steps = two corpus scans — at 100 TB that is
  * the entire training cost, and each scan is embarrassingly parallel with
  * no shuffle beyond the final O(d²) partial-aggregate merge.
  *
  * Cross-engine exactness (the repo contract, see SURVEY.md §6):
  *   - step 1 linearizes at w = 0, where p = 1/2 and the IRLS weights are
  *     exactly 1/4 — so its gradient and Hessian are INTEGER statistics
  *     ((X'X + 4λI)·w₁ = 2·X'(2y−1)/… folded as Σ(2y−1)xᵢ), summed
  *     order-independently;
  *   - step 2 needs per-row probabilities. libm `exp` is not bit-portable
  *     across engines (the same reason BM25 here uses a rational idf), so
  *     the link is the ALGEBRAIC sigmoid p(z) = 1/2 + z/(2(1+|z|)) — a
  *     proper sigmoidal CDF (of the heavy-tailed density ½(1+|z|)⁻²) within
  *     0.05 of the logistic everywhere, built from +,−,×,÷,abs only, which
  *     IEEE 754 defines exactly. Its weighted sums are made order-
  *     independent by FIXED-POINT accumulation: each per-row double term is
  *     quantized to an integer ⌊t·2²⁸⌋ (one exact multiply + floor) and
  *     summed as integers — the reproducible-reduction trick of exact-BLAS
  *     literature. (A DECIMAL cast would NOT be portable: Spark casts
  *     double→decimal via Java's shortest string repr while DuckDB rounds
  *     the exact binary value, and the two can disagree in the last ulp.)
  *     Quantization error ≤ 2⁻²⁸ per row only perturbs the second Newton
  *     step's direction — the fit is DEFINED as this fixed-point step;
  *   - every double expression is ONE shared SQL text evaluated by both
  *     engines in the same operation order.
  *
  * Features mirror the ridge quality model: x₁ = token count, x₂ = stopword
  * count; the label is the language gate y = [lang = 'en'] — i.e. the
  * classifier learns the stopword-density language heuristic from data.
  */
object Classify {
  import Tok.{toksDuck, toksExpr}

  private val Lam = 1 // damping on the slope diagonal (not the intercept)

  private val stopPred =
    TextAnalysis.stopwords.map(w => s"'$w'").mkString("t IN (", ",", ")")

  /** Cramer's rule for a symmetric 3×3 system — entries are SQL fragments;
    * the emitted expression structure is identical to [[Selection]]'s ridge
    * solve so both engines evaluate the same IEEE operation tree. */
  private def cramer3(a11: String, a12: String, a13: String, a22: String,
                      a23: String, a33: String, b1: String, b2: String,
                      b3: String): (String, String, String) = {
    val a = Map("a11" -> a11, "a12" -> a12, "a13" -> a13, "a22" -> a22,
      "a23" -> a23, "a33" -> a33, "b1" -> b1, "b2" -> b2, "b3" -> b3)
    def det3(c1: (String, String, String), c2: (String, String, String), c3: (String, String, String)) =
      s"(${a(c1._1)} * (${a(c2._2)} * ${a(c3._3)} - ${a(c2._3)} * ${a(c3._2)}) - ${a(c2._1)} * (${a(c1._2)} * ${a(c3._3)} - ${a(c1._3)} * ${a(c3._2)}) + ${a(c3._1)} * (${a(c1._2)} * ${a(c2._3)} - ${a(c1._3)} * ${a(c2._2)}))"
    val cA1 = ("a11", "a12", "a13"); val cA2 = ("a12", "a22", "a23"); val cA3 = ("a13", "a23", "a33")
    val cB = ("b1", "b2", "b3")
    val det = det3(cA1, cA2, cA3)
    (s"${det3(cB, cA2, cA3)} / $det",
      s"${det3(cA1, cB, cA3)} / $det",
      s"${det3(cA1, cA2, cB)} / $det")
  }

  // ---- step 1: integer sufficient statistics at w = 0 --------------------
  // At w=0: p=1/2, U=I/4, gradient = X'(y−1/2). Scaling by 4:
  //   (X'X + 4λ·diag(0,1,1)) w₁ = 2·X'(2y−1)
  // keeps every matrix/vector entry an exact integer sum.
  private val stat1Aggs = Seq(
    "count(*) AS n",
    "CAST(sum(x1) AS BIGINT) AS s1", "CAST(sum(x2) AS BIGINT) AS s2",
    "CAST(sum(x1*x1) AS BIGINT) AS s11", "CAST(sum(x1*x2) AS BIGINT) AS s12",
    "CAST(sum(x2*x2) AS BIGINT) AS s22",
    "CAST(sum(2*y - 1) AS BIGINT) AS g0",
    "CAST(sum((2*y - 1)*x1) AS BIGINT) AS g1",
    "CAST(sum((2*y - 1)*x2) AS BIGINT) AS g2")

  private val (w10Expr, w11Expr, w12Expr) = cramer3(
    "CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)",
    s"CAST(s11 + ${4 * Lam} AS DOUBLE)", "CAST(s12 AS DOUBLE)",
    s"CAST(s22 + ${4 * Lam} AS DOUBLE)",
    "CAST(2 * g0 AS DOUBLE)", "CAST(2 * g1 AS DOUBLE)", "CAST(2 * g2 AS DOUBLE)")

  // ---- step 2: decimal-exact weighted statistics at w₁ -------------------
  private val zExpr = "w10 + w11 * CAST(x1 AS DOUBLE) + w12 * CAST(x2 AS DOUBLE)"
  private val pExpr = "CAST(0.5 AS DOUBLE) + z / (CAST(2.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE) + abs(z)))"
  private val uExpr = "p * (CAST(1.0 AS DOUBLE) - p)"
  private val rExpr = "CAST(y AS DOUBLE) - p"

  /** 2²⁸ — the fixed-point scale. Headroom: |t| ≤ u·x₁² ≲ 10⁶ for 10⁴-token
    * docs, so a row contributes ≲ 2.7·10¹⁴ and a BIGINT accumulator holds
    * ~3·10⁴ such rows per partial before the final merge would need the
    * 128-bit split-accumulator pattern (see the span-key precedent). */
  private val Q = "268435456.0"
  private def dsum(term: String, as: String) =
    s"CAST(sum(CAST(floor(($term) * CAST($Q AS DOUBLE)) AS BIGINT)) AS DOUBLE) / CAST($Q AS DOUBLE) AS $as"
  private val stat2Aggs = Seq(
    "count(*) AS n_docs",
    "max(w10) AS w10", "max(w11) AS w11", "max(w12) AS w12",
    dsum("u", "du"),
    dsum("u * CAST(x1 AS DOUBLE)", "du1"),
    dsum("u * CAST(x2 AS DOUBLE)", "du2"),
    dsum("u * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)", "du11"),
    dsum("u * CAST(x1 AS DOUBLE) * CAST(x2 AS DOUBLE)", "du12"),
    dsum("u * CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)", "du22"),
    dsum("r", "dr0"),
    dsum("r * CAST(x1 AS DOUBLE)", "dr1"),
    dsum("r * CAST(x2 AS DOUBLE)", "dr2"))

  private val (d0Expr, d1Expr, d2Expr) = cramer3(
    "du", "du1", "du2",
    s"du11 + CAST($Lam AS DOUBLE)", "du12", s"du22 + CAST($Lam AS DOUBLE)",
    "dr0", "dr1", "dr2")

  private val finalCols = Seq(
    "n_docs",
    s"w10 + ($d0Expr) AS beta0",
    s"w11 + ($d1Expr) AS beta1",
    s"w12 + ($d2Expr) AS beta2")

  // ---- Spark side ---------------------------------------------------------
  private[graft] def feats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("source",
        "CAST(size(toks) AS BIGINT) AS x1",
        s"CAST(size(filter(toks, t -> $stopPred)) AS BIGINT) AS x2",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y")

  /** The step-1 weights as a one-row relation — shared by the fit, the
    * eval, and the streaming twin's spec gate. */
  private[graft] def step1(f: DataFrame): DataFrame =
    f.selectExpr(stat1Aggs: _*)
      .selectExpr("n", s"$w10Expr AS w10", s"$w11Expr AS w11", s"$w12Expr AS w12")

  /** Scala mirror of the step-1 solve with the identical operation tree —
    * the streaming twin ([[graft.streaming.ModelFit.fitLogit1]]) finishes
    * its integer state fold with this, so stream output is bit-identical to
    * the batch step-1 weights. */
  def solveLogit1(n: Long, s1: Long, s2: Long, s11: Long, s12: Long,
                  s22: Long, g0: Long, g1: Long, g2: Long): (Double, Double, Double) = {
    val a11 = n.toDouble; val a12 = s1.toDouble; val a13 = s2.toDouble
    val a22 = (s11 + 4 * Lam).toDouble; val a23 = s12.toDouble
    val a33 = (s22 + 4 * Lam).toDouble
    val b1 = (2 * g0).toDouble; val b2 = (2 * g1).toDouble; val b3 = (2 * g2).toDouble
    def det3(r1: (Double, Double, Double), r2: (Double, Double, Double), r3: (Double, Double, Double)): Double =
      r1._1 * (r2._2 * r3._3 - r2._3 * r3._2) -
        r2._1 * (r1._2 * r3._3 - r1._3 * r3._2) +
        r3._1 * (r1._2 * r2._3 - r1._3 * r2._2)
    val cA1 = (a11, a12, a13); val cA2 = (a12, a22, a23); val cA3 = (a13, a23, a33)
    val cB = (b1, b2, b3)
    val det = det3(cA1, cA2, cA3)
    (det3(cB, cA2, cA3) / det, det3(cA1, cB, cA3) / det, det3(cA1, cA2, cB) / det)
  }

  /** Both Newton steps over an arbitrary (x1, x2, y) relation — exposed so
    * the spec can fit a PLANTED separable set (the testdata's lang label is
    * independent of its token stats by construction, so train accuracy
    * there is chance level — correctly). */
  private[graft] def fitFeats(f: DataFrame): DataFrame = {
    val scored = f.crossJoin(broadcast(step1(f)))
      .selectExpr("x1", "x2", "y", "w10", "w11", "w12", s"$zExpr AS z")
      .selectExpr("x1", "x2", "y", "w10", "w11", "w12", s"$pExpr AS p")
      .selectExpr("x1", "x2", "y", "w10", "w11", "w12", s"$uExpr AS u", s"$rExpr AS r")
    scored.agg(expr(stat2Aggs.head), stat2Aggs.tail.map(a => expr(a)): _*)
      .selectExpr(finalCols: _*)
  }

  def logitFit(s: SparkSession, dir: String): DataFrame = fitFeats(feats(s, dir))

  /** Confusion matrix + accuracy per source at the final weights — the
    * third corpus pass (score + integer counts, exact). The decision rule
    * p ≥ 1/2 is evaluated as z ≥ 0 (the link is monotone), so the eval pass
    * never needs the sigmoid at all. */
  def logitEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = feats(s, dir)
    f.crossJoin(broadcast(fitFeats(f).selectExpr("beta0", "beta1", "beta2")))
      .selectExpr("source", "y",
        "beta0 + beta1 * CAST(x1 AS DOUBLE) + beta2 * CAST(x2 AS DOUBLE) >= CAST(0.0 AS DOUBLE) AS pred")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END")).cast("long").as("tp"),
        sum(expr("CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END")).cast("long").as("fp"),
        sum(expr("CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END")).cast("long").as("fn"),
        sum(expr("CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END")).cast("long").as("tn"))
      .selectExpr("source", "n_docs", "tp", "fp", "fn", "tn",
        "CAST(tp + tn AS DOUBLE) / CAST(n_docs AS DOUBLE) AS accuracy")
  }

  // ---- DuckDB oracles ------------------------------------------------------
  private val featsCte =
    s"""f AS (SELECT source,
       |             CAST(len(toks) AS BIGINT) AS x1,
       |             CAST(len(list_filter(toks, t -> $stopPred)) AS BIGINT) AS x2,
       |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |      FROM (SELECT source, lang, $toksDuck AS toks FROM documents))""".stripMargin

  private val fitCtes =
    s"""WITH $featsCte,
       |st1 AS (SELECT ${stat1Aggs.mkString(",\n               ")} FROM f),
       |w1 AS (SELECT n, $w10Expr AS w10, $w11Expr AS w11, $w12Expr AS w12 FROM st1),
       |sz AS (SELECT x1, x2, y, w10, w11, w12, $zExpr AS z FROM f, w1),
       |sp AS (SELECT x1, x2, y, w10, w11, w12, $pExpr AS p FROM sz),
       |su AS (SELECT x1, x2, y, w10, w11, w12, $uExpr AS u, $rExpr AS r FROM sp),
       |st2 AS (SELECT ${stat2Aggs.mkString(",\n               ")} FROM su),
       |fit AS (SELECT ${finalCols.mkString(",\n               ")} FROM st2)""".stripMargin

  val logitFitSql: String =
    s"""$fitCtes
       |SELECT n_docs, beta0, beta1, beta2 FROM fit
       |""".stripMargin

  val logitEvalSql: String =
    s"""$fitCtes,
       |scored AS (
       |  SELECT source, y,
       |         beta0 + beta1 * CAST(x1 AS DOUBLE) + beta2 * CAST(x2 AS DOUBLE) >= CAST(0.0 AS DOUBLE) AS pred
       |  FROM f, fit)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |       CAST(sum(CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |       CAST(sum(CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |       CAST(sum(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |       CAST(CAST(sum(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END) AS BIGINT)
       |            + CAST(sum(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS accuracy
       |FROM scored GROUP BY source
       |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_logit_fit"  -> logitFit _,
    "q_logit_eval" -> logitEval _)

  def oracleSql: Map[String, String] = Map(
    "q_logit_fit"  -> logitFitSql,
    "q_logit_eval" -> logitEvalSql)
}
