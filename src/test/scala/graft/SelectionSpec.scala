package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Selection, Similarity}

/** Data-selection layer: DSIR importance weights, closed-form ridge fit,
  * Pareto-front curation, and the PCA covariance path. Semantics are
  * checked against independent driver-side reference computations at
  * sf0.001 (the oracle gate separately hash-checks the exact values). */
class SelectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("dsir: target-language docs outscore the rest on average, selected = score >= 1") {
    import spark.implicits._
    val w = Selection.dsirWeights(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"dsir_score", $"selected", ($"lang" === "en").as("is_en"))
      .collect()
    assert(w.nonEmpty)
    w.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      assert(r.getBoolean(2) == (r.getDouble(1) >= 1.0))
    }
    val (en, rest) = w.partition(_.getBoolean(3))
    val avg = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getDouble(1)).sum / rs.length
    // the estimator must separate the distributions it was built from
    assert(avg(en) > avg(rest),
      s"en avg ${avg(en)} should exceed non-en avg ${avg(rest)}")
  }

  test("ridge fit: one-pass closed form beats the mean-only model on its own corpus") {
    val b = Selection.ridgeFit(spark, sf).collect().head
    val (n, b0, b1, b2) =
      (b.getLong(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    import spark.implicits._
    val feats = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("size(split(trim(text), '\\\\s+')) AS x1",
        "size(filter(split(trim(text), '\\\\s+'), t -> t in ('the','a','of','and','to','in','is'))) AS x2",
        "length(text) AS y")
      .as[(Int, Int, Int)].collect()
    assert(n == feats.length)
    assert(b1 > 0.0, s"chars must grow with tokens, beta1=$b1")
    val ybar = feats.map(_._3.toDouble).sum / n
    val ssTot = feats.map(f => math.pow(f._3 - ybar, 2)).sum
    val ssRes = feats.map(f => math.pow(f._3 - (b0 + b1 * f._1 + b2 * f._2), 2)).sum
    assert(ssRes < 0.2 * ssTot, s"R2 too low: ssRes=$ssRes ssTot=$ssTot")
  }

  test("ridge eval: closed-form per-source R2/RMSE match explicit residuals") {
    import spark.implicits._
    val feats = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) AS x1",
        "size(filter(split(trim(text), '\\\\s+'), t -> t in ('the','a','of','and','to','in','is'))) AS x2",
        "length(text) AS y")
      .as[(String, Int, Int, Int)].collect().groupBy(_._1)
    val eval = Selection.ridgeEval(spark, sf).collect()
    assert(eval.map(_.getString(0)).toSet == feats.keySet)
    eval.foreach { r =>
      val (src, n, b0, b1, b2, r2, rmse) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val fs = feats(src)
      assert(n == fs.length)
      val ssRes = fs.map(f => math.pow(f._4 - (b0 + b1 * f._2 + b2 * f._3), 2)).sum
      val ybar = fs.map(_._4.toDouble).sum / n
      val ssTot = fs.map(f => math.pow(f._4 - ybar, 2)).sum
      val refR2 = if (ssTot > 0) 1.0 - ssRes / ssTot else 0.0
      // the algebraic expansion cancels catastrophically only in theory;
      // on integer-exact stats it agrees with the explicit residual sum
      assert(math.abs(r2 - refR2) < 1e-6, s"$src r2 $r2 vs ref $refR2")
      assert(math.abs(rmse - math.sqrt(ssRes / n)) < 1e-6, s"$src rmse")
      assert(rmse >= 0.0)
    }
  }

  test("pareto front equals the naive quadratic skyline") {
    import spark.implicits._
    val feats = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "size(split(trim(text), '\\\\s+')) AS t",
        "size(array_distinct(split(trim(text), '\\\\s+'))) AS d")
      .as[(Long, Int, Int)].collect()
    val naive = feats.filter { case (_, t, d) =>
      !feats.exists { case (_, t2, d2) =>
        t2 >= t && d2 >= d && (t2 > t || d2 > d)
      }
    }.map(_._1).toSet
    val got = Selection.paretoDocs(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive, s"got ${got.size} vs naive ${naive.size}")
    // the front is never empty and never the whole corpus on real data
    assert(got.nonEmpty && got.size < feats.length)
  }

  test("embedding covariance matches a driver-side reference; PCA top component is valid") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1).map(_._2.map(_.toDouble))
    val n = vecs.length
    val cov = Similarity.embedCov(spark, sf).collect()
    assert(cov.length == 8 * 9 / 2)
    cov.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      val exy = vecs.map(v => v(i) * v(j)).sum / n
      val ex = vecs.map(_(i)).sum / n
      val ey = vecs.map(_(j)).sum / n
      val ref = exy - ex * ey
      assert(math.abs(r.getAs[Double]("cov") - ref) < 1e-9,
        s"cov($i,$j)=${r.getAs[Double]("cov")} ref=$ref")
      if (i == j) assert(r.getAs[Double]("cov") >= 0.0)
    }
    val (lambda, v) = Similarity.pcaTop(spark, sf)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    // eigen residual ||Av - lambda v|| must vanish after power iteration
    val a = Array.ofDim[Double](8, 8)
    cov.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1, r.getAs[Double]("cov"))
      a(i)(j) = c; a(j)(i) = c
    }
    val av = Array.tabulate(8)(i => (0 until 8).map(j => a(i)(j) * v(j)).sum)
    // convergence is geometric in the eigengap ratio — with a narrow gap
    // 300 iterations land well under 1e-7 relative, not machine epsilon
    val resid = math.sqrt((0 until 8).map(i => math.pow(av(i) - lambda * v(i), 2)).sum)
    assert(resid < 1e-7 * math.max(1.0, math.abs(lambda)), s"residual $resid")
    // top eigenvalue dominates every single-dimension variance
    (0 until 8).foreach(i => assert(lambda >= a(i)(i) - 1e-12))
  }
}
