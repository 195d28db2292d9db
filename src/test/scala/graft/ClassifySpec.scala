package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Classify, Lakehouse, Selection, Similarity}

/** Round-10 additions: the damped-Newton logistic fit, priority sampling,
  * SQ8 quantization recall, and the compaction planner. Semantics checked
  * against driver-side reference computations and planted fixtures; the
  * oracle gate separately hash-checks every query's exact values. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("logit: separable planted data is classified correctly after two Newton steps") {
    import spark.implicits._
    // y=1 rows carry high stopword density (x2), y=0 low — linearly
    // separable on x2 with overlapping x1, like a real language gate.
    val rows = (0 until 200).map { i =>
      val y = i % 2
      val x1 = 40L + (i % 7) * 5       // token count: same range for both
      val x2 = if (y == 1) 12L + (i % 5) else 1L + (i % 3)
      ("s" + (i % 4), x1, x2, y.toLong)
    }
    val f = rows.toDF("source", "x1", "x2", "y")
    val beta = Classify.fitFeats(f).collect()(0)
    val (b0, b1, b2) = (beta.getDouble(1), beta.getDouble(2), beta.getDouble(3))
    assert(b2 > 0.0, s"stopword weight must be positive, got $b2")
    val preds = f.selectExpr("y",
      s"CASE WHEN $b0 + $b1 * CAST(x1 AS DOUBLE) + $b2 * CAST(x2 AS DOUBLE) >= 0.0 THEN 1L ELSE 0L END AS pred")
      .collect()
    val acc = preds.count(r => r.getLong(0) == r.getLong(1)).toDouble / preds.length
    assert(acc >= 0.95, s"separable data must be learned, accuracy $acc")
  }

  test("logit: eval confusion counts reconcile and betas are finite on the corpus") {
    val fit = Classify.logitFit(spark, sf).collect()(0)
    (1 to 3).foreach(i => assert(!fit.getDouble(i).isNaN && !fit.getDouble(i).isInfinite))
    val ev = Classify.logitEval(spark, sf).collect()
    assert(ev.nonEmpty)
    ev.foreach { r =>
      val (n, tp, fp, fn, tn) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(tp + fp + fn + tn == n, s"confusion cells must partition ${r.getString(0)}")
      assert(r.getDouble(6) == (tp + tn).toDouble / n)
    }
  }

  test("priority sample: structure, whole-stratum exactness, and cross-strata unbiasedness") {
    val rs = Selection.prioritySample(spark, sf).collect()
    assert(rs.nonEmpty)
    var ratios = List.empty[Double]
    rs.foreach { r =>
      val (nRows, nSampled, tau) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val (est, truth) = (r.getDouble(4), r.getLong(5))
      assert(nSampled == math.min(nRows, 10L), "sample size is min(n, k)")
      if (nRows <= 10) {
        assert(tau == 0.0, "whole stratum taken => no threshold")
        assert(est == truth.toDouble, "whole stratum => exact estimate")
      } else assert(tau > 0.0)
      assert(est > 0.0)
      ratios ::= est / truth
    }
    // single-draw strata vary (Var ~ W²/(k-1)) but the cross-strata mean
    // must sit near 1 — the unbiasedness signature visible in one draw
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.5, s"estimator mean ratio $mean off unbiased")
  }

  test("sq8: recall@k stays high and hits are bounded by k") {
    val rs = Similarity.sq8Recall(spark, sf).collect()
    assert(rs.length == 10, "one row per query")
    rs.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
    val avg = rs.map(_.getDouble(3)).sum / rs.length
    assert(avg >= 0.6, s"8-bit quantization should retain most neighbors, avg recall $avg")
  }

  test("compaction plan: bins are contiguous per source and reconcile with the listing") {
    import spark.implicits._
    val plan = Lakehouse.compactionPlan(spark, sf).collect()
    assert(plan.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totBytes = docs.selectExpr("CAST(sum(n_chars) AS BIGINT)").collect()(0).getLong(0)
    val totDocs = docs.count()
    assert(plan.map(_.getLong(3)).sum == totDocs, "every doc lands in exactly one bin")
    assert(plan.map(_.getLong(4)).sum == totBytes, "every byte lands in exactly one bin")
    plan.groupBy(_.getString(0)).foreach { case (src, bins) =>
      val ordered = bins.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(6) < b.getLong(5),
            s"$src: bins must cover disjoint increasing file ranges")
        case _ =>
      }
    }
  }

  test("dense ids: contiguous 0..n-1 in (source, doc_id) order with no global-sort window") {
    val ids = Lakehouse.denseIds(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(ids.length == n)
    assert(ids.map(_.getLong(2)).sorted.sameElements(0L until n),
      "row ids must be exactly 0..n-1")
    val inOrder = ids.sortBy(r => (r.getString(0), r.getLong(1)))
    inOrder.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) == i.toLong, s"rank mismatch at ${r.getString(0)}/${r.getLong(1)}")
    }
    val plan = Lakehouse.denseIds(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "two-phase assignment must not use a window")
  }

  test("vacuum plan: reclaim + live bytes reconcile with the corpus and the dedup pass") {
    val plan = Lakehouse.vacuumPlan(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totBytes = docs.selectExpr("CAST(sum(n_chars) AS BIGINT)").collect()(0).getLong(0)
    assert(plan.map(r => r.getLong(3) + r.getLong(4)).sum == totBytes,
      "every byte is either reclaimed or live")
    val dropped = plan.map(_.getLong(2)).sum
    val nDups = graft.operators.Dedup.dedupExact(spark, sf)
      .selectExpr("CAST(sum(n_dups - 1) AS BIGINT)").collect()(0).getLong(0)
    assert(dropped == nDups, "dropped docs must equal the dedup pass's duplicate count")
  }

  test("sq8 drift: clip counts are bounded by dim and the split covers the delta") {
    val rs = Similarity.sq8Drift(spark, sf).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rs.length == nVec - ((nVec * 9) / 10), "one row per delta vector")
  }

  test("attribution: purchase counts reconcile and revenue is credited once") {
    import spark.implicits._
    val at = graft.operators.Temporal.firstTouch(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val purchases = ev.filter($"event_type" === "purchase")
    assert(at.map(_.getLong(1)).sum == purchases.count(),
      "every purchase is attributed exactly once")
    val totalCents = purchases
      .selectExpr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
      .collect()(0).getLong(0)
    assert(at.map(_.getLong(2)).sum == totalCents, "revenue is conserved")
  }
}
