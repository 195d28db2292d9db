package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Iterative BPE training on the classic Sennrich et al. (2016) corpus
  * {low×5, lower×2, newest×6, widest×3} (no end-of-word marker): the merge
  * sequence is worked out by hand below, including two tie-breaks on the
  * raw pair string and one merge whose pair contains a previous merge
  * character — the cases that distinguish a real recounting loop from a
  * one-shot pair ranking. */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("learns the hand-computed merge sequence with recounts and tie-breaks") {
    import spark.implicits._
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("rep", "cnt")
    val got = graft.operators.TextAnalysis.bpeMerges(vocab, 6)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val want = Seq(
      (1, "es", 9L),   // es=st=9 tie → 'es' wins on pair asc
      (2, "est", 9L),  // pair (Ā='es', t) — recount sees the new symbol
      (3, "lo", 7L),   // lo=ow=7 tie → 'lo'
      (4, "low", 7L),  // (Ă='lo', w)
      (5, "ew", 6L),   // ne=ew=wā=6 tie → 'ew' smallest
      (6, "new", 6L))  // (n, Ą='ew') beats (Ą, ā) byte-wise
    assert(got.toSeq == want)
  }

  test("apply reads the stored merge artifact: one corpus scan, zero pair aggregations") {
    val sf = "/root/testdata/sf0.001"
    // build (or reuse) the artifact, then plan the apply query
    graft.operators.TextAnalysis.bpeTrain(spark, sf).collect()
    val applied = graft.operators.TextAnalysis.bpeApply(spark, sf)
    val plan = applied.queryExecution.executedPlan.toString
    // the training loop's signature is the 2-char pair explosion over the
    // vocabulary — none of it may appear in apply's executed plan
    assert(!plan.contains("substring(rep"),
      "apply re-runs the pair-count training loop:\n" + plan)
    // exactly ONE parquet scan: the corpus token pass; the merge env comes
    // off the pinned artifact (an in-memory leaf), not a re-train
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n" + plan)
    assert(applied.collect().nonEmpty)
  }

  test("merge application is greedy left-to-right: 'aaaa' under (a,a) → two symbols") {
    import spark.implicits._
    val vocab = Seq(("aaaa", 1L)).toDF("rep", "cnt")
    // round 1 merges (a,a) n=3 (overlapping adjacent pairs all count);
    // applying it to 'aaaa' must yield [aa][aa], so round 2's top pair is
    // (Ā,Ā) with n=1 and expands to 'aaaa'
    val got = graft.operators.TextAnalysis.bpeMerges(vocab, 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }
}
