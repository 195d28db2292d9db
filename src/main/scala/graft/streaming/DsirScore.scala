package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Selection

/** Streaming DSIR scoring — the deployment half of `q_dsir_weights`: the
  * target/raw bucket statistics are computed ONCE and persisted (the
  * published DSIR workflow stores exactly these hashed n-gram statistics),
  * then any stream of raw documents is scored STATELESSLY against the
  * stored artifact: per micro-batch, each doc's token array folds to three
  * integer sufficient statistics via lookups into the broadcast count
  * arrays (~2·B longs), and the finishing expression is the same shared
  * text as the batch query — so streamed scores are bit-identical to
  * batch scores for the same documents (spec-gated).
  *
  * Scale: zero streaming state (no aggregation, no watermark — a pure
  * per-row map), one broadcast of the one-row artifact; ingest throughput
  * is scan-bound. Re-scoring after an artifact refresh is a restart with a
  * new path — scores are versioned by the artifact, not by stream history.
  */
object DsirScore {

  /** Persist the bucket-count artifact for `dir`'s corpus at `path`. */
  def writeArtifact(s: SparkSession, dir: String, path: String): Unit =
    Selection.dsirArtifact(s, dir).write.mode("overwrite").parquet(path)

  /** Score a (doc_id, text) stream against the stored artifact. */
  def score(s: SparkSession, docs: DataFrame, artifactPath: String): DataFrame = {
    val art = broadcast(s.read.parquet(artifactPath)).withColumn("k", lit(1))
    docs
      .withColumn("k", lit(1))
      .join(art, "k") // stream-static broadcast equi-join (1 artifact row)
      .withColumn("toks", expr(graft.operators.Tok.toksExpr))
      .selectExpr(Seq("doc_id", "nraw", "ntgt") ++ Selection.dsirRowStats: _*)
      .selectExpr("doc_id", "n_tokens",
        s"${Selection.dsirScoreExpr} AS dsir_score",
        s"${Selection.dsirScoreExpr} >= CAST(1.0 AS DOUBLE) AS selected")
  }
}
