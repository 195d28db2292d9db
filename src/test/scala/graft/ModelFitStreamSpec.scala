package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ModelFit
import graft.streaming.ModelFit.{DocFeat, ModelOut}

/** The streaming per-source ridge fit equals the batch `q_ridge_by_source`
  * coefficients BIT-EXACTLY over everything fed — sufficient statistics
  * are exact integer folds (order-free), and the finishing Cramer solve
  * mirrors the batch SQL operation-for-operation — including across a
  * checkpoint restart. */
class ModelFitStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def featRows() = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS x1",
        "cast(size(filter(split(trim(text), '\\\\s+'), t -> t in ('the','a','of','and','to','in','is'))) as bigint) AS x2",
        "cast(length(text) as bigint) AS y")
      .as[DocFeat].collect().sortBy(_.doc_id)
  }

  test("streamed coefficients equal the batch grouped fit after a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = featRows()
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("mf_cp").toString
    val out = java.nio.file.Files.createTempDirectory("mf_out").toString
    val mem = MemoryStream[DocFeat]

    def start() = ModelFit.fit(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    // latest emitted model per source (highest n_docs wins)
    val last = spark.read.parquet(out).as[ModelOut].collect()
      .groupBy(_.source).map { case (s, rs) => s -> rs.maxBy(_.n_docs) }
    val batch = graft.operators.Selection.ridgeBySource(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (s, m) =>
      val (n, b0, b1, b2) = batch(s)
      assert(m.n_docs == n, s"source $s doc count")
      // bit-exact: same integer stats, same IEEE operation order
      assert(m.beta0 == b0 && m.beta1 == b1 && m.beta2 == b2,
        s"source $s: streamed (${m.beta0},${m.beta1},${m.beta2}) != batch ($b0,$b1,$b2)")
    }
    // mid-stream models existed for every source fed in batch 1 (h1 spans
    // multiple sources) — the monitor emits per batch, not only at the end
    val emitted = spark.read.parquet(out).as[ModelOut].collect()
    assert(emitted.length > last.size, "expected per-batch emissions")
  }

  test("streamed logit step-1 weights equal the batch SQL solve bit-exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ModelFit.{LogitDoc, LogitOut}
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS x1",
        "cast(size(filter(split(trim(text), '\\\\s+'), t -> t in ('the','a','of','and','to','in','is'))) as bigint) AS x2",
        "CASE WHEN lang = 'en' THEN 1L ELSE 0L END AS y")
      .as[LogitDoc].collect().sortBy(_.doc_id)
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("lf_cp").toString
    val out = java.nio.file.Files.createTempDirectory("lf_out").toString
    val mem = MemoryStream[LogitDoc]
    def start() = ModelFit.fitLogit1(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()
    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()
    val last = spark.read.parquet(out).as[LogitOut].collect()
      .groupBy(_.source).map { case (s, rs) => s -> rs.maxBy(_.n_docs) }
    // batch side: the step-1 SQL expression text over each source's slice —
    // proves the Scala mirror (stream finisher) IS the SQL solve
    last.foreach { case (src, m) =>
      val f = graft.operators.Classify.feats(spark, sf)
        .filter($"source" === src)
      val b = graft.operators.Classify.step1(f).collect()(0)
      assert(m.n_docs == b.getLong(0), s"source $src doc count")
      assert(m.w0 == b.getDouble(1) && m.w1 == b.getDouble(2) && m.w2 == b.getDouble(3),
        s"source $src: streamed (${m.w0},${m.w1},${m.w2}) != batch SQL (${b.getDouble(1)},${b.getDouble(2)},${b.getDouble(3)})")
    }
  }
}
