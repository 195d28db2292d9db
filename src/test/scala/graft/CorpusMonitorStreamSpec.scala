package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusMonitor
import graft.streaming.CorpusMonitor.{DocIngest, TotalsOut}

/** The streaming corpus monitor's recovered state matches a batch
  * groupBy(source) over everything fed — the same twin proof as the other
  * stateful operators, here against the REAL documents table tokenized
  * with the library's own token expression. */
class CorpusMonitorStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def ingestRows() = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS n_tok")
      .as[DocIngest].collect().sortBy(_.doc_id)
  }

  test("running totals equal the batch rollup after batches and a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = ingestRows()
    val (h1, h2) = all.splitAt(all.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("cm_cp").toString
    val out = java.nio.file.Files.createTempDirectory("cm_out").toString
    val mem = MemoryStream[DocIngest]

    def start() = CorpusMonitor.monitor(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .option("path", out)
      .format("parquet").start()

    val q1 = start()
    try { mem.addData(h1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: recovered state must keep accumulating
    val q2 = start()
    try { mem.addData(h2.toIndexedSeq); q2.processAllAvailable() } finally q2.stop()

    // latest emitted snapshot per source (the last batch's rows win)
    val outs = spark.read.parquet(out).as[TotalsOut].collect()
    val last = outs.groupBy(_.source).map { case (s, rs) =>
      s -> rs.maxBy(_.n_docs) }
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) AS n_tok")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (s, t) =>
      assert((t.n_docs, t.n_tokens, t.min_tok, t.max_tok) == batch(s),
        s"source $s: streaming $t != batch ${batch(s)}")
    }
  }
}
