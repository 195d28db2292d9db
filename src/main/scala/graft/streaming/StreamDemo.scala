package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end streaming ingest demo: writes a batch of Debezium
  * envelope JSON files (inserts + non-insert garbage), streams them through
  * [[CdcIngest]] with a file source and checkpointed parquet sink, then
  * prints the reconciliation the reference's monitor loop prints
  * (ref: SaveDelta.scala:176-228).
  *
  * Usage: runMain graft.streaming.StreamDemo [workDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
               else Files.createTempDirectory("stream_demo").toString
    val srcDir = s"$work/source"; val outDir = s"$work/out"; val cpDir = s"$work/cp"
    Files.createDirectories(Paths.get(srcDir))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Source batch: 50 inserts + update/delete-style envelopes + garbage.
    val lines = (1 to 50).map { i =>
      s"""{"payload": {"after": {"id": $i, "id_employee": ${i % 7 + 1}, "start_datetime": ${1718000000000000L + i * 60000000L}, "sport_type": "Vélo", "distance": ${10000 + i}, "activity_duration": 3600, "comment": ${if (i % 3 == 0) "\"Super séance !\"" else "null"}}}}"""
    } ++ Seq("""{"payload": {"before": {"id": 99}}}""", "not json")
    Files.write(Paths.get(s"$srcDir/batch0.json"),
      lines.mkString("\n").getBytes("UTF-8"))

    // the text source already names its column `value`
    val raw = spark.readStream.format("text").load(srcDir)
    val parsed = CdcIngest.parseEnvelope(raw)
    val query = CdcIngest.ingest(parsed, outDir, cpDir, Trigger.AvailableNow())
    query.awaitTermination()

    val (sinkCount, processed) = CdcIngest.reconcile(spark, outDir, query)
    val sunk = spark.read.parquet(outDir)
    println(s"[demo] envelopes processed: $processed  rows sunk (inserts only): $sinkCount")
    sunk.orderBy("id").show(5, truncate = false)
    require(sinkCount == 50, s"expected 50 inserts, got $sinkCount")
    spark.stop()
  }
}
