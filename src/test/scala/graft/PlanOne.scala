package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Ad-hoc plan + job-shape capture (test scope, not shipped).
  * `Test/runMain graft.PlanOne q_name [sfDir] [outFile]` — runs the query
  * through the noop sink once (so AQE finalizes), then prints/writes the
  * FORMATTED plan of the executed query plus job/stage/shuffle counters.
  * The second run's timing is printed for a steady-state number.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val shuffleRead = new AtomicLong(0)
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStartNs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStartNs.get(je.jobId)).foreach { case (t0, site) =>
          jobLog.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.addAndGet(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead)
        }
      }
    })

    // args(0): comma-separated query names; args(2) (optional): output
    // PATH for a single query, or output DIRECTORY (suffix appended) for
    // several; args(3) (optional): the suffix, default "before".
    val suffix = if (args.length > 3) args(3) else "before"
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

      // run 1: warm (codegen/JIT); reset counters; run 2: measured
      df.write.format("noop").mode("overwrite").save()
      Materialize.releaseTransient(spark)
      System.gc()
      jobs.set(0); stages.set(0); shuffleWrite.set(0); shuffleRead.set(0); jobLog.clear()
      val t0 = System.nanoTime()
      val df2 = SparkEntry.queries(name)(spark, dir)
      df2.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val executed = df2.queryExecution.executedPlan.toString()

      val header =
        f"""== $name @ $dir ==
           |steady_run_s: $secs%.3f
           |jobs: ${jobs.get()}  stages: ${stages.get()}
           |shuffle_write_mb: ${shuffleWrite.get() / 1e6}%.1f  shuffle_read_mb: ${shuffleRead.get() / 1e6}%.1f
           |""".stripMargin
      val jobTable = jobLog.toArray.map(_.toString).mkString("\n")
      val body = header + "\n== jobs ==\n" + jobTable +
        "\n\n== logical->formatted ==\n" + plan +
        "\n== executed (AQE final) ==\n" + executed
      println(header)
      if (args.length > 2) {
        val base = java.nio.file.Paths.get(args(2)).toAbsolutePath
        val out =
          if (names.length == 1 && args(2).endsWith(".txt")) base
          else base.resolve(s"${name}_$suffix.txt")
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.writeString(out, body)
        println(s"written: $out")
      } else println(body)
      Materialize.releaseTransient(spark)
      System.gc()
    }
    spark.stop()
  }
}
