package graft
import org.apache.spark.sql.SparkSession
object DbgPlan {
  val jobLog = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
  class JL extends org.apache.spark.scheduler.SparkListener {
    val starts = scala.collection.mutable.Map[Int, Long]()
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      starts(js.jobId) = js.time
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobLog += ((je.jobId, je.time - starts.getOrElse(je.jobId, je.time)))
  }
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new JL)
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables.load(spark, dir, t).limit(1).count()
    }
    names.foreach { n =>
      for (i <- 1 to 2) {
        jobLog.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Materialize.releaseTransient(spark)
        Thread.sleep(150)
        val js = jobLog.map(_._2)
        println(f"PROF $n run$i: $t%6.2f s  jobs=${js.size}  jobms=${js.sum}  [${js.mkString(",")}]")
      }
    }
    spark.stop()
  }
}
