package graft

import org.apache.spark.sql.SparkSession

/** Scale-sanity harness (SURVEY §7.5): times the named queries at two data
  * dirs (sf0.1 and the ScaleGen ~sf1) in ONE session each, prints the
  * per-query ratio against the 10× data growth. A ratio well above ~10
  * flags hidden superlinearity; well below flags job-floor-bound timings
  * that will keep inverting in the engine's favor at real scale. Run:
  *   sbt "Test/runMain graft.ScaleSanity q_a,q_b [dirA dirB]"
  */
object ScaleSanity {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dirA = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 2) args(2) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Double = {
      // 2 runs, report the second (steady state), transients released like
      // Bench so per-run accounting matches the driver's
      var last = -1.0
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        last = (System.nanoTime() - t0) / 1e9
        Materialize.releaseTransient(spark)
      }
      last
    }

    // warmup both dirs' footers
    Seq(dirA, dirB).foreach { d =>
      graft.sources.Tables.names.foreach { t =>
        graft.sources.Tables.load(spark, d, t).limit(1).count()
      }
    }
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s ${"ratio"}%7s")
    names.foreach { n =>
      // a failure at either SF is itself the finding (sf1 overflow, OOM…);
      // report it and keep sweeping — one bad query must not kill the run
      try {
        val a = run(n, dirA)
        val b = run(n, dirB)
        println(f"$n%-24s $a%8.2f $b%8.2f ${b / a}%7.2f")
      } catch {
        case e: Throwable =>
          println(s"$n ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
      }
    }
    spark.stop()
  }
}
