package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing (test scope, not shipped).
  * `Test/runMain graft.BenchOne q_name [sfDir]`; cores via SPARK_GRAFT_CPUS. */
object BenchOne {
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
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"${args(0)}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Materialize.releaseTransient(spark)
      System.gc()
    }
    spark.stop()
  }
}
