package graft

/** Ad-hoc single-query timing (test scope, not shipped). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.1"
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"${args(0)}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Materialize.releaseTransient(spark)
      System.gc()
    }
  }
}
