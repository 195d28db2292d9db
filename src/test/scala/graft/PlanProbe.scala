package graft

/** Ad-hoc plan inspection main (test scope, not shipped):
  * `Test/runMain graft.PlanProbe q_name` prints the executed plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString)
  }
}
