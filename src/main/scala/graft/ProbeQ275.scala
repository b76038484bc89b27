package graft

object ProbeQ275 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe-q275")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q275_text_late_interaction")(spark, args(0))
    println(df.queryExecution.executedPlan.toString.take(8000))
  }
}
