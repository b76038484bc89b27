package graft

/** Time a single [[SparkEntry.queries]] entry: `TimeOne <sfDir> <name>
  * [reps]` — warms once, then prints per-rep wall seconds (count() as the
  * action, matching Bench). For isolating one query's cost without the
  * full bench sweep. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.getOrCreate("graft-time-one")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm: codegen + JIT + file listing
    spark.sharedState.cacheManager.clearCache()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time-one] $name rep$i: $sec%.3f s ($n rows)")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
