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
    // isolation matches Bench: SQL cache + checkpointed RDD blocks
    // (localCheckpoint lives outside the CacheManager)
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    Bench.force(fn(spark, sfDir)) // warm: codegen + JIT + file listing
    clear()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = Bench.force(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time-one] $name rep$i: $sec%.3f s ($n rows)")
      clear()
    }
  }
}
