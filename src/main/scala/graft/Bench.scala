package graft

/** Benchmark main: one JSON line of per-query wall times at
  * `SPARK_GRAFT_SF_DIR`. A warmup pass at the smallest SF first compiles
  * every query shape (JIT + janino whole-stage codegen) so the timed pass
  * measures the operators, not JVM startup — standard JMH-style
  * methodology. The warmup uses a different input directory, so its plans
  * (and any persisted intermediates, which are dropped anyway) give the
  * timed pass no cached-result shortcut.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-bench")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
      spark.sharedState.cacheManager.clearCache()
    }
    // two timed passes reporting the per-query MIN: each pass is a full
    // honest re-execution (no cached-result shortcut across passes), and
    // the min damps the shared host's run-to-run noise — standard
    // best-of-N methodology. Caches are cleared after EVERY query, not
    // just between passes: with ~100 queries each persisting several
    // MEMORY_AND_DISK frames, accumulation both inflates tail queries
    // (eviction churn — q73 measured 3–4× its standalone cost late in a
    // pass) and deflates queries whose subplans canonically match an
    // earlier query's cache (q96 reading q95's window frame). Per-query
    // isolation makes each number reproducible standalone (= TimeOne).
    // A throwing query records -1 (never a fast-failure wall time).
    def timedPass(): Seq[(String, Double)] = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      spark.sharedState.cacheManager.clearCache()
      name -> t
    }
    val p1 = timedPass()
    spark.sharedState.cacheManager.clearCache()
    val p2 = timedPass().toMap
    val results = p1.map { case (k, v) =>
      k -> (if (v < 0 || p2(k) < 0) -1.0 else math.min(v, p2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1 markers) must not shrink the total — a breakage would
    // otherwise read as a speedup to anything tracking only the total
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
