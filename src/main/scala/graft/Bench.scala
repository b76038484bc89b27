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
  /** The timed action: force FULL materialization of every output row
    * (count over the executed plan's InternalRows — whole-stage codegen
    * must produce each UnsafeRow with all columns, and the final sort
    * runs). A bare `df.count()` lets Catalyst prune the final projection
    * and eliminate the output sort, so map-only queries (q16/q17/q103…)
    * previously benched as scan+count only — q102's regex cost was
    * invisible under count() yet dominant under Verify's parquet write.
    * Recorded as a methodology change in BASELINE.md (round 9); numbers
    * are comparable to Verify's write-side cost, not to pre-r9 bench
    * rows for projection-heavy queries. */
  def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // optional comma-separated query subset (scale-decade runs measure
    // only the certified-configuration shapes); default = every query,
    // which is what the driver's per-round bench uses
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(set) => SparkEntry.queries.filter { case (k, _) => set(k) }
      case None      => SparkEntry.queries
    }
    val spark = GraftSession.getOrCreate("graft-bench")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      queries.foreach { case (_, fn) =>
        try force(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
      spark.sharedState.cacheManager.clearCache()
    }
    // N timed passes (default 2, SPARK_GRAFT_BENCH_REPS to raise)
    // reporting the per-query MIN: each pass is a full honest
    // re-execution (no cached-result shortcut across passes), and the
    // min damps the shared host's run-to-run noise — standard best-of-N
    // methodology. Caches are cleared after EVERY query, not just
    // between passes: with ~100 queries each persisting several
    // MEMORY_AND_DISK frames, accumulation both inflates tail queries
    // (eviction churn — q73 measured 3–4× its standalone cost late in a
    // pass) and deflates queries whose subplans canonically match an
    // earlier query's cache (q96 reading q95's window frame). Per-query
    // isolation makes each number reproducible standalone (= TimeOne).
    // localCheckpoint() blocks (q98's stage boundaries) live OUTSIDE the
    // SQL CacheManager, so they are released explicitly via
    // getPersistentRDDs — otherwise checkpointed frames linger on
    // executors until ContextCleaner GC across passes. A throwing query
    // records -1 (never a fast-failure wall time). Every per-rep value
    // is emitted in the artifact ("reps") so a single noisy rep is
    // visible instead of silently becoming — or hiding behind — the
    // number of record.
    def timedPass(): Seq[(String, Double)] = queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val t = try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> t
    }
    val nReps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val basePasses = (1 to nReps).map(_ => timedPass().toMap)
    val names = queries.keys.toSeq
    // CONTENTION GUARD (round-14 verdict): on a shared host a single rep
    // can land inside another tenant's burst — q67 once measured
    // [190 s, 17 s] and the min was still 3× its standalone cost. When
    // the reps disagree by >3×, the number is noise, not signal: re-run
    // just those queries once more (isolated, same per-query cache
    // discipline) so the recorded min is corroborated by at least one
    // quiet rep instead of being adjudicated away every round.
    val noisy = names.filter { k =>
      val vs = basePasses.map(_(k)).filter(_ >= 0)
      vs.nonEmpty && vs.max > 3.0 * vs.min && vs.min > 0.05
    }
    val passes: Seq[Map[String, Double]] =
      if (noisy.isEmpty) basePasses
      else {
        val sub = queries.filter { case (k, _) => noisy.contains(k) }
        val extra = sub.toSeq.map { case (name, fn) =>
          val t0 = System.nanoTime()
          val t = try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
            catch { case _: Throwable => -1.0 }
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          name -> t
        }.toMap
        basePasses :+ extra
      }
    val results = names.map { k =>
      val vs = passes.flatMap(_.get(k))
      k -> (if (vs.exists(_ < 0)) -1.0 else vs.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val reps = names.map { k =>
      s"\"" + k + "\":" + passes.flatMap(_.get(k)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // failures (-1 markers) must not shrink the total — a breakage would
    // otherwise read as a speedup to anything tracking only the total
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"sf":"$sfDir"}"""
    // The driver records only a ~2000-char TAIL of stdout; at 145 queries
    // the full per-query line is ~6 kB, so since r8 the machine-readable
    // artifact was a truncated string. Order of record: (1) the full line
    // FIRST (humans / local tooling), (2) the full map to a JSON file
    // (committed per round as the durable artifact), (3) a compact
    // summary — total, n, failures, top-5 slowest — printed LAST so it
    // is what lands in the driver's tail and parses.
    println(fullLine)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    val failures = results.count(_._2 < 0)
    val top5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + (math.round(v * 100) / 100.0) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failures":$failures,"queries":$top5,"full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
