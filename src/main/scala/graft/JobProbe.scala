package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Per-JOB wall-time attribution for one [[SparkEntry.queries]] entry:
  * `JobProbe <sfDir> <name> [reps=1]` — warms once (codegen/JIT/listing),
  * then re-runs with a listener recording every job's duration and call
  * site, printing jobs grouped by call site sorted by total seconds.
  * This is the measure-first tool of the optimization rounds: a gate is
  * dozens of Spark jobs (fixture builds, store writes, stream batches,
  * comparator tails) and the bench only shows their sum — this shows
  * which line of the gate owns the wall. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.getOrCreate("graft-job-probe")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    Bench.force(fn(spark, sfDir)) // warm
    clear()
    val starts = mutable.Map.empty[Int, (Long, String)]
    val rows = mutable.ArrayBuffer.empty[(String, Double)]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(e.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, site) =>
          rows += ((site, (System.nanoTime() - t0) / 1e9))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    for (r <- 1 to reps) {
      rows.clear()
      val t0 = System.nanoTime()
      val n = Bench.force(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading rows (the bus is async;
      // a short settle is enough for a measurement tool)
      Thread.sleep(300)
      val bySite = rows.groupBy(_._1).map { case (site, rs) =>
        (site, rs.map(_._2).sum, rs.size)
      }.toSeq.sortBy(-_._2)
      println(f"[job-probe] $name rep$r wall=$wall%.2f s jobs=${rows.size} jobSum=${rows.map(_._2).sum}%.2f s ($n rows)")
      bySite.take(40).foreach { case (site, sec, cnt) =>
        println(f"[job-probe]   $sec%8.2f s  x$cnt%-4d $site")
      }
      clear()
    }
    spark.stop()
  }
}
