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
    val starts = mutable.Map.empty[Int, (Long, String, String)]
    // (execId, rawSite, useful?, seconds) — AQE stage jobs carry useless
    // call sites and may START before the root action's job, so per-exec
    // attribution is resolved AFTER the run from any useful sibling
    val rows = mutable.ArrayBuffer.empty[(String, String, Boolean, Double)]
    // executionId → action description from the SQL execution-start
    // event (the only reliable attribution for AQE stage jobs)
    val execDesc = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val listener = new SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case es: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(es.executionId.toString, es.description)
          case _ => ()
        }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val props = Option(e.properties)
        val execId = props.flatMap(p =>
          Option(p.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(p.getProperty("spark.sql.execution.id"))))
          .getOrElse("")
        val graftFrame = e.stageInfos.iterator
          .flatMap(si => si.details.split('\n'))
          .find(l => l.contains("graft.") && !l.contains("JobProbe"))
          .map(_.trim.replaceAll("^at ", ""))
        val rawSite = graftFrame
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts(e.jobId) = (System.nanoTime(), execId, rawSite)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, execId, site) =>
          val useful = !site.contains("withThreadLocalCaptured") &&
            !site.contains("CompletableFuture") && site != "?"
          rows += ((execId, site, useful, (System.nanoTime() - t0) / 1e9))
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
      val siteByExec = rows.filter(r => r._3 && r._1.nonEmpty)
        .groupBy(_._1).map { case (ex, rs) => ex -> rs.head._2 }
      val attributed = rows.map { case (ex, site, useful, sec) =>
        (if (useful) site
         else siteByExec.get(ex).orElse(Option(execDesc.get(ex)))
           .getOrElse(site), sec)
      }
      val bySite = attributed.groupBy(_._1).map { case (site, rs) =>
        (site, rs.map(_._2).sum, rs.size)
      }.toSeq.sortBy(-_._2)
      println(f"[job-probe] $name rep$r wall=$wall%.2f s jobs=${rows.size} jobSum=${attributed.map(_._2).sum}%.2f s ($n rows)")
      bySite.take(40).foreach { case (site, sec, cnt) =>
        println(f"[job-probe]   $sec%8.2f s  x$cnt%-4d $site")
      }
      if (sys.env.contains("JOB_PROBE_DEBUG"))
        rows.filterNot(_._3).take(10).foreach { case (ex, site, _, sec) =>
          println(f"[job-probe-dbg] exec='$ex' $sec%.2f s $site")
        }
      clear()
    }
    spark.stop()
  }
}
