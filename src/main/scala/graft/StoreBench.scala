package graft

import org.apache.spark.sql.functions._

/** Persisted-store lifecycle measurement: `StoreBench <sfDir> [reps]`.
  *
  * Times the three phases the q99 gate composes, separately:
  *   1. build+save — signature store construction and bucketed write
  *      (paid ONCE per corpus, amortized across every future increment)
  *   2. absorb-from-disk — reload the bucketed table and dedup the
  *      increment against it (the recurring per-batch cost; the claim
  *      under test is that this is ∝ increment, not ∝ store)
  *   3. q67-style in-query — store recomputed from corpus text inside
  *      the query (what a pipeline WITHOUT a persisted store pays per
  *      batch; BASELINE.md's q67 row notes its cost is dominated by
  *      this construction)
  *
  * Prints one line per phase with best-of-reps wall seconds.
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("graft-store-bench")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.DedupOps
    import graft.sources.TableStore
    val tbl = "graft_storebench_sigs"

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def best(label: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val sec = (System.nanoTime() - t0) / 1e9
        clear()
        (sec, n)
      }
      val (sec, n) = times.minBy(_._1)
      println(f"[store-bench] $label: best=$sec%.3f s over $reps reps ($n rows) all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }

    // split: 90% base corpus, 10% increment — the ingestion-batch shape
    val base = docs.where(col("doc_id") % 10 =!= 0)
    def incr = docs.where(col("doc_id") % 10 === 0)

    best("build+save") {
      TableStore.dropTable(spark, tbl)
      TableStore.saveBucketed(DedupOps.minhashStore(base, "text", "doc_id"),
        tbl, bucketCols = Seq("band", "band_key"), buckets = 8)
      TableStore.loadTable(spark, tbl).count()
    }
    best("absorb-from-disk") {
      val store = TableStore.loadTable(spark, tbl)
      val (survivors, _) = DedupOps.incrementalMinhashDedupBanded(
        incr, "text", "doc_id", store, k = 64, bands = 16, ngram = 3, threshold = 0.5)
      survivors.count()
    }
    best("in-query (q67 style)") {
      val store = DedupOps.minhashSignatures(base, "text", "doc_id")
      val (survivors, _) = DedupOps.incrementalMinhashDedup(
        incr, "text", "doc_id", store, k = 64, bands = 16, ngram = 3, threshold = 0.5)
      survivors.count()
    }
    spark.stop()
  }
}
