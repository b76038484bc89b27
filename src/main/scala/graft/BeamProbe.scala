package graft

import graft.functions.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Operator-only decade harness for graph-navigation ANN search
  * ([[graft.functions.SimilarityOps.beamSearchTopK]]) — the q200 GATE
  * builds its kNN graph by exact brute force (n² — instrumentation that
  * caps the runnable scale, the q173/KnnProbe adjudication), so scale
  * evidence for the SEARCH comes from here: seed a hash-pseudo graph
  * (the KnnProbe convention — O(n·k), deterministic), refine one
  * nn-descent round, then time beam search for a fixed probe set over
  * the refined graph. Search cost is probes × hops × beam × degree —
  * corpus-independent joins against the (corpus-sized but map-only)
  * vector table.
  *
  * Usage: BeamProbe <sfDir> [probes=50] [k=10] [beam=16] [hops=4] [reps=2]
  */
object BeamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nProbes = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 10
    val beam = if (args.length > 3) args(3).toInt else 16
    val hops = if (args.length > 4) args(4).toInt else 4
    val reps = if (args.length > 5) args(5).toInt else 2
    val spark = GraftSession.getOrCreate("graft-beam-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    // graph build (timed separately — it is the KnnProbe workload)
    val tg0 = System.nanoTime()
    val seed = emb.select(col("vec_id").as("probe_id"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("probe_id"),
        pmod(DedupOps.hash60(
          concat_ws(":", lit("knnseed"), col("probe_id"), col("j"))),
          lit(n)).as("nbr_id"))
      .where(col("nbr_id") =!= col("probe_id"))
    val graph = SimilarityOps.nnDescent(emb, "vec_id", "embedding", seed,
      k = k, iters = 1).select("probe_id", "nbr_id").localCheckpoint(true)
    val tg = (System.nanoTime() - tg0) / 1e9
    println(f"[beam-probe] $sfDir n=$n graph(nn-descent 1 iter): $tg%.2f s")
    val probes = emb.where(pmod(col("vec_id"), lit(math.max(1L, n / nProbes))) === 0)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val rows = SimilarityOps.beamSearchTopK(emb, probes, graph,
        "vec_id", "vec_id", "embedding", k = k, beam = beam, hops = hops).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[beam-probe] $sfDir n=$n beam=$beam hops=$hops rep$r: $secs%.2f s, $rows rows")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
