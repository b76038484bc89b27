package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** OPERATOR-ONLY decade probe for all-kNN graph construction:
  * [[graft.functions.SimilarityOps.nnDescent]] run from a deterministic
  * hash-seed graph — the Dong et al. (WWW 2011) random-init regime, which
  * is also the honest scale configuration: no coarse quantizer (whose flat
  * assignment is n·k dots) and no brute-force baseline (n² by definition),
  * so the measured work is EXACTLY the operator's O(n·k²) per iteration
  * and the probe runs at sf10 where the q173/q177 recall gates cannot.
  * Recall claims stay gate-certified at sf0.001–0.1 (q177: seed 367 →
  * refined 673 milli mean recall@10 after one round); this probe certifies
  * the LINEAR decade curve of the refinement itself.
  *
  * Usage: `KnnProbe <sfDir> [k=10] [iters=2] [reps=2]`.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 2
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.getOrCreate("graft-knn-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      // hash-seed: k md5-derived pseudo-neighbors per node (ids that miss
      // the corpus — sparse id spaces — just thin the seed; deterministic)
      val seed = emb.select(col("vec_id").as("probe_id"),
          explode(sequence(lit(0), lit(k - 1))).as("j"))
        .select(col("probe_id"),
          pmod(graft.functions.DedupOps.hash60(
            concat_ws(":", lit("knnseed"), col("probe_id"), col("j"))),
            lit(n)).as("nbr_id"))
        .where(col("nbr_id") =!= col("probe_id"))
      val g = SimilarityOps.nnDescent(emb, "vec_id", "embedding", seed,
        k = k, iters = iters)
      val edges = g.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[knn-probe] $sfDir n=$n k=$k iters=$iters rep$r: $secs%.2f s, $edges edges")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
