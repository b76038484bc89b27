package graft

import graft.functions.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Operator-only decade harness for the kNN-graph STORE lifecycle
  * ([[graft.functions.SimilarityOps.knnGraphAbsorb]]) and the
  * quantizer-routed beam entry ([[graft.functions.SimilarityOps
  * .cellEntryNodes]] + [[graft.functions.SimilarityOps
  * .beamSearchTopKFrom]]). The q234/q235 GATES pin correctness with
  * oracle-replayable instrumentation (fixed-16 cells whose same-cell
  * pair sets grow quadratically; a brute-force n² graph) — scale
  * evidence comes from here, in the deployment configuration:
  *
  *  - the live graph is a hash-pseudo seed (the KnnProbe convention —
  *    O(n·k), deterministic, no n² baseline);
  *  - cells are hash buckets of CONSTANT ~64 occupancy (modelling the
  *    balanced corpus-proportional inverted file a production
  *    deployment maintains — cell COUNT grows with the corpus, cell
  *    SIZE does not, so cellmate seeding stays O(increment));
  *  - the increment is a fixed 1/8 of the corpus (vec_id ≡ 5 mod 8),
  *    so absorb work should scale LINEARLY with the decade;
  *  - routing entries for 50 probes come from real vector centroids
  *    (vec_id < 64 — the fixed-64 convention) over the absorbed live
  *    graph, then a hops=3/beam=16 routed walk.
  *
  * Usage: `AbsorbProbe <sfDir> [k=10] [reps=2]`.
  */
object AbsorbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.getOrCreate("graft-absorb-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val nCells = math.max(1L, n / 64L)
    val isNew = pmod(col("vec_id"), lit(8)) === 5
    // hash-pseudo live graph for the base nodes (KnnProbe convention)
    val base = emb.where(!isNew)
    val live0 = base.select(col("vec_id").as("probe_id"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("probe_id"),
        pmod(DedupOps.hash60(
          concat_ws(":", lit("knnseed"), col("probe_id"), col("j"))),
          lit(n)).as("nbr_id"))
      .where(col("nbr_id") =!= col("probe_id"))
      .localCheckpoint(true) // the persisted store stand-in
    // constant-occupancy hash cells: the balanced inverted file's layout
    val cells = emb.select(col("vec_id"),
        pmod(DedupOps.hash60(concat_ws(":", lit("cell"), col("vec_id"))),
          lit(nCells)).as("cid"))
      .localCheckpoint(true)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val delta = SimilarityOps.knnGraphAbsorb(live0, emb,
        emb.where(isNew).select("vec_id"), cells, "vec_id", "embedding", k)
      val dRows = delta.count()
      val tAbsorb = (System.nanoTime() - t0) / 1e9
      // routed beam over the absorbed live view
      val live1 = SimilarityOps.liveKnnGraph(
        live0.withColumn("epoch", lit(0L))
          .unionByName(delta.select("probe_id", "nbr_id")
            .withColumn("epoch", lit(1L))))
      val probes = emb.where(col("vec_id") < 50)
      val t1 = System.nanoTime()
      val entries = SimilarityOps.cellEntryNodes(
        SimilarityOps.ivfStore(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 64), "vec_id"),
        probes, emb.where(col("vec_id") < 64),
        "vec_id", "vec_id", "vec_id", "embedding")
      val res = SimilarityOps.beamSearchTopKFrom(emb, probes, live1, entries,
        "vec_id", "vec_id", "embedding", k = 10, beam = 16, hops = 3)
      val rRows = res.count()
      val tBeam = (System.nanoTime() - t1) / 1e9
      println(f"[absorb-probe] $sfDir n=$n k=$k rep$r: " +
        f"absorb $tAbsorb%.2f s ($dRows delta rows), " +
        f"routed-beam $tBeam%.2f s ($rRows rows)")
      // only the SQL cache per rep — the blanket getPersistentRDDs sweep
      // would release live0/cells (the fixture checkpoints reps share)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.stop()
  }
}
