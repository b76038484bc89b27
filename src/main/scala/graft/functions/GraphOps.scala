package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph analytics over edge DataFrames.
  *
  * Near-dup clustering (label propagation) lives in [[DedupOps.dedupClusters]];
  * this object holds the rank-style iterative computations. The common
  * 100 TB shape: edges are the corpus-sized relation, partitioned by source
  * node for the per-iteration join; the rank vector is node-sized; every
  * iteration is ONE join + ONE aggregate with a `localCheckpoint` stage
  * boundary so lineage (and thus plan size) stays constant as iterations
  * accumulate — the same discipline as [[DedupOps.dedupClusters]].
  */
object GraphOps {

  /** Power-iteration PageRank (Page/Brin/Motwani/Winograd 1999) with
    * correct DANGLING-NODE handling (Langville & Meyer 2004): the rank
    * mass sitting on nodes with no out-edges is redistributed uniformly
    * each step, so total rank stays 1 — skipping this (the common
    * shortcut) leaks mass and skews every score on real crawl graphs,
    * where a large fraction of pages has no observed outlinks.
    *
    *   r'(v) = (1−d)/N + d · ( Σ_{u→v} r(u)/outdeg(u)  +  D/N )
    *
    * where D = Σ r(u) over dangling u. Training-data use: link-graph
    * centrality as a document quality prior (crawl frontier weighting à la
    * OPIC/Common Crawl's harmonic-centrality ranking).
    *
    * Scale shape per iteration: contributions = edges ⋈ ranks on src
    * (shuffle keyed by src; AQE skew-split for hub sources) → partial-agg
    * sum keyed by dst; the dangling mass is a one-double aggregate action
    * that doubles as the iteration's materialization barrier (the rank
    * frame is `localCheckpoint`ed lazily, so the action materializes it
    * and every later consumer reads the checkpoint, not the lineage).
    * Fixed iteration count (default 5): deterministic output, and rank
    * deltas decay as d^k — enough to order documents by centrality, which
    * is all a quality prior needs.
    *
    * @param edges directed edges; duplicates are collapsed (a repeated
    *              link is still one edge, the standard PageRank model)
    * @return (id, rank) for every node appearing in any edge; Σ rank = 1
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 5): DataFrame = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      // rank ⋈ out-degree once per iteration, shared by the dangling-mass
      // action and the contribution join via the lazy checkpoint
      val rd = ranks.join(deg, Seq("id"), "left").localCheckpoint(false)
      val dangling = rd.where(col("deg").isNull)
        .agg(coalesce(sum("r"), lit(0.0))).head().getDouble(0)
      val contrib = e.join(rd.where(col("deg").isNotNull), e("s") === rd("id"))
        .groupBy(e("d").as("id")).agg(sum(col("r") / col("deg")).as("c"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(dangling / n))).as("r"))
        .localCheckpoint(false)
    }
    val out = ranks.localCheckpoint(true)
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
