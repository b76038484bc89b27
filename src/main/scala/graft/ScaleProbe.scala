package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-CONFIGURATION probes: variants of gate queries whose gate
  * instance pins a configuration that is correct at gate scale but whose
  * 100 TB deployment turns a knob with corpus size. Gate oracles freeze
  * the gate configuration (the hashes certify correctness); these probes
  * measure the deployment configuration at the scale where the knob
  * matters — ScaleUp decades — without touching the gates.
  *
  * Current probes:
  *   - q72_srp16: [[graft.functions.SimilarityOps.embeddingDupPairs]]
  *     with 16-bit SRP bands (65536 buckets/band) instead of the gate's
  *     8-bit bands (256). Candidate volume per band is ~n²/buckets; a
  *     fixed 256-bucket band goes quadratic once n ≫ 256·density — the
  *     deployment rule is buckets ∝ n (bits ≈ log2(n) − log2(target
  *     per-bucket density)), which keeps per-bucket occupancy and thus
  *     candidate volume linear. Recall guarantee is unchanged in kind:
  *     planted near-dups at cos ≥ 0.9 differ in ≪ bands−1 bands.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [probe ...] [reps]
  */
object ScaleProbe {
  import graft.functions.SimilarityOps

  private def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val planted = emb.select((col("vec_id") + 100000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.25f)).as("embedding"))
    emb.unionByName(planted)
  }

  val probes: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_srp16" -> ((s, dir) => {
      SimilarityOps.embeddingDupPairs(plantedCorpus(s, dir), "vec_id", "embedding",
        threshold = 0.9, nBits = 64, bands = 4)
        .select("id_a", "id_b")
    }),
    // the deployment rule APPLIED at the next decade: 21-bit bands (3
    // bands × 21 of a 63-bit signature) give 2^21 ≈ 2M buckets/band —
    // occupancy < 1 at the sf10 probe's 400k vectors, so candidate
    // volume stays ≈ n where the fixed 16-bit configuration has gone
    // quadratic. Recall argument unchanged: planted near-dups at
    // cos ≥ 0.9 still collide in ≥ 1 of 3 bands with margin
    "q72_srp21" -> ((s, dir) => {
      SimilarityOps.embeddingDupPairs(plantedCorpus(s, dir), "vec_id", "embedding",
        threshold = 0.9, nBits = 63, bands = 3)
        .select("id_a", "id_b")
    }),
    // q146's deployment rule APPLIED: the candidate budget scales
    // LINEARLY with the corpus (the gate pins 13000 at 500 docs = 26
    // pairs/doc; here budget = 26·n_docs), so the candidate stage's
    // work per doc is constant by construction across decades — the
    // measurement that certifies the budget contract where q111's
    // fixed guard measured 6.7× in the second decade.
    "q146_budget_scaled" -> ((s, dir) => {
      import graft.functions.DedupOps
      val d = s.read.parquet(s"$dir/documents.parquet")
      val n = d.count() // planning scalar: sizes the budget, as a caller would
      val pairs = DedupOps.ngramJaccardPairsBudget(d, "text", "doc_id",
        n = 3, threshold = 0.3, candidateBudget = 26L * n)
      DedupOps.clusterRepresentatives(d, pairs, "doc_id", "n_chars")
    })
  )

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val (names, reps) = rest.lastOption.flatMap(a => scala.util.Try(a.toInt).toOption) match {
      case Some(r) => (rest.dropRight(1).toSeq, r)
      case None    => (rest.toSeq, 2)
    }
    val todo = if (names.nonEmpty) names else probes.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate("graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    todo.foreach { n =>
      val fn = probes(n)
      fn(spark, dir).count() // warm
      clear()
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        println(f"[scale-probe] $n rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
        clear()
      }
    }
    spark.stop()
  }
}
