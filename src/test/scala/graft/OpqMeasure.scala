package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{PqOps, SimilarityOps}

/** Measurement main behind BASELINE's "PQ codeword ALLOCATION" ladder
  * (round 16): recall@5 of plain-PQ MaxSim stage 1 under the contiguous
  * subspace split vs the OPQ energy-balanced permutation, at the exact
  * q278 budget (m=4 × 16 codewords, 1 Lloyd round, top-4 tokens/query
  * token), on (a) the spectral-decay random fixture (q283's — where
  * ranking error is quantization-driven) and (b) the clustered fixture
  * (q278's — where stage-1 cluster ties collapse candidates and no
  * allocation can help). Test scope: a reproducibility harness, not a
  * shipped operator. Run: `sbt "Test/runMain graft.OpqMeasure <sfDir>"`. */
object OpqMeasure {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate("opq-measure")
    spark.sparkContext.setLogLevel("ERROR")
    def T(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    // q283's spectral-decay fixture: dim i of the random embedding × (64−i)/64
    val semb = T("embeddings").select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => x.cast("double") * ((lit(64) - i).cast("double") / lit(64.0)))
        .as("embedding"))
    // q278's clustered fixture: ±1 sign-pattern centers + 0.25 jitter
    val cemb = T("embeddings").select(col("vec_id"),
      zip_with(
        transform(sequence(lit(0), lit(63)), i =>
          when(pmod(graft.functions.DedupOps.hash60(concat_ws(":", lit("clu"),
            pmod(expr("vec_id div 5"), lit(8)), i)), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))),
        col("embedding"),
        (b, x) => b + lit(0.25) * x.cast("double")).as("embedding"))

    // the q278/q283 pipeline at the fixed budget; prints hits vs exact top-5
    def recall(src: DataFrame, tag: String): Unit = {
      val emb = src.select(expr("vec_id div 5").as("doc_id"), col("vec_id"), col("embedding"))
      val c = emb.where(col("doc_id") >= 4)
      val p = emb.where(col("doc_id") < 4)
      val init = c.where(col("vec_id") < 36)
      val cb = PqOps.pqCodebook(c, "vec_id", "embedding", init, "vec_id",
        m = 4, dim = 64, lloydRounds = 1)
      val codes = PqOps.pqEncode(c, "vec_id", "embedding", cb, 4, 64)
      val hits = PqOps.pqTopK(codes, p, "vec_id", "embedding", cb,
        m = 4, dim = 64, k = 4, corpusIdCol = "vec_id")
      val cand = hits.select(expr("probe_id div 5").as("probe_id"),
        expr("nbr_id div 5").as("doc_id")).distinct()
      val served = SimilarityOps.maxSimRerank(c, p, cand, "doc_id", "doc_id",
        "vec_id", "embedding", k = 5)
      val exact = SimilarityOps.maxSimTopK(c, p, "doc_id", "doc_id", "vec_id",
        "embedding", k = 5)
        .select(col("probe_id"), col("doc_id"), lit(true).as("hit"))
      val j = served.join(exact, Seq("probe_id", "doc_id"), "left")
      println(s"LADDER $tag: candidates=${cand.count()} served=${j.count()} " +
        s"hits=${j.where(col("hit")).count()} of 20")
    }

    // decayed-CLUSTERED fixture: cemb under the same spectral decay —
    // after residual encoding the leftover jitter inherits the decay,
    // so allocation should compose with the q279 residual rung
    val dcemb = cemb.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => x * ((lit(64) - i).cast("double") / lit(64.0)))
        .as("embedding"))

    // the q279 residual pipeline at the TIGHT budget (16 codewords/sub)
    def recallResidual(src: DataFrame, tag: String): Unit = {
      val emb = src.select(expr("vec_id div 5").as("doc_id"), col("vec_id"), col("embedding"))
      val c = emb.where(col("doc_id") >= 4)
      val p = emb.where(col("doc_id") < 4)
      val cent = c.where(col("vec_id") < 64).select("vec_id", "embedding")
      val hits = PqOps.ivfPqTopK(
        c.select("vec_id", "embedding"), p.select("vec_id", "embedding"),
        "vec_id", "vec_id", "embedding", cent, "vec_id",
        pqInitIds = c.where(col("vec_id") < 36).select("vec_id"),
        m = 4, dim = 64, k = 4, nProbe = 11, lloydRounds = 1)
      val cand = hits.select(expr("probe_id div 5").as("probe_id"),
        expr("nbr_id div 5").as("doc_id")).distinct()
      val served = SimilarityOps.maxSimRerank(c, p, cand, "doc_id", "doc_id",
        "vec_id", "embedding", k = 5)
      val exact = SimilarityOps.maxSimTopK(c, p, "doc_id", "doc_id", "vec_id",
        "embedding", k = 5)
        .select(col("probe_id"), col("doc_id"), lit(true).as("hit"))
      val j = served.join(exact, Seq("probe_id", "doc_id"), "left")
      println(s"LADDER $tag: candidates=${cand.count()} served=${j.count()} " +
        s"hits=${j.where(col("hit")).count()} of 20")
    }

    Seq("spectral-decay" -> semb, "clustered" -> cemb).foreach { case (tag, fx) =>
      recall(fx, s"$tag-contiguous")
      val perm = PqOps.opqBalancedPermutation(
        fx.where(col("vec_id") >= 20), "embedding", m = 4, dim = 64)
      recall(PqOps.permuteVec(fx, "embedding", perm), s"$tag-opq-permuted")
    }
    Seq("decayed-clustered" -> dcemb).foreach { case (tag, fx) =>
      recallResidual(fx, s"$tag-residual16-contiguous")
      val perm = PqOps.opqBalancedPermutation(
        fx.where(col("vec_id") >= 20), "embedding", m = 4, dim = 64)
      recallResidual(PqOps.permuteVec(fx, "embedding", perm),
        s"$tag-residual16-opq")
    }
    spark.stop()
  }
}
