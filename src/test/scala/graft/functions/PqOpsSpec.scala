package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // dim=4, m=2 (sub-dims of 2). Two clean clusters per subspace.
  private val corpus = Seq(
    (0L, vec(1, 0, 0, 1)), // init codewords (ids 0,1)
    (1L, vec(0, 1, 1, 0)),
    (2L, vec(0.9, 0.1, 0.1, 0.9)), // near codeword 0 in both subspaces
    (3L, vec(0.1, 0.9, 0.9, 0.1)), // near codeword 1 in both subspaces
    (4L, vec(0.95, 0, 0, 0.95))).toDF("vec_id", "embedding")

  test("pqEncode assigns each subspace to its nearest codeword") {
    val init = corpus.where(col("vec_id") < 2)
    val cb = PqOps.pqCodebook(corpus, "vec_id", "embedding", init, "vec_id",
      m = 2, dim = 4, lloydRounds = 0)
    val codes = PqOps.pqEncode(corpus, "vec_id", "embedding", cb, 2, 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes(0L) == Seq(0L, 0L) && codes(2L) == Seq(0L, 0L) && codes(4L) == Seq(0L, 0L))
    assert(codes(1L) == Seq(1L, 1L) && codes(3L) == Seq(1L, 1L))
    assert(codes.values.forall(_.size == 2), "one code per subspace")
  }

  test("one Lloyd round recenters codewords to cluster means") {
    val init = corpus.where(col("vec_id") < 2)
    val cb = PqOps.pqCodebook(corpus, "vec_id", "embedding", init, "vec_id",
      m = 2, dim = 4, lloydRounds = 1)
      .collect().map(r => (r.getAs[Int]("sub"), r.getAs[Long]("cid")) -> r.getSeq[Double](2)).toMap
    // sub 0, codeword 0 captured vectors 0,2,4: mean of (1,0),(0.9,0.1),(0.95,0)
    val exp = Seq((1.0 + 0.9f.toDouble + 0.95f.toDouble) / 3, (0.0 + 0.1f.toDouble + 0.0) / 3)
    cb((0, 0L)).zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("pqTopK ranks same-cluster vectors first, excludes self") {
    val init = corpus.where(col("vec_id") < 2)
    val cb = PqOps.pqCodebook(corpus, "vec_id", "embedding", init, "vec_id",
      m = 2, dim = 4, lloydRounds = 1)
    val codes = PqOps.pqEncode(corpus, "vec_id", "embedding", cb, 2, 4)
    val probes = corpus.where(col("vec_id") === 2)
    val out = PqOps.pqTopK(codes, probes, "vec_id", "embedding", cb,
      m = 2, dim = 4, k = 4, corpusIdCol = "vec_id")
      .orderBy("rank").collect().map(r => r.getAs[Long]("nbr_id"))
    assert(!out.contains(2L), "self must be excluded")
    // cluster {0,2,4} shares codes, so 0 and 4 have ADC distance == the
    // probe's own-code distance and precede 1 and 3
    assert(out.take(2).toSet == Set(0L, 4L), s"got ${out.toSeq}")
  }

  test("pq pipeline is deterministic under repartition") {
    val rng = new scala.util.Random(5)
    val big = (0L until 120L).map(i =>
      (i, Array.fill(8)(rng.nextFloat()))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val init = df.where(col("vec_id") < 4)
      val cb = PqOps.pqCodebook(df, "vec_id", "embedding", init, "vec_id",
        m = 2, dim = 8, lloydRounds = 1)
      val codes = PqOps.pqEncode(df, "vec_id", "embedding", cb, 2, 8)
      PqOps.pqTopK(codes, df.where(col("vec_id") < 3), "vec_id", "embedding", cb,
        m = 2, dim = 8, k = 5, corpusIdCol = "vec_id")
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("nbr_id"),
          r.getAs[Int]("rank"))).toSet
    }
    assert(run(big) == run(big.repartition(11)))
  }

  test("pqRerankTopK with full-corpus candidates equals exact L2 brute force") {
    val rng = new scala.util.Random(9)
    val corpus = (0L until 80L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val init = corpus.where(col("vec_id") < 4)
    val cb = PqOps.pqCodebook(corpus, "vec_id", "embedding", init, "vec_id",
      m = 2, dim = 8, lloydRounds = 1)
    val codes = PqOps.pqEncode(corpus, "vec_id", "embedding", cb, 2, 8)
    val probes = corpus.where(col("vec_id") < 3)
    // margin covering the whole corpus -> the proposal set is everything,
    // so the rerank IS exact brute force (the margin-certification bound)
    val rr = PqOps.pqRerankTopK(corpus, codes, probes, "vec_id", "embedding",
      cb, m = 2, dim = 8, k = 5, margin = 16, corpusIdCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    import org.apache.spark.sql.functions.{broadcast => bc, call_function, col => c2, lit => l2, row_number}
    def vd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("vec_dot", a, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(c2("__d").asc, c2("nbr_id").asc)
    val exact = corpus.select(c2("vec_id").as("nbr_id"), c2("embedding").as("__cv"))
      .crossJoin(bc(probes.select(c2("vec_id").as("probe_id"), c2("embedding").as("__pv"))))
      .where(c2("nbr_id") =!= c2("probe_id"))
      .withColumn("__d", vd(c2("__cv"), c2("__cv"))
        - l2(2.0) * vd(c2("__cv"), c2("__pv")) + vd(c2("__pv"), c2("__pv")))
      .withColumn("rank", row_number().over(w)).where(c2("rank") <= 5)
      .select(c2("probe_id"), c2("nbr_id"), c2("rank").cast("int").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rr == exact)
    // the sqrt-derived cut at a scale covering the corpus agrees too
    val rs = PqOps.pqRerankTopKSqrt(corpus, codes, probes, "vec_id", "embedding",
      cb, m = 2, dim = 8, k = 5, candSqrtScale = 10.0, corpusIdCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rs == exact)
  }

  test("ivfPqTopK: perfect codebook + full probing recovers exact L2 top-k") {
    // integer coords, untrained quantizer (updateRounds/lloydRounds = 0),
    // codebook seeded with EVERY residual: each residual encodes to
    // itself, so ADC(q, x) within a probed cell is exactly |q - x|^2 —
    // with all cells probed the index must reproduce exact L2 search
    val rng = new scala.util.Random(7)
    val data = (0L until 24L).map(i =>
      (i, Array.fill(4)((rng.nextInt(11) - 5).toFloat)))
    val df = data.toDF("vec_id", "embedding")
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + x * x) > 0"))
    val kept = df.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).map(_.toLong).toArray).toMap
    val cent = SimilarityOps.kmeansCentroids(df, "vec_id", "embedding",
      df.where($"vec_id" < 4), "vec_id", updateRounds = 0)
    val probes = df.where($"vec_id" < 3)
    val got = PqOps.ivfPqTopK(df, probes, "vec_id", "vec_id", "embedding",
      cent, "vec_id", pqInitIds = df.select("vec_id"),
      m = 2, dim = 4, k = 5, nProbe = 4, lloydRounds = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      (p, pv) <- kept.toSeq if p < 3
      ranked = kept.toSeq.filter(_._1 != p)
        .map { case (id, xv) =>
          (id, pv.zip(xv).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(5)
      ((id, _), i) <- ranked.zipWithIndex
    } yield (p, id, i + 1)).toSet
    assert(got == expected)
    // narrow probing: well-formed subset, no self-matches, <= k per probe
    val narrow = PqOps.ivfPqTopK(df, probes, "vec_id", "vec_id", "embedding",
      cent, "vec_id", pqInitIds = df.where($"vec_id" < 8).select("vec_id"),
      m = 2, dim = 4, k = 5, nProbe = 1, lloydRounds = 1).collect()
    assert(narrow.nonEmpty)
    assert(!narrow.exists(r => r.getLong(0) == r.getLong(1)))
    assert(narrow.groupBy(_.getLong(0)).values.forall(_.length <= 5))
  }

  test("sq8: quantization is the exact affine map; search ranks by integer dot") {
    import org.apache.spark.sql.DataFrame
    // dim 2: bounds lo=(0,0), hi=(10,20); values quantize exactly
    val corpus = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 20f)),
      (2L, Array(5f, 10f)), (3L, Array(10f, 0f)), (4L, Array(0f, 20f))
    ).toDF("vec_id", "embedding")
    val b = SimilarityOps.sq8Bounds(corpus, "embedding").collect()
      .map(r => r.getAs[Int]("dim") -> ((r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    assert(b == Map(0 -> ((0.0, 10.0)), 1 -> ((0.0, 20.0))))
    val enc = SimilarityOps.sq8Encode(corpus, "vec_id", "embedding",
        SimilarityOps.sq8Bounds(corpus, "embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("qv").toList).toMap
    assert(enc(0L) == List(0L, 0L) && enc(1L) == List(255L, 255L))
    assert(enc(2L) == List(128L, 128L)) // round(127.5) half-up
    assert(enc(3L) == List(255L, 0L) && enc(4L) == List(0L, 255L))
    // out-of-bounds probe clamps instead of leaving [0, 255]
    val oob = Seq((9L, Array(-5f, 25f))).toDF("vec_id", "embedding")
    val qoob = SimilarityOps.sq8Encode(oob, "vec_id", "embedding",
        SimilarityOps.sq8Bounds(corpus, "embedding")).collect()
      .head.getAs[scala.collection.Seq[Long]]("qv").toList
    assert(qoob == List(0L, 255L))
    // search from (10, 20): quantized cosine ranks the diagonal (2) and
    // corner (1) at cos 1.0 (tie -> smaller id), axes after
    val top = SimilarityOps.sq8TopK(corpus, corpus.where($"vec_id" === 1),
      "vec_id", "vec_id", "embedding", k = 3).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("nbr_id")).toList
    assert(top.take(2) == List(2L, 3L) || top.take(2) == List(2L, 4L) ||
      top.head == 2L) // 2 is collinear with the probe: always rank 1
    // zero-quantized rows (all-lo corpus vector) are guarded out of both sides
    val self = SimilarityOps.sq8TopK(corpus, corpus, "vec_id", "vec_id",
      "embedding", k = 4).collect()
    assert(!self.exists(r => r.getAs[Long]("probe_id") == 0L ||
      r.getAs[Long]("nbr_id") == 0L))
    assert(!self.exists(r => r.getAs[Long]("probe_id") == r.getAs[Long]("nbr_id")))
  }

  test("opqBalancedPermutation deals dims round-robin by energy; permuteVec applies it") {
    // dim=4, m=2: energies 3² > 2² > 1² > 0² per dim, so ranks are
    // (0,1,2,3) = dims (0,1,2,3); round-robin puts rank 0,2 in subspace 0
    // and rank 1,3 in subspace 1 → perm = (0,2,1,3)
    val df = Seq((0L, vec(3, 2, 1, 0))).toDF("vec_id", "embedding")
    val perm = PqOps.opqBalancedPermutation(df, "embedding", m = 2, dim = 4)
    assert(perm == Seq(0, 2, 1, 3), s"got $perm")
    val out = PqOps.permuteVec(
        df.select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("embedding")), "embedding", perm)
      .collect().head.getAs[scala.collection.Seq[Double]]("embedding").toList
    assert(out == List(3.0, 1.0, 2.0, 0.0))
    // ties (equal energies) break toward the smaller dim: identity-ish deal
    val tied = Seq((0L, vec(1, 1, 1, 1)), (1L, vec(-1, -1, -1, -1)))
      .toDF("vec_id", "embedding")
    assert(PqOps.opqBalancedPermutation(tied, "embedding", m = 2, dim = 4)
      == Seq(0, 2, 1, 3))
    // a permutation preserves exact dots: cosine top-k identical either side
    val emb = (0L to 9L).map(i => (i, vec(i % 3, (i % 5) * 2, 7 - (i % 7), i % 2))).toDF("vec_id", "embedding")
    val p9 = PqOps.opqBalancedPermutation(emb, "embedding", m = 2, dim = 4)
    val pe = PqOps.permuteVec(emb, "embedding", p9)
    def top(src: org.apache.spark.sql.DataFrame) =
      SimilarityOps.bruteForceTopK(src, src.where($"vec_id" < 2), "vec_id",
          "vec_id", "embedding", k = 3)
        .select("probe_id", "rank", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top(emb) == top(pe), "permutation changed exact cosine ranks")
  }
}
