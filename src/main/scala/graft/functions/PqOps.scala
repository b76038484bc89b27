package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding-scale ANN (Jégou/Douze/Schmid 2011,
  * "Product Quantization for Nearest Neighbor Search").
  *
  * The 100 TB story is MEMORY, not speed of one query: a 64-dim float32
  * embedding is 256 bytes; its PQ code under m=4 subspaces × 16 codewords
  * is 4 nibbles — the codes for 10^11 vectors fit where the raw vectors
  * never could, and the scan side of a query touches only codes. The
  * pipeline is
  *
  *   1. [[pqCodebook]]  — per-subspace k-means (L2): k codewords per
  *      subspace, trained like [[SimilarityOps.kmeansCentroids]] from a
  *      caller-supplied deterministic init, fixed Lloyd rounds;
  *   2. [[pqEncode]]    — map-only: each vector → m codeword ids;
  *   3. [[pqTopK]]      — ADC (asymmetric distance computation): per probe
  *      build the m×k table of exact subspace distances ‖q_s − c‖², then
  *      every corpus distance is m table lookups — no vector arithmetic
  *      in the scan.
  *
  * Determinism: all dot products are sequential folds (the `vec_dot`
  * kernel), the per-probe distance is an ORDERED fold over subspaces, and
  * ties break toward the smaller id everywhere — so distances are
  * bit-reproducible across engines replaying the same op order (the q114
  * DuckDB oracle does), and argmax/argmin choices are exact.
  *
  * Scale shape: codebook is m·k sub-vectors — broadcast everywhere;
  * encode is map-only; ADC probes carry their own m×k tables in the
  * broadcast, the corpus-side scan is map-only, and the per-probe top-k
  * is a WindowGroupLimit pre-reduction before the only exchange.
  */
object PqOps {

  private def vdot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Explode a vector column into its `m` contiguous sub-vectors (cast to
    * double): one row per (row, sub). `dim` must be divisible by `m`. */
  private def subVectors(df: DataFrame, vecCol: String, m: Int, dim: Int): DataFrame = {
    val sd = dim / m
    df.select(col("*"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"),
          transform(slice(col(vecCol), s * sd + 1, sd), x => x.cast("double")).as("sv"))
      }: _*)).as("__s"))
      .select(col("*"), col("__s.sub").as("sub"), col("__s.sv").as("sv"))
      .drop("__s", vecCol)
  }

  /** Nearest codeword per (row, sub) under L2: argmin ‖x−c‖² ≡ argmax
    * x·c − ‖c‖²/2 (the ‖x‖² term is constant per row). Ties → smaller cid. */
  private def assign(subv: DataFrame, idCol: String, codebook: DataFrame): DataFrame = {
    val cb = codebook.select(col("sub"), col("cid"), col("cv"),
      vdot(col("cv"), col("cv")).as("__cc"))
    val w = Window.partitionBy(col(idCol), col("sub"))
      .orderBy(col("__sc").desc, col("cid").asc)
    subv.join(broadcast(cb), Seq("sub"))
      .withColumn("__sc", vdot(col("sv"), col("cv")) - lit(0.5) * col("__cc"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__sc", "__rn", "__cc", "cv")
  }

  /** Train the per-subspace codebooks: init codewords are the init rows'
    * sub-vectors (cid = init id), then `lloydRounds` fixed assign→recenter
    * rounds — no convergence test, so nothing depends on FP-noise stopping.
    * A codeword that captures no vectors in a round is dropped (its cell is
    * empty), same as the coarse k-means here.
    *
    * @return (sub, cid, cv: Array[Double])
    */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                 init: DataFrame, initIdCol: String, m: Int, dim: Int,
                 lloydRounds: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(lloydRounds >= 0, s"lloydRounds must be >= 0, got $lloydRounds")
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val subv = subVectors(corpus.select(col(idCol), col(vecCol)), vecCol, m, dim)
    var cb = subVectors(init.select(col(initIdCol).as("cid"), col(vecCol)), vecCol, m, dim)
      .select(col("sub"), col("cid"), col("sv").as("cv"))
    for (_ <- 1 to lloydRounds) {
      cb = assign(subv, idCol, cb)
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("__pos", "__x")))
        .groupBy("sub", "cid", "__pos").agg(avg("__x").as("__mx"))
        .groupBy("sub", "cid")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__mx")))).as("__pm"))
        .select(col("sub"), col("cid"),
          transform(col("__pm"), p => p.getField("__mx")).as("cv"))
    }
    // model-sized (m·k rows) and consumed as the build side of SEVERAL
    // broadcast exchanges (encode, ADC tables) — without a checkpoint
    // every broadcast build re-runs the Lloyd training (r16: measured 3×
    // per ivfPqTopK call). Lazy: the first consumer materializes it.
    cb.localCheckpoint(false)
  }

  /** Encode every corpus vector as its `m` codeword ids, ordered by
    * subspace. Map-only modulo the tiny codebook broadcast.
    *
    * @return (idCol, codes: Array[Long])
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val subv = subVectors(corpus.select(col(idCol), col(vecCol)), vecCol, m, dim)
    assign(subv, idCol, codebook)
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("__sc"))
      .select(col(idCol), transform(col("__sc"), p => p.getField("cid")).as("codes"))
  }

  /** ADC top-k: exact ‖q_s − c‖² = q_s·q_s − 2·q_s·c + c·c per (probe,
    * sub, codeword) — m·k doubles per probe, broadcast; each corpus
    * distance is then an ORDERED fold over the m lookups (sequential by
    * subspace, so the float sum is engine-reproducible). Self-matches are
    * excluded; ranks break ties toward the smaller neighbor id.
    *
    * @param corpusCodes output of [[pqEncode]] — (corpusIdCol, codes)
    * @return (probe_id, nbr_id, rank) with rank 1..k by ascending ADC
    *         distance
    */
  def pqTopK(corpusCodes: DataFrame, probes: DataFrame, probeIdCol: String,
             vecCol: String, codebook: DataFrame, m: Int, dim: Int,
             k: Int, corpusIdCol: String = "id"): DataFrame = {
    graft.expr.GraftFunctions.register(probes.sparkSession)
    val psub = subVectors(probes.select(col(probeIdCol).as("probe_id"), col(vecCol)),
      vecCol, m, dim)
    val dt = psub.join(broadcast(codebook), Seq("sub"))
      .select(col("probe_id"), col("sub"), col("cid"),
        (vdot(col("sv"), col("sv")) - lit(2.0) * vdot(col("sv"), col("cv"))
          + vdot(col("cv"), col("cv"))).as("d"))
    // per probe: array (by sub) of cid→distance maps — the broadcast side
    val dts = dt.groupBy("probe_id", "sub")
      .agg(map_from_entries(array_sort(collect_list(struct(col("cid"), col("d"))))).as("__m"))
      .groupBy("probe_id")
      // maps aren't orderable, so index by sub via an outer map rather
      // than sorting (sub, map) structs
      .agg(map_from_entries(collect_list(struct(col("sub"), col("__m")))).as("__mm"))
      .select(col("probe_id"),
        transform(sequence(lit(0), lit(m - 1)), s => element_at(col("__mm"), s)).as("dts"))
    val dist = corpusCodes.join(broadcast(dts), col(corpusIdCol) =!= col("probe_id"))
      .withColumn("dist", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, s) => acc + element_at(element_at(col("dts"), s + 1),
          element_at(col("codes"), s + 1))))
    val w = Window.partitionBy("probe_id").orderBy(col("dist").asc, col(corpusIdCol).asc)
    dist.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("probe_id"), col(corpusIdCol).as("nbr_id"), col("rank").cast("int").as("rank"))
  }

  /** ADC-prefilter → EXACT-rerank top-k — the deployment shape of the PQ
    * index (the regime the q149 recall measurement demands: raw ADC@10
    * recall is 20–60%, so codes alone cannot serve results; codes plus a
    * margin CAN). [[pqTopK]] proposes the top `margin·k` candidates per
    * probe from codes alone — the memory-bounded scan that makes PQ worth
    * having at 10^11 vectors — then ONLY those candidates are re-scored
    * with exact L2 against the raw vectors and the final top-k is exact
    * WITHIN the proposal set. Recall equals the probability the true
    * top-k survive the ADC top-(margin·k) cut, which rises steeply with
    * margin (certified on this corpus by the q166 gate: at the certified
    * margin the rerank output is hash-identical to exact brute force).
    *
    * Scale shape: the candidate table is probes × margin·k rows —
    * broadcast; the raw-vector scan is map-only behind that broadcast
    * semi-join (the corpus never shuffles, and only candidate vectors'
    * payloads cross the network); the rerank distance is the same
    * c·c − 2·c·p + p·p ordered closed form as the exact oracle, so ranks
    * are IEEE-identical across engines.
    *
    * @return (probe_id, nbr_id, rank), rank 1..k by ascending exact L2
    */
  def pqRerankTopK(corpus: DataFrame, corpusCodes: DataFrame, probes: DataFrame,
                   probeIdCol: String, vecCol: String, codebook: DataFrame,
                   m: Int, dim: Int, k: Int, margin: Int,
                   corpusIdCol: String = "id"): DataFrame = {
    require(margin >= 1, s"margin must be >= 1, got $margin")
    pqRerankCandidates(corpus, corpusCodes, probes, probeIdCol, vecCol,
      codebook, m, dim, k, k * margin, corpusIdCol)
  }

  /** [[pqRerankTopK]] with the candidate count derived as
    * `candSqrtScale·√n` instead of a fixed margin — the scaling rule the
    * decade measurements demand: the worst ADC rank of a true top-10
    * member grows ≈ √10 per decade on the gate corpus family (163 →
    * 643 → 2120 → 6433 for n = 500 → 2k → 20k → 200k) — a fixed
    * margin silently loses exactness at some scale, while 30·√n covers
    * every measured decade with a stable ~2× headroom (the q163
    * fraction-probing lesson applied to the rerank cut) and keeps the
    * rerank payload a vanishing fraction of brute force (√n/n → 0: at
    * 10⁹ vectors the default reranks ~0.1%). The corpus count is one
    * planning scalar (the budgetGuard role). */
  def pqRerankTopKSqrt(corpus: DataFrame, corpusCodes: DataFrame, probes: DataFrame,
                       probeIdCol: String, vecCol: String, codebook: DataFrame,
                       m: Int, dim: Int, k: Int, candSqrtScale: Double = 30.0,
                       corpusIdCol: String = "id"): DataFrame = {
    require(candSqrtScale > 0, s"candSqrtScale must be > 0, got $candSqrtScale")
    val n = corpusCodes.count()
    val cand = math.max(k.toLong, math.ceil(candSqrtScale * math.sqrt(n.toDouble)).toLong)
      .min(Int.MaxValue.toLong).toInt
    pqRerankCandidates(corpus, corpusCodes, probes, probeIdCol, vecCol,
      codebook, m, dim, k, cand, corpusIdCol)
  }

  private def pqRerankCandidates(corpus: DataFrame, corpusCodes: DataFrame,
                                 probes: DataFrame, probeIdCol: String,
                                 vecCol: String, codebook: DataFrame,
                                 m: Int, dim: Int, k: Int, nCand: Int,
                                 corpusIdCol: String): DataFrame = {
    graft.expr.GraftFunctions.register(probes.sparkSession)
    val cand = pqTopK(corpusCodes, probes, probeIdCol, vecCol, codebook,
      m, dim, nCand, corpusIdCol)
      .select(col("probe_id"), col("nbr_id"))
    val c = corpus.select(col(corpusIdCol).as("nbr_id"), col(vecCol).as("__cv"))
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("__d").asc, col("nbr_id").asc)
    c.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("__d", vdot(col("__cv"), col("__cv"))
        - lit(2.0) * vdot(col("__cv"), col("__pv")) + vdot(col("__pv"), col("__pv")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("probe_id"), col("nbr_id"), col("rank").cast("int").as("rank"))
  }

  /** IVF-PQ (IVFADC — Jégou/Douze/Schmid 2011 §IV-A): the canonical
    * billion-scale ANN index, composing the two memory tricks this
    * library already certifies separately: an INVERTED FILE narrows the
    * scan to `nProbe` coarse cells ([[SimilarityOps.ivfTopK]]'s routing),
    * and PRODUCT QUANTIZATION of the RESIDUAL x − c(cell) replaces the
    * vectors in those cells with m-nibble codes. Residuals, not raw
    * vectors: after subtracting the coarse centroid the energy left per
    * subspace is far smaller, so the same codebook budget quantizes much
    * finer (the paper's central observation).
    *
    * Query path: route each probe to its `nProbe` best coarse cells
    * (cosine, the IVF family convention), form the PER-CELL query
    * residual q − c(cell), build that cell's m×k ADC table, and scan
    * ONLY the matching cell's codes with the ordered m-lookup fold of
    * [[pqTopK]]. Ties break to the smaller neighbor id everywhere.
    *
    * Scale shape: coarse centroids and codebooks are model-sized
    * broadcasts; corpus assignment and encoding are map-only passes plus
    * the per-id code-collect; the (probe, cell) ADC tables are
    * probe-bounded and BROADCAST onto the code table's `ccid` equi-join,
    * so the corpus-sized code side never shuffles — at 10^11 vectors the
    * scan touches nProbe/k1 of the codes and none of the raw vectors.
    * Follow with an exact rerank over the returned ids (the
    * [[pqRerankTopK]] discipline) when serving results.
    *
    * @param centroids trained coarse centroids (centroidIdCol, vecCol:
    *        Array[Double]) — [[SimilarityOps.kmeansCentroids]] output
    * @param pqInitIds one id column (named `idCol`) selecting the corpus
    *        rows whose RESIDUALS seed the per-subspace codebooks
    * @return (probe_id, nbr_id, rank) with rank 1..k by ascending ADC
    *         residual distance within the probed cells */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                probeIdCol: String, vecCol: String,
                centroids: DataFrame, centroidIdCol: String,
                pqInitIds: DataFrame, m: Int, dim: Int,
                k: Int = 10, nProbe: Int = 2,
                lloydRounds: Int = 1): DataFrame = {
    require(nProbe >= 1 && k >= 1, s"k/nProbe must be >= 1, got $k/$nProbe")
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    // model-sized frames are CHECKPOINTED once: each is the build input
    // of a broadcast exchange (or several), and a lazy frame re-runs its
    // whole upstream chain inside every broadcast build thread — the
    // probe measured the codebook training executing 3× per call (r16)
    val cent = centroids.select(col(centroidIdCol).as("__ccid"),
        transform(col(vecCol), x => x.cast("double")).as("__ccv"))
      .withColumn("__ccn", sqrt(vdot(col("__ccv"), col("__ccv"))))
      .where(col("__ccn") > 0)
      .localCheckpoint(false)
    // cosine top-n cells (score desc, cid asc — the ivfTopK convention)
    def topCells(df: DataFrame, dfIdCol: String, n: Int): DataFrame = {
      val w = Window.partitionBy("__qid").orderBy(col("__score").desc, col("__ccid").asc)
      df.select(col(dfIdCol).as("__qid"), col(vecCol).as("__qv"))
        .withColumn("__qn", sqrt(vdot(col("__qv"), col("__qv"))))
        .where(col("__qn") > 0)
        .crossJoin(broadcast(cent))
        .withColumn("__score", vdot(col("__qv"), col("__ccv")) / (col("__qn") * col("__ccn")))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
    }
    // corpus → cell + residual; reused by codebook init, train, encode
    val casn = topCells(corpus, idCol, 1)
      .select(col("__qid").as(idCol), col("__ccid").as("ccid"),
        zip_with(col("__qv"), col("__ccv"), (x, y) => x.cast("double") - y).as("__r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = casn.join(broadcast(pqInitIds.select(col(idCol))), Seq(idCol))
    val cb = pqCodebook(casn, idCol, "__r", init, idCol, m, dim, lloydRounds)
    // encode keeping the coarse cell alongside (assign passes it through)
    val subv = subVectors(casn.select(col(idCol), col("ccid"), col("__r")), "__r", m, dim)
    val codes = assign(subv, idCol, cb)
      .groupBy(col(idCol), col("ccid"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("__sc"))
      .select(col(idCol), col("ccid"),
        transform(col("__sc"), p => p.getField("cid")).as("codes"))
    // probes: per probed cell, the QUERY RESIDUAL's m×k ADC table
    val pcells = topCells(probes, probeIdCol, nProbe)
      .select(col("__qid").as("probe_id"), col("__ccid").as("ccid"),
        zip_with(col("__qv"), col("__ccv"), (x, y) => x.cast("double") - y).as("__qr"))
    val psub = subVectors(pcells, "__qr", m, dim)
    val dt = psub.join(broadcast(cb), Seq("sub"))
      .select(col("probe_id"), col("ccid"), col("sub"), col("cid"),
        (vdot(col("sv"), col("sv")) - lit(2.0) * vdot(col("sv"), col("cv"))
          + vdot(col("cv"), col("cv"))).as("d"))
    val dts = dt.groupBy("probe_id", "ccid", "sub")
      .agg(map_from_entries(array_sort(collect_list(struct(col("cid"), col("d"))))).as("__m"))
      .groupBy("probe_id", "ccid")
      .agg(map_from_entries(collect_list(struct(col("sub"), col("__m")))).as("__mm"))
      .select(col("probe_id"), col("ccid"),
        transform(sequence(lit(0), lit(m - 1)), s => element_at(col("__mm"), s)).as("dts"))
      .localCheckpoint(false) // probe-bounded; built once, broadcast below
    // probed cells only: broadcast equi-join on ccid — codes never shuffle
    val cand = codes.join(broadcast(dts), Seq("ccid"))
      .where(col(idCol) =!= col("probe_id"))
      .withColumn("dist", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, s) => acc + element_at(element_at(col("dts"), s + 1),
          element_at(col("codes"), s + 1))))
    val w = Window.partitionBy("probe_id").orderBy(col("dist").asc, col(idCol).asc)
    val res = cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("nbr_id"), col("rank").cast("int").as("rank"))
      .localCheckpoint(true) // probe-bounded; release the residual cache
    casn.unpersist(blocking = false)
    Seq(cent, cb, dts).foreach(graft.functions.GraphOps.releaseLocalCheckpoint)
    res
  }

  /** PARAMETRIC-OPQ dimension allocation (Ge/He/Ke/Sun, CVPR 2013 §4 —
    * "eigenvalue allocation", specialized from a full rotation to a
    * coordinate PERMUTATION): rank dimensions by their corpus signal
    * energy and deal them round-robin across the `m` subspaces, so every
    * codebook quantizes a comparable energy share. Under the contiguous
    * split a decaying spectrum (the shape PCA-rotated real embeddings
    * have) starves the high-variance subspace of codewords and wastes
    * the low-variance ones; balancing the allocation is the OPQ paper's
    * free-rotation win restricted to the permutation subgroup — no
    * rotation matrix to train or apply, and a permutation preserves
    * dot products and norms, so downstream exact reranks are unchanged.
    *
    * Determinism: per-element micro quantization then exact
    * DECIMAL(38,0) sums of q² — the per-dimension energies are exact
    * integers, ties break toward the smaller dimension, so the
    * permutation is engine-reproducible (the q283 oracle replays it).
    *
    * Scale shape: one map-only posexplode + a `dim`-group integer sum;
    * the collect is `dim` rows (model-sized, the codebook convention).
    *
    * @return perm where perm(p) = SOURCE dim at target position p;
    *         subspace s occupies positions [s·dim/m, (s+1)·dim/m). */
  def opqBalancedPermutation(corpus: DataFrame, vecCol: String,
                             m: Int, dim: Int): Seq[Int] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val sd = dim / m
    val ranked = corpus
      .select(posexplode(transform(col(vecCol), x => x.cast("double"))).as(Seq("i", "x")))
      .select(col("i"), round(col("x") * lit(1000000L)).cast("long").as("q"))
      .groupBy("i")
      .agg(sum((col("q") * col("q")).cast("decimal(38,0)")).as("e"))
      .select(col("i"),
        (row_number().over(Window.orderBy(col("e").desc, col("i").asc)) - 1).as("r"))
      .collect().map(row => (row.getAs[Int]("i"), row.getAs[Int]("r")))
    require(ranked.length == dim, s"corpus vectors are not $dim-dim")
    val perm = Array.ofDim[Int](dim)
    ranked.foreach { case (i, r) => perm((r % m) * sd + r / m) = i }
    perm.toSeq
  }

  /** Apply a dimension permutation to a vector column: output position p
    * takes source element perm(p). The permutation is a literal
    * (model-sized), so this is a map-only, codegen'd projection — the
    * "rotation" half of parametric OPQ costs one pass, no join. */
  def permuteVec(df: DataFrame, vecCol: String, perm: Seq[Int]): DataFrame =
    df.withColumn(vecCol, array(perm.map(i => col(vecCol).getItem(i)): _*))
}
