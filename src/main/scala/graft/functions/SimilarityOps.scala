package graft.functions

import graft.expr.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Scale design: the brute-force path broadcasts the (small) probe set and
  * streams the corpus once — a map-only scan, no shuffle of the corpus.
  * The LSH path buckets corpus + probes by sign-random-projection bits so
  * each probe only scores one bucket (multi-probe widens recall).
  * All projections derive from xxhash64 so they're deterministic without a
  * shared random state.
  *
  * Scoring uses the native [[graft.expr.VecDot]] expression with
  * per-vector norms computed ONCE per row (not per pair): the per-pair
  * kernel is a single primitive dot-product loop.
  *
  * Literature: sign-random-projection LSH for cosine is Charikar (STOC
  * 2002); the inverted-file (IVF) coarse-quantizer search layout follows
  * Jégou/Douze/Schmid, "Product quantization for nearest neighbor
  * search" (TPAMI 2011) — here with the coarse cells only, no residual
  * quantization, since exact scoring within cells is cheap on Spark.
  *
  * Cache ownership: the incremental path ([[semanticDedupIncrement]])
  * eager-checkpoints its bounded outputs and releases its caches before
  * returning. The batch operators return LAZY corpus-scale frames that
  * still read from their internal MEMORY_AND_DISK persists — the CALLER
  * owns those lifetimes; drop them via
  * `spark.sharedState.cacheManager.clearCache()` (or unpersist after
  * materializing downstream) once results are consumed.
  */
object SimilarityOps {

  /** Sequential dot product over two array columns (deterministic fold
    * order — stable across engines and partitionings). Lambda formulation;
    * the DataFrame-level operators below use the native `vec_dot`. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  private def vdot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  private def vnorm(a: Column): Column = sqrt(call_function("vec_dot", a, a))

  /** Brute-force top-k cosine neighbors for each probe vector.
    *
    * `corpus`: (idCol, vecCol); `probes`: (probeIdCol, vecCol). The probe
    * side is broadcast — at 100 TB the corpus never shuffles; the only
    * exchange is the final per-probe top-k (tiny). Self-matches (same id)
    * are excluded when the id columns share a name.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame,
                     idCol: String, probeIdCol: String, vecCol: String,
                     k: Int = 10): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // zero-norm vectors (failed decodes, padding rows) have undefined
    // cosine — unfiltered they'd score NaN, which sorts FIRST under desc
    // order and displaces a real neighbor from every probe's top-k
    val c = fanOutSmall(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0))
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    val cand = c.crossJoin(broadcast(p))
    // self-match exclusion only makes sense when both sides share an id
    // space (same id column); distinct id spaces may legitimately collide
    val filtered = if (idCol == probeIdCol) cand.where(col("nbr_id") =!= col("probe_id")) else cand
    val scored = filtered
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** HARD-NEGATIVE MINING for contrastive / retrieval training data
    * (the BM25-or-ANN negatives pass of DPR — Karpukhin et al., EMNLP
    * 2020 §3.2): for each probe, the top-k most-similar corpus vectors
    * whose `classCol` DIFFERS from the probe's — maximally confusable
    * non-matches, the negatives that actually move a contrastive loss.
    * Same-class rows (the positives) are excluded by definition; the
    * self-row is excluded with them.
    *
    * Scale shape: identical to [[bruteForceTopK]] — probes broadcast,
    * corpus scanned map-only, per-pair kernel one native dot; the class
    * filter prunes BEFORE scoring. At 100 TB compose with an ANN
    * prefilter ([[ivfTopK]] with k ≫ target, then this class filter +
    * re-rank) so the scan touches probed cells only; the brute path
    * here is the exact-oracle baseline and the small-probe-set tool.
    *
    * @return (probe_id, nbr_id, nbr_class, score, rank ≤ k) */
  def hardNegatives(corpus: DataFrame, probes: DataFrame,
                    idCol: String, probeIdCol: String, vecCol: String,
                    classCol: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val c = fanOutSmall(corpus.select(col(idCol).as("nbr_id"), col(classCol).as("nbr_class"),
      col(vecCol).as("__cv"), vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0))
    val p = probes.select(col(probeIdCol).as("probe_id"), col(classCol).as("probe_class"),
      col(vecCol).as("__pv"), vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    val scored = c.crossJoin(broadcast(p))
      .where(col("nbr_class") =!= col("probe_class"))
      .select(col("probe_id"), col("nbr_id"), col("nbr_class"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** ColBERT-style LATE-INTERACTION (MaxSim) document scoring — Khattab &
    * Zaharia, SIGIR 2020 §3: documents and queries are BAGS of token
    * vectors, and score(q, d) = Σ_{t∈q} max_{u∈d} cos(t, u) — each query
    * token independently finds its best-matching document token, so the
    * model rewards per-term semantic coverage instead of one pooled
    * vector's average direction.
    *
    * `corpusTokens`: (docCol, vecCol) — MANY rows per document, one per
    * token vector. `probeTokens`: (probeCol, probeTokCol, vecCol) — the
    * token identity column is required because the outer sum is per
    * query token (two equal token vectors must contribute twice).
    *
    * Scale shape: the probe side (queries × tokens) broadcasts; the
    * corpus token table is scanned ONCE map-only. The max-per-(probe,
    * token, doc) aggregate partial-aggregates map-side down to candidate
    * cardinality before its exchange, and the outer sum is per-(probe,
    * doc) — both shuffles are result-sized, never corpus-sized. At 100 TB
    * swap the scan for the candidate-pruned [[maxSimTopKPruned]] (token-
    * level ANN → candidate docs → exact rerank — the PLAID serving
    * shape, Santhanam et al., CIKM 2022).
    *
    * Determinism: per-token maxima are exact comparisons of bit-identical
    * cosines (native `vec_dot` fold); each max is rounded to integer
    * MICRO units BEFORE the outer sum, so the score is an integer sum —
    * associative, engine-portable (the q114 "ordered folds" convention).
    *
    * @return (probe_id, doc_id, score_micro, rank ≤ k) */
  /** Fan a SMALL pre-explosion frame out to the session's parallelism
    * before a broadcast cross join multiplies it: AQE sizes shuffle
    * coalescing on the frame's own bytes, so a corpus-token table that
    * arrives as 1–2 post-distinct partitions would explode ×|probe
    * tokens| inside ONE task (q275 measured 10 s in a single straggler
    * task at sf0.1 — guide §2.6 idle capacity). A frame already at ≥
    * parallelism partitions (a real corpus scan at scale) passes through
    * untouched — this never adds a corpus-sized shuffle, it only undoes
    * pre-explosion over-coalescing. Round-robin repartition is
    * deterministic under Spark's sort-before-repartition, and every
    * downstream aggregate/window is keyed, so results are unchanged. */
  private[functions] def fanOutSmall(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else df.repartition(p)
  }

  /** Keyed [[fanOutSmall]] for EQUI-join explosions (intra-cell pair
    * scans): the pair join's per-key output is quadratic in cell
    * occupancy, but AQE coalesces the join's shuffles on their (small)
    * INPUT bytes — the whole pair scan then runs in 1-2 tasks. Hash
    * repartitioning by the join key at the session parallelism keeps the
    * scan parallel AND lets both self-join sides reuse the one exchange.
    * Same ≥-parallelism pass-through guard as [[fanOutSmall]]. */
  private[functions] def fanOutSmallBy(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else df.repartition(p, keys: _*)
  }

  def maxSimTopK(corpusTokens: DataFrame, probeTokens: DataFrame,
                 docCol: String, probeCol: String, probeTokCol: String,
                 vecCol: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(corpusTokens.sparkSession)
    val c = fanOutSmall(corpusTokens.select(col(docCol).as("doc_id"),
      col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0))
    val p = probeTokens.select(col(probeCol).as("probe_id"),
      col(probeTokCol).as("__tok"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    rankMaxSim(c.crossJoin(broadcast(p))
      .select(col("probe_id"), col("__tok"), col("doc_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("__cos")),
      k)
  }

  /** Shared MaxSim scoring tail: per-(probe, token, doc) max over the
    * scored pairs, rounded to integer MICRO units BEFORE the per-doc sum
    * (associative, engine-portable), per-probe rank. The single home of
    * the score law — [[maxSimTopK]] and [[maxSimRerank]] differ only in
    * how the scored-pair frame is produced. */
  private def rankMaxSim(scoredPairs: DataFrame, k: Int): DataFrame = {
    val scored = scoredPairs
      .groupBy("probe_id", "__tok", "doc_id")
      .agg(max(col("__cos")).as("__ms"))
      .select(col("probe_id"), col("doc_id"),
        round(col("__ms") * 1e6).cast("long").as("__msm"))
      .groupBy("probe_id", "doc_id")
      .agg(sum("__msm").as("score_micro"))
    val w = Window.partitionBy("probe_id").orderBy(col("score_micro").desc,
      col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** CANDIDATE-PRUNED MaxSim — the PLAID serving decomposition
    * (Santhanam et al., CIKM 2022 §3): stage 1 finds each query token's
    * top-`m` corpus TOKENS (token-level ANN; here the exact scorer so
    * the gate isolates the pruning loss — at scale route it through
    * [[ivfSearchStore]] exactly like any single-vector probe), stage 2
    * takes the DOCUMENTS owning those tokens as the candidate set, and
    * stage 3 reruns the exact MaxSim of [[maxSimTopK]] on candidate
    * documents ONLY. Recall loss is confined to documents none of whose
    * tokens reach any query token's top-m — the tail MaxSim itself
    * scores lowest.
    *
    * Scale shape: stage 1 is the broadcast map-only scan; stage 2's
    * candidate set is (probes × m)-bounded; stage 3 re-expands ONLY
    * candidate documents' tokens (one doc-keyed equi-join) — the full
    * corpus is never rescored. `corpusTokCol` must uniquely key corpus
    * token rows (it seeds stage 1's deterministic tie-break).
    *
    * @return (probe_id, doc_id, score_micro, rank ≤ k) over candidates */
  def maxSimTopKPruned(corpusTokens: DataFrame, probeTokens: DataFrame,
                       docCol: String, corpusTokCol: String,
                       probeCol: String, probeTokCol: String,
                       vecCol: String, k: Int = 10, m: Int = 8): DataFrame = {
    GraftFunctions.register(corpusTokens.sparkSession)
    val c = fanOutSmall(corpusTokens.select(col(docCol).as("doc_id"),
      col(corpusTokCol).as("__ct"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0))
    val p = probeTokens.select(col(probeCol).as("probe_id"),
      col(probeTokCol).as("__tok"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    val wt = Window.partitionBy("probe_id", "__tok")
      .orderBy(col("__cos").desc, col("__ct").asc)
    val cand = c.crossJoin(broadcast(p))
      .select(col("probe_id"), col("__tok"), col("doc_id"), col("__ct"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("__cos"))
      .withColumn("__rn", row_number().over(wt))
      .where(col("__rn") <= m)
      .select("probe_id", "doc_id").distinct()
    maxSimRerank(corpusTokens, probeTokens, cand, docCol, probeCol,
      probeTokCol, vecCol, k)
  }

  /** Exact MaxSim RERANK over a given candidate list — the PLAID stage 3
    * as a first-class operator: `candidates` is (probe_id, doc_id) from
    * any candidate generator (the exact token top-m of
    * [[maxSimTopKPruned]], a store-served token ANN like
    * [[ivfSearchStore]], a recall-first sparse retriever). Only the
    * candidate documents' tokens are re-expanded (one doc-keyed
    * equi-join) and scored against the broadcast query tokens; ranks are
    * per probe over its own candidates. Same integer-micro score law as
    * [[maxSimTopK]].
    *
    * @return (probe_id, doc_id, score_micro, rank ≤ k) over candidates */
  def maxSimRerank(corpusTokens: DataFrame, probeTokens: DataFrame,
                   candidates: DataFrame, docCol: String, probeCol: String,
                   probeTokCol: String, vecCol: String,
                   k: Int = 10): DataFrame = {
    GraftFunctions.register(corpusTokens.sparkSession)
    val c = corpusTokens.select(col(docCol).as("doc_id"),
      col(vecCol).as("__cv"), vnorm(col(vecCol)).as("__cn"))
      .where(col("__cn") > 0)
    val p = probeTokens.select(col(probeCol).as("probe_id"),
      col(probeTokCol).as("__tok"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    rankMaxSim(candidates.select(col("probe_id"), col("doc_id"))
      .join(c, Seq("doc_id"))
      .join(broadcast(p), Seq("probe_id"))
      .select(col("probe_id"), col("__tok"), col("doc_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("__cos")),
      k)
  }

  /** Sign-random-projection bits. Hyperplane weights are md5-derived
    * integers in [-1000, 1000] (`hash60("plane,dim") mod 2001 - 1000`) and
    * the vector is quantized to `round(v·1000)` longs, so the projection is
    * exact integer arithmetic — the sign bit is bit-deterministic on every
    * engine (no float-summation-order hazard), which makes LSH bucket
    * assignments verifiable against an independent SQL engine. */
  def srpBits(vec: Column, nBits: Int = 16): Column =
    transform(sequence(lit(0), lit(nBits - 1), lit(1)), plane => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1, lit(1)), (v, d) =>
          round(v.cast("double") * 1000).cast("long") *
            (pmod(DedupOps.hash60(concat_ws(",", plane, d)), lit(2001L)) - 1000L)),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })

  /** Johnson-Lindenstrauss random projection to `outDims` integer
    * coordinates — the full-value sibling of [[srpBits]] (which keeps only
    * the sign): same md5-derived integer hyperplanes in [-1000, 1000],
    * same `round(v·1000)` input quantization, so every output coordinate
    * is EXACT INTEGER arithmetic — bit-reproducible on any engine, no
    * float-summation-order hazard, no scaling factor (cosine is
    * scale-invariant, so the JL estimate needs none). Training-data use:
    * 64-float embeddings → `outDims` longs before a brute-force or
    * banded pass — an 8× narrower scan payload whose pairwise angles
    * concentrate around the originals (JL lemma; distortion ~1/√outDims).
    * Map-only; the hyperplane table is constant-folded into the codegen.
    */
  def randomProjection(vec: Column, outDims: Int): Column =
    transform(sequence(lit(0), lit(outDims - 1), lit(1)), j =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1, lit(1)), (v, d) =>
          round(v.cast("double") * 1000).cast("long") *
            (pmod(DedupOps.hash60(concat_ws(",", lit("rp"), j, d)), lit(2001L)) - 1000L)),
        lit(0L), (acc, x) => acc + x))

  /** Bucket key from SRP bits — the native [[graft.expr.SrpBucket]]
    * kernel (precomputed weight table + primitive loops; identical math to
    * `aggregate(srpBits(vec, n), 0L, _ * 2 + _)`). */
  def srpBucket(vec: Column, nBits: Int = 16): Column =
    call_function("srp_bucket", vec, lit(nBits))

  /** LSH-bucketed ANN: corpus and probes hashed into SRP buckets; each
    * probe scores only its bucket (plus `probeFlips` single-bit-flipped
    * neighbor buckets for recall). Shuffles on the bucket key only.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame,
              idCol: String, probeIdCol: String, vecCol: String,
              k: Int = 10, nBits: Int = 8, probeFlips: Int = 4): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn"), srpBucket(col(vecCol), nBits).as("bucket"))
      .where(col("__cn") > 0) // zero-norm → NaN cosine, see bruteForceTopK
    val pBase = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn"), srpBucket(col(vecCol), nBits).as("bucket0"))
      .where(col("__pn") > 0)
    // multi-probe: the home bucket + single-bit flips
    val buckets = array((0 to math.min(probeFlips, nBits)).map {
      case 0 => col("bucket0")
      case i => col("bucket0").bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val p = pBase.select(col("probe_id"), col("__pv"), col("__pn"), explode(buckets).as("bucket"))
    val cand0 = c.join(p, Seq("bucket"))
    val scored = (if (idCol == probeIdCol) cand0.where(col("nbr_id") =!= col("probe_id")) else cand0)
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
      .groupBy("probe_id", "nbr_id").agg(max("score").as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * centroid cell once; each probe searches only its `nProbe` nearest
    * cells. The scale path for corpus sizes where even LSH bucketing is too
    * coarse. Cell assignment costs one |corpus|-row exchange: the centroid
    * cross product is broadcast and Spark's WindowGroupLimit pre-reduces
    * it to one row per corpus vector map-side BEFORE the shuffle (verified
    * in PLANS.md — the exchange never carries |corpus|×|centroids| rows);
    * the candidate join then shuffles on the cell id only. Deterministic
    * given a deterministic centroid set (e.g. a hash-sampled subset — no
    * k-means state needed for a fixed snapshot).
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
              idCol: String, probeIdCol: String, centroidIdCol: String, vecCol: String,
              k: Int = 10, nProbe: Int = 2): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cent = centroids.select(col(centroidIdCol).as("cid"), col(vecCol).as("__cenv"),
      vnorm(col(vecCol)).as("__cenn")).where(col("__cenn") > 0)
    def nearestCells(df: DataFrame, id: String, n: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("__cscore").desc, col("cid").asc)
      df.where(col("__n") > 0) // zero-norm → NaN cosine, see bruteForceTopK
        .crossJoin(broadcast(cent))
        .withColumn("__cscore", vdot(col("__v"), col("__cenv")) / (col("__n") * col("__cenn")))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
        .select(col(id), col("__v"), col("__n"), col("cid"))
    }
    val asn = nearestCells(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__v"), vnorm(col(vecCol)).as("__n")),
      "nbr_id", 1)
      .withColumnRenamed("__v", "__cv").withColumnRenamed("__n", "__cn")
    val pcells = nearestCells(
      probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__v"), vnorm(col(vecCol)).as("__n")),
      "probe_id", nProbe)
      .withColumnRenamed("__v", "__pv").withColumnRenamed("__n", "__pn")
    val cand0 = asn.join(pcells, Seq("cid"))
    val scored = (if (idCol == probeIdCol) cand0.where(col("nbr_id") =!= col("probe_id")) else cand0)
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** [[ivfTopK]] with nProbe derived as a constant FRACTION of the cell
    * count — the deployment rule the q148/BASELINE recall measurements
    * demand: a FIXED nProbe probes an ever-smaller fraction as the
    * index grows with the corpus, so recall silently FALLS with scale
    * on corpora without cluster structure (measured: nProbe=2 mean
    * recall@10 620→380 milli from 500 to 5000 vectors). Probing
    * `max(minProbe, ceil(probeFraction·nCells))` pins the searched
    * fraction — latency scales with the index, recall does not decay
    * by construction. The cell count is a model-sized planning scalar
    * (the bloom-filter role), folded into the plan as a literal.
    */
  def ivfTopKFraction(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
                      idCol: String, probeIdCol: String, centroidIdCol: String,
                      vecCol: String, k: Int = 10,
                      probeFraction: Double = 0.25, minProbe: Int = 2): DataFrame = {
    require(probeFraction > 0 && probeFraction <= 1,
      s"probeFraction in (0,1], got $probeFraction")
    require(minProbe >= 1, s"minProbe must be >= 1, got $minProbe")
    GraftFunctions.register(corpus.sparkSession)
    val nCells = centroids
      .select(col(centroidIdCol), vnorm(col(vecCol)).as("__n"))
      .where(col("__n") > 0).count()
    val np = math.max(minProbe, math.ceil(probeFraction * nCells).toInt)
    ivfTopK(corpus, probes, centroids, idCol, probeIdCol, centroidIdCol,
      vecCol, k, nProbe = np)
  }

  /** ALL-kNN GRAPH construction: every corpus vector's approximate top-k
    * cosine neighbors via the trained inverted file — the input to
    * graph-based semantic analysis (kNN-graph clustering, mutual-kNN
    * near-dup components, NN-descent seeding). Probes ARE the corpus, so
    * the cost is Σ_cells |cell|·(probed vectors touching that cell) —
    * with cells ∝ corpus (the `% 40` init convention) and a small FIXED
    * probe count, per-node work is O(k̄·nProbe·avg cell size) — LINEAR in
    * n, never the n² all-pairs scan (which is exactly the baseline the
    * q173 gate's recall histogram is measured against).
    *
    * The low-probe configuration trades recall for that linearity — on
    * an isotropic corpus mean recall@10 is ~37% at nProbe=2 of 13 cells
    * (the q148 finding in graph form); clustered corpora do far better.
    * The gate certifies the MEASUREMENT — callers pick probeFraction per
    * corpus from the histogram this emits, exactly like [[ivfTopKFraction]].
    *
    * SCALE PATH: do NOT raise probeFraction to buy recall — with cells ∝
    * corpus, fraction-probing's candidate work is O(f·n²) once the
    * fraction term beats minProbe. Seed at a small FIXED probe count and
    * refine with [[nnDescent]] instead: recall then comes from O(n·k²)
    * iterations (q177 measures one round lifting mean recall@10 from
    * 367 to 673 milli at the same seed), never from widening the probe.
    *
    * @return (probe_id, nbr_id, score, rank) edges, rank ≤ k per node */
  /** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein 1998):
    * greedily pick k results that are relevant to the query but
    * DISSIMILAR to what's already picked —
    * argmax_d λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the standard
    * diversification layer over any ANN pool (dedup'd retrieval,
    * diverse few-shot example selection, coreset sampling for labeling).
    *
    * Engine-portable greed: relevance and pairwise similarity quantize
    * to MICRO units (⌊10⁶·cos⌋ — [[graft.expr.VDot]]'s in-order double
    * fold is bit-identical to the unrolled SQL form), the step score is
    * the INTEGER λ_micro·rel − (10⁶−λ_micro)·maxsim, and ties break by
    * id — so the whole selection sequence is reproducible anywhere.
    *
    * Scale shape: ONE [[bruteForceTopK]] pass pools `poolSize`
    * candidates per probe (corpus map-only, probes broadcast); the
    * pool's pairwise sims are a per-probe poolSize² self-join of
    * MODEL-sized frames; then k − 1 greedy steps, each ONE window over
    * the pool — work is probes · poolSize² · k, independent of corpus
    * size after the pooling pass. Probes batch: every step advances ALL
    * probes at once (k sequential plan steps total, not k per probe).
    *
    * @param lambdaMicro λ in micro units (700000 = 0.7 relevance weight)
    * @return (probe_id, step, nbr_id, rel_micro): the selection
    *         sequence, step 1..k per probe */
  def mmrTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              probeIdCol: String, vecCol: String, k: Int = 5,
              poolSize: Int = 20, lambdaMicro: Long = 700000L): DataFrame = {
    require(k >= 1 && poolSize >= k && lambdaMicro >= 0 && lambdaMicro <= 1000000L,
      s"need 1 <= k <= poolSize and lambdaMicro in [0, 1e6], got $k/$poolSize/$lambdaMicro")
    val pool = bruteForceTopK(corpus, probes, idCol, probeIdCol, vecCol, poolSize)
      .withColumn("rel_micro", floor(col("score") * lit(1e6)).cast("long"))
      .select("probe_id", "nbr_id", "rel_micro")
      .localCheckpoint(false)
    val vecs = corpus.select(col(idCol).as("__vid"), col(vecCol).as("__v"),
      vnorm(col(vecCol)).as("__n")).where(col("__n") > 0)
    val pv = pool.join(vecs, pool("nbr_id") === vecs("__vid"))
      .select(col("probe_id"), col("nbr_id"), col("rel_micro"),
        col("__v"), col("__n"))
    val sims = pv.alias("a")
      .join(pv.alias("b"), col("a.probe_id") === col("b.probe_id")
        && col("a.nbr_id") =!= col("b.nbr_id"))
      .select(col("a.probe_id").as("probe_id"), col("a.nbr_id").as("cand"),
        col("b.nbr_id").as("sel"),
        floor(vdot(col("a.__v"), col("b.__v")) / (col("a.__n") * col("b.__n"))
          * lit(1e6)).cast("long").as("sim_micro"))
      .localCheckpoint(false)
    val wSel = Window.partitionBy("probe_id")
      .orderBy(col("__mmr").desc, col("nbr_id").asc)
    val inter = scala.collection.mutable.Buffer[DataFrame](pool, sims)
    var selected = pool
      .withColumn("__mmr", col("rel_micro") * lit(lambdaMicro))
      .withColumn("__rn", row_number().over(wSel)).where(col("__rn") === 1)
      .select(col("probe_id"), lit(1).as("step"), col("nbr_id"), col("rel_micro"))
      .localCheckpoint(false)
    inter += selected
    for (i <- 2 to k) {
      val maxSim = sims
        .join(selected.select(col("probe_id"), col("nbr_id").as("sel")),
          Seq("probe_id", "sel"))
        .groupBy("probe_id", "cand").agg(max("sim_micro").as("__ms"))
      val next = pool
        .join(selected.select(col("probe_id"), col("nbr_id")),
          Seq("probe_id", "nbr_id"), "left_anti")
        .join(maxSim, pool("probe_id") === maxSim("probe_id")
          && pool("nbr_id") === maxSim("cand"))
        .select(pool("probe_id"), col("nbr_id"), col("rel_micro"),
          (col("rel_micro") * lit(lambdaMicro)
            - col("__ms") * lit(1000000L - lambdaMicro)).as("__mmr"))
        .withColumn("__rn", row_number().over(wSel)).where(col("__rn") === 1)
        .select(col("probe_id"), lit(i).as("step"), col("nbr_id"), col("rel_micro"))
      selected = selected.union(next).localCheckpoint(false)
      inter += selected
    }
    val out = selected.localCheckpoint(true)
    inter.foreach(GraphOps.releaseLocalCheckpoint)
    out
  }

  /** Sign bits of a float vector packed into ⌈dim/32⌉ NONNEGATIVE
    * 32-bit words (bit i of word w = coord 32w+i > 0) — BIGINT-safe in
    * any engine, no two's-complement pitfalls. One aggregate over the
    * dim sequence per word; pure built-ins, codegen'd. */
  def bqWords(vec: Column, dim: Int): Seq[Column] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    (0 until (dim + 31) / 32).map { w =>
      val hi = math.min((w + 1) * 32, dim) - 1
      aggregate(sequence(lit(w * 32), lit(hi)), lit(0L), (acc, i) =>
        acc + when(element_at(vec, (i + 1).cast("int")) > 0,
          call_function("shiftleft", lit(1L), (i - lit(w * 32)).cast("int")))
          .otherwise(lit(0L)))
    }
  }

  /** BINARY-QUANTIZATION ANN (1 bit/dim; Charikar 2002's sign-hash as a
    * memory tier): Hamming prefilter over packed sign words → exact
    * cosine rerank of the C survivors. The cheapest quantization rung
    * below [[sq8TopK]] (8 bit) and [[graft.functions.PqOps.pqTopK]]
    * (~1 byte/subspace): 64 dims become TWO xor+popcount words — a 16×
    * memory cut and no codebook to train, at the recall cost the spec
    * measures honestly (sign bits ignore magnitude entirely).
    *
    * Scale shape: the corpus scan computes 2 longs per row map-side
    * (probes broadcast); the per-probe top-C window carries only
    * (probe, nbr, hamming) integers; the exact rerank re-joins C·probes
    * ids against the corpus on the 8-byte key — vectors never ride the
    * shuffle. Deterministic: Hamming ties at the C boundary and cosine
    * rank ties both break by id.
    *
    * @param candSize C survivors reranked exactly per probe (≥ k)
    * @return (probe_id, nbr_id, hamming, rank), rank 1..k by exact cosine */
  def bqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
             probeIdCol: String, vecCol: String, dim: Int,
             k: Int = 10, candSize: Int = 50): DataFrame = {
    require(candSize >= k && k >= 1, s"need candSize >= k >= 1, got $candSize/$k")
    GraftFunctions.register(corpus.sparkSession)
    val words = bqWords(col(vecCol), dim)
    val c = fanOutSmall(corpus.select(col(idCol).as("nbr_id") +:
      vnorm(col(vecCol)).as("__cn") +:
      words.zipWithIndex.map { case (w, i) => w.as(s"__cw$i") }: _*)
      .where(col("__cn") > 0))
    val p = probes.select(col(probeIdCol).as("probe_id") +:
      col(vecCol).as("__pv") +: vnorm(col(vecCol)).as("__pn") +:
      words.zipWithIndex.map { case (w, i) => w.as(s"__pw$i") }: _*)
      .where(col("__pn") > 0)
    val joined = c.crossJoin(broadcast(p))
    val both = if (idCol == probeIdCol)
      joined.where(col("nbr_id") =!= col("probe_id")) else joined
    val ham = words.indices.map(i =>
        call_function("bit_count", col(s"__cw$i").bitwiseXOR(col(s"__pw$i"))))
      .reduce(_ + _).cast("long")
    val wH = Window.partitionBy("probe_id")
      .orderBy(col("hamming").asc, col("nbr_id").asc)
    val cands = both.withColumn("hamming", ham)
      .select("probe_id", "nbr_id", "hamming")
      .withColumn("__hrn", row_number().over(wH)).where(col("__hrn") <= candSize)
    val vecs = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0)
    val pvecs = probes.select(col(probeIdCol).as("probe_id"),
      col(vecCol).as("__pv"), vnorm(col(vecCol)).as("__pn"))
      .where(col("__pn") > 0)
    val wS = Window.partitionBy("probe_id")
      .orderBy(col("__score").desc, col("nbr_id").asc)
    cands.join(vecs, Seq("nbr_id")).join(broadcast(pvecs), Seq("probe_id"))
      .withColumn("__score",
        vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn")))
      .withColumn("rank", row_number().over(wS)).where(col("rank") <= k)
      .select("probe_id", "nbr_id", "hamming", "rank")
  }

  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, centroidIdCol: String, k: Int = 10,
               probeFraction: Double = 0.02, minProbe: Int = 2): DataFrame =
    ivfTopKFraction(corpus, corpus, centroids, idCol, idCol, centroidIdCol,
      vecCol, k, probeFraction, minProbe)

  /** SAME-CELL top-k seed graph from an EXPLICIT cell assignment — the
    * [[knnGraph]] seed for deployments whose inverted-file layout is a
    * BALANCED, corpus-proportional partition (constant cell occupancy —
    * hash buckets, a reindexed quantizer) rather than a fixed centroid
    * set: with occupancy bounded, the same-cell candidate join is
    * O(n · occupancy) — linear at scale where a fixed-cell-count
    * assignment degrades to n²/cells. Scoring is the standard law (raw
    * cosine desc, id tie-break); feed the result to [[nnDescent]] for
    * recall, exactly as with the centroid seed.
    *
    * @param cells (idCol, "cid") — one assignment row per corpus id
    * @return (probe_id, nbr_id, score, rank ≤ k) directed seed edges */
  def cellSeedGraph(corpus: DataFrame, cells: DataFrame, idCol: String,
                    vecCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    GraftFunctions.register(corpus.sparkSession)
    val v = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        vnorm(col(vecCol)).as("__n"))
      .where(col("__n") > 0)
      .join(cells.select(col(idCol).as("__id"), col("cid")), Seq("__id"))
    val a = v.select(col("cid"), col("__id").as("probe_id"),
      col("__v").as("__pv"), col("__n").as("__pn"))
    val b = v.select(col("cid"), col("__id").as("nbr_id"),
      col("__v").as("__cv"), col("__n").as("__cn"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("nbr_id").asc)
    a.join(b, Seq("cid")).where(col("probe_id") =!= col("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** NN-DESCENT refinement of a kNN graph (Dong, Moses & Li, WWW 2011):
    * iterate "a neighbor of my neighbor is probably my neighbor" — per
    * round, every node's (undirected) neighborhood proposes all its
    * internal pairs as candidate edges, each candidate pair is cosine-
    * scored ONCE, and every node keeps the top-k of (current ∪ proposed)
    * neighbors. Seeded by [[knnGraph]] at a small FIXED probe count,
    * this is the linear-at-scale all-kNN construction path: recall comes
    * from the ITERATIONS, not from probing more index cells — per round
    * the candidate volume is Σ_v deg(v)² ≤ n·(2k)² (out-degree k, plus
    * reverse edges whose per-node count the same top-k bound caps in
    * expectation), i.e. O(n·k²) TOTAL work per iteration with k a
    * constant — against the O(f·n²) regime fraction-probing enters when
    * cells scale with the corpus (the q173 finding this operator fixes).
    *
    * Shapes: candidate generation is one self-join of the undirected
    * edge list on the shared-neighbor key (shuffle keyed by node id,
    * skew ceiling 2k·maxdeg), dedup before scoring (a pair proposed by
    * many common neighbors is scored once), scoring joins the vector
    * table twice on the 8-byte id, and the merge is one per-node top-k
    * window with WindowGroupLimit map-side pre-reduction. Ranking
    * quantizes the score to 6 decimals with an id tie-break (the
    * [[contrastiveTriplets]] rationale — raw-double order among
    * near-identical candidates is FP-summation noise; the seed graph's
    * own edges re-score identically on re-derivation, so quantized
    * rank order is engine-stable). Per-round results are eagerly
    * checkpointed (constant lineage; rounds are data-dependent chains).
    *
    * @param corpus (idCol, vecCol) — the vectors (zero-norm rows are
    *               excluded, as in every cosine operator here)
    * @param seed   (probe_id, nbr_id) directed kNN edges ([[knnGraph]]
    *               output; extra columns ignored)
    * @param k      neighbors kept per node after each merge
    * @param iters  refinement rounds (≥ 1; 1–2 suffice in practice at
    *               moderate k — Dong et al. report diminishing updates)
    * @return (probe_id, nbr_id, score, rank) edges, rank ≤ k per node
    */
  def nnDescent(corpus: DataFrame, idCol: String, vecCol: String,
                seed: DataFrame, k: Int = 10, iters: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    GraftFunctions.register(corpus.sparkSession)
    val v = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        vnorm(col(vecCol)).as("__n")).where(col("__n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def scored(pairs: DataFrame): DataFrame = pairs
      .join(v.select(col("__id").as("probe_id"), col("__v").as("__pv"),
        col("__n").as("__pn")), Seq("probe_id"))
      .join(v.select(col("__id").as("nbr_id"), col("__v").as("__cv"),
        col("__n").as("__cn")), Seq("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    var graph = seed.select(col("probe_id"), col("nbr_id")).localCheckpoint(false)
    var ranked: DataFrame = null
    val wTop = Window.partitionBy("probe_id")
      .orderBy(round(col("score"), 6).desc, col("nbr_id").asc)
    for (_ <- 1 to iters) {
      val und = graph.select(col("probe_id").as("c"), col("nbr_id").as("m"))
        .unionByName(graph.select(col("nbr_id").as("c"), col("probe_id").as("m")))
        .distinct()
      val prop = und.join(und.withColumnRenamed("m", "m2"), Seq("c"))
        .where(col("m") =!= col("m2"))
        .select(col("m").as("probe_id"), col("m2").as("nbr_id"))
      val cand = graph.unionByName(prop).distinct()
      ranked = scored(cand)
        .withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
        .localCheckpoint(true) // data-dependent chain: constant lineage
      graph = ranked.select(col("probe_id"), col("nbr_id"))
    }
    v.unpersist(blocking = false)
    ranked
  }

  /** LIVE VIEW of a persisted kNN-graph store — node-REPLACEMENT
    * semantics: an absorb appends a changed node's FULL new top-k at the
    * next epoch, so the live graph is each node's latest-epoch edge set
    * (the [[graft.functions.GraphOps.liveLabels]] merge-on-read
    * discipline, per node instead of per label). One window over the
    * probe-bucketed store — no self-join, no Exchange on the store. */
  def liveKnnGraph(store: DataFrame): DataFrame = {
    val w = Window.partitionBy("probe_id")
    store.withColumn("__mx", max(col("epoch")).over(w))
      .where(col("epoch") === col("__mx")).drop("__mx")
  }

  /** INCREMENTAL kNN-graph maintenance — absorb a batch of NEW vectors
    * into a persisted [[nnDescent]] graph without rebuilding it (the
    * round-12 verdict's missing store lifecycle — every other state
    * family here has build→absorb→compact legs; the graph had to be
    * re-derived from scratch per increment):
    *
    *  1. SEED — new nodes propose edges to their IVF cellmates (both
    *     directions: the new node needs neighbors, and existing
    *     cellmates may need the new node), using the frozen coarse cells
    *     the vector store already maintains ([[ivfStore]]'s cid layout —
    *     `cells` is that assignment, read not recomputed);
    *  2. PROPAGATE — one NN-descent proposal round RESTRICTED to touched
    *     neighborhoods: shared-neighbor proposals are generated only
    *     through hubs in the touched set (new nodes ∪ their cellmates),
    *     so candidate volume follows the INCREMENT's neighborhood sizes,
    *     never the graph's (the absorbComponents discipline for kNN);
    *  3. MERGE — every node that received a candidate re-ranks
    *     (current live edges ∪ candidates) by the [[nnDescent]] rank law
    *     (6-decimal quantized cosine, id tie-break) and keeps top-k;
    *  4. DELTA — only nodes whose edge SET changed return rows (their
    *     full new top-k, to append at the next epoch — merge-on-read,
    *     no file rewrites).
    *
    * Scale shape: seeds are cell-pair bounded, the propagation self-join
    * keys on touched hubs only, scoring joins the vector table twice on
    * the 8-byte id, and the changed-set diff is one count aggregate over
    * (old ∪ new) edges of pool nodes — everything is O(increment ·
    * neighborhood), nothing rescans the corpus or the full graph. The
    * q234 gate pins the increment-built graph's recall against a fresh
    * [[nnDescent]] over the grown corpus at the same k/iters.
    *
    * @param liveGraph [[liveKnnGraph]] of the store (probe_id, nbr_id …)
    * @param vecs      (idCol, vecCol) for every live vector, old + new
    * @param newIds    (idCol) — the increment's node ids
    * @param cells     (idCol, "cid") frozen-quantizer assignment for
    *                  every live vector (the persisted IVF store layout)
    * @return (probe_id, nbr_id, score, rank ≤ k) rows for CHANGED nodes
    *         only — the epoch delta to append */
  def knnGraphAbsorb(liveGraph: DataFrame, vecs: DataFrame, newIds: DataFrame,
                     cells: DataFrame, idCol: String, vecCol: String,
                     k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    GraftFunctions.register(vecs.sparkSession)
    val v = vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        vnorm(col(vecCol)).as("__n")).where(col("__n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no distinct on the increment ids: they only ever key a left-semi
    // join, which is duplicate-insensitive (r16 — every dropped exchange
    // here is a scheduled stage per micro-batch in the absorb stream)
    val nw = newIds.select(col(idCol).as("__new"))
    val c = cells.select(col(idCol).as("__id"), col("cid"))
    val newCells = c.join(nw, c("__id") === nw("__new"), "left_semi")
      .select(col("__id").as("__nid"), col("cid"))
    // 1. seeds: (new ↔ cellmate) in both directions, deduped. The
    // cellmate side is restricted to LANDED vectors (present in `vecs`,
    // zero-norm excluded): in a chained/multi-batch absorb, `cells` may
    // cover not-yet-landed ids, and a mate that cannot score would both
    // bypass the lone-node fallback AND drop at the scoring join — the
    // node would silently get no epoch delta.
    val mates = c.join(v.select(col("__id")), Seq("__id"), "left_semi")
      .join(newCells, Seq("cid")).where(col("__id") =!= col("__nid"))
    // FALLBACK — a new node with no LANDED cellmate would otherwise
    // silently never join the graph (no delta row, no error): seed it
    // bidirectionally with the globally smallest OTHER live node id (the
    // beamSearchTopK entry-node convention), so the propagation round
    // pulls it toward its real neighborhood instead of dropping it.
    val lone = newCells.select(col("__nid"))
      .join(mates.select(col("__nid")).distinct(), Seq("__nid"), "left_anti")
    val mins = v.select(col("__id")).orderBy(col("__id").asc).limit(2)
      .agg(min(col("__id")).as("__m1"), max(col("__id")).as("__m2"))
    val loneSeeds = lone.crossJoin(broadcast(mins))
      .select(col("__nid"), when(col("__nid") === col("__m1"), col("__m2"))
        .otherwise(col("__m1")).as("__id"))
      .where(col("__id") =!= col("__nid")) // degenerate single-vector corpus
    val pairs = mates.select(col("__nid"), col("__id")).unionByName(loneSeeds)
    // seeds carries the flip-duplicates (≤2×) instead of paying a dedup
    // exchange: every consumer either dedups later anyway (`und`, `cand`)
    // or is a duplicate-insensitive semi-join key (`touched`)
    val seeds = pairs.select(col("__nid").as("probe_id"), col("__id").as("nbr_id"))
      .unionByName(pairs.select(col("__id").as("probe_id"), col("__nid").as("nbr_id")))
      .localCheckpoint(false) // touched set, propagation, AND the pool
    val touched = seeds.select(col("probe_id").as("__t"))
      .unionByName(seeds.select(col("nbr_id").as("__t")))
    val g = liveGraph.select(col("probe_id"), col("nbr_id"))
    val inc = g.join(touched, g("probe_id") === touched("__t"), "left_semi")
    // 2. one touched-restricted proposal round
    val undAll = inc.unionByName(seeds)
    val und = undAll.select(col("probe_id").as("c"), col("nbr_id").as("m"))
      .unionByName(undAll.select(col("nbr_id").as("c"), col("probe_id").as("m")))
      .distinct()
    val undT = und.join(touched, und("c") === touched("__t"), "left_semi")
      .localCheckpoint(false) // self-joined
    val prop = undT.join(undT.withColumnRenamed("m", "m2"), Seq("c"))
      .where(col("m") =!= col("m2"))
      .select(col("m").as("probe_id"), col("m2").as("nbr_id"))
    // 3. merge pool: candidates ∪ the current edges of every pool node
    val cand = seeds.unionByName(prop).distinct()
      .localCheckpoint(false) // pool probes AND the pool itself
    val poolProbes = cand.select(col("probe_id").as("__p")) // semi-join key only
    val pool = cand.unionByName(
        g.join(poolProbes, g("probe_id") === poolProbes("__p"), "left_semi"))
      .distinct()
    val scored = pool
      .join(v.select(col("__id").as("probe_id"), col("__v").as("__pv"),
        col("__n").as("__pn")), Seq("probe_id"))
      .join(v.select(col("__id").as("nbr_id"), col("__v").as("__cv"),
        col("__n").as("__cn")), Seq("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val wTop = Window.partitionBy("probe_id")
      .orderBy(round(col("score"), 6).desc, col("nbr_id").asc)
    val newTop = scored.withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .localCheckpoint(true) // changed-set diff AND the returned delta
    // 4. changed nodes: edge set differs from the live graph's
    val changed = newTop.select(col("probe_id"), col("nbr_id"))
      .unionByName(g.join(poolProbes, g("probe_id") === poolProbes("__p"), "left_semi"))
      .groupBy("probe_id", "nbr_id").agg(count(lit(1)).as("__c"))
      .where(col("__c") =!= 2)
      .select(col("probe_id")).distinct()
    val delta = newTop.join(changed, Seq("probe_id"), "left_semi")
      .select(col("probe_id"), col("nbr_id"), col("score"), col("rank"))
      .localCheckpoint(true) // the ONLY frame this call leaves pinned
    v.unpersist(blocking = false)
    // Release every intermediate checkpoint now that the delta is
    // materialized and self-contained — a continuous absorb stream calls
    // this once per micro-batch, and without the release each batch
    // leaks 4 non-recomputable block sets into the block manager (the
    // connectedComponents leak class, fixed the same way).
    GraphOps.releaseLocalCheckpoint(seeds)
    GraphOps.releaseLocalCheckpoint(undT)
    GraphOps.releaseLocalCheckpoint(cand)
    GraphOps.releaseLocalCheckpoint(newTop)
    delta
  }

  /** DELETE nodes from a persisted kNN graph WITH neighborhood repair —
    * the lifecycle leg that closes build → absorb → DELETE → compact for
    * the graph store (the IVF store's q172 tombstone cycle, extended to
    * graph state where removal also BREAKS other nodes' edge lists):
    * removing a vector (retention policy, takedown, re-embedding) must
    * drop the victim's own adjacency rows AND repair every survivor
    * that listed it, or those nodes silently serve short (or stale)
    * neighbor lists forever.
    *
    * Repair is the standard graph-index deletion step (the FreshDiskANN
    * delete rule — Singh et al., 2021): each survivor u that lost an
    * edge to victim d re-proposes candidates from d's OWN adjacency
    * (out ∪ in neighbors — "my deleted neighbor's neighbors are
    * probably my neighbors", the deletion-time mirror of NN-descent),
    * then re-ranks (surviving current edges ∪ proposals) under the
    * [[nnDescent]] rank law (6-decimal quantized cosine, id tie-break)
    * and keeps top-k. A survivor whose whole pool died (every edge and
    * every proposal was a victim) takes the [[knnGraphAbsorb]]
    * lone-node fallback — the globally smallest OTHER surviving id — so
    * a repaired node never silently drops out of the graph.
    *
    * The caller appends the returned delta at the next epoch and
    * records the victims as (id, before_epoch) tombstones (the
    * [[graft.sources.TableStore.liveView]] convention); the live graph
    * is then `liveKnnGraph(liveView(store, tombstones))` and compaction
    * rewrites it at epoch 0 — victims gone as probes via the
    * tombstones, gone as neighbors via the repair delta.
    *
    * Scale shape: everything keys on the victim set and its
    * neighborhoods — victim adjacency is two semi-joins of the live
    * graph, proposals are one victim-keyed join (O(victims · degree²)),
    * scoring joins the survivor vector table twice on the 8-byte id.
    * Nothing rescans the corpus or the full graph. The q260 gate pins
    * the repaired graph's recall against a FRESH rebuild over the
    * survivor set (the q234 parity law).
    *
    * @param liveGraph [[liveKnnGraph]] of the store (probe_id, nbr_id …)
    * @param vecs      (idCol, vecCol) for every LIVE vector incl.
    *                  victims (victims are excluded internally)
    * @param delIds    (idCol) — the victims
    * @return (probe_id, nbr_id, score, rank ≤ k) rows for every REPAIRED
    *         survivor — the epoch delta to append */
  def knnGraphDelete(liveGraph: DataFrame, vecs: DataFrame, delIds: DataFrame,
                     idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    GraftFunctions.register(vecs.sparkSession)
    // no distinct: the victim set only ever keys semi/anti joins, which
    // are duplicate-insensitive (r16 — one exchange per CDC delete leg)
    val vic = delIds.select(col(idCol).as("__d"))
      .localCheckpoint(false) // read by five joins below
    // survivors' vectors only — a victim can never be scored back in
    val v = vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        vnorm(col(vecCol)).as("__n")).where(col("__n") > 0)
      .join(vic, col("__id") === col("__d"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = liveGraph.select(col("probe_id"), col("nbr_id"))
    // survivor → victim edges: the broken rows that need repair
    val toVic = g.join(vic, g("nbr_id") === vic("__d"), "left_semi")
      .join(vic, g("probe_id") === vic("__d"), "left_anti")
      .localCheckpoint(false) // affected set AND proposals
    val aff = toVic.select(col("probe_id")).distinct()
      .localCheckpoint(false) // pool, fallback, and the current-edge cut
    // victim adjacency (out ∪ in): the repair candidate source
    // no dedup on the victim adjacency: the only duplicate a direction
    // flip can add is a mutual edge (≤2×), and the proposal pool dedups
    // at `pool0.distinct()` anyway — the exchange costs more than the
    // bounded duplicate it removes
    val vadj = g.join(vic, g("probe_id") === vic("__d"), "left_semi")
      .select(col("probe_id").as("__vd"), col("nbr_id").as("__m"))
      .unionByName(g.join(vic, g("nbr_id") === vic("__d"), "left_semi")
        .select(col("nbr_id").as("__vd"), col("probe_id").as("__m")))
    val prop = toVic.select(col("probe_id"), col("nbr_id").as("__vd"))
      .join(vadj, Seq("__vd"))
      .select(col("probe_id"), col("__m").as("nbr_id"))
      .where(col("probe_id") =!= col("nbr_id"))
    val cur = g.join(aff, Seq("probe_id"), "left_semi")
    val pool0 = cur.unionByName(prop).distinct()
      .join(vic, col("nbr_id") === col("__d"), "left_anti")
      .localCheckpoint(false) // ranked AND probed for the fallback
    // FALLBACK — an affected survivor whose entire pool died (every
    // current edge and every proposal was a victim): seed it with the
    // globally smallest OTHER surviving id (the knnGraphAbsorb lone-node
    // convention) so it keeps at least one live edge.
    val lone = aff.join(pool0.select(col("probe_id")).distinct(),
      Seq("probe_id"), "left_anti")
    val mins = v.select(col("__id")).orderBy(col("__id").asc).limit(2)
      .agg(min(col("__id")).as("__m1"), max(col("__id")).as("__m2"))
    val loneSeeds = lone.crossJoin(broadcast(mins))
      .select(col("probe_id"),
        when(col("probe_id") === col("__m1"), col("__m2"))
          .otherwise(col("__m1")).as("nbr_id"))
      .where(col("nbr_id").isNotNull && col("nbr_id") =!= col("probe_id"))
    val pool = pool0.unionByName(loneSeeds)
    val scored = pool
      .join(v.select(col("__id").as("probe_id"), col("__v").as("__pv"),
        col("__n").as("__pn")), Seq("probe_id"))
      .join(v.select(col("__id").as("nbr_id"), col("__v").as("__cv"),
        col("__n").as("__cn")), Seq("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val wTop = Window.partitionBy("probe_id")
      .orderBy(round(col("score"), 6).desc, col("nbr_id").asc)
    val delta = scored.withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .localCheckpoint(true) // the ONLY frame this call leaves pinned
    v.unpersist(blocking = false)
    GraphOps.releaseLocalCheckpoint(vic)
    GraphOps.releaseLocalCheckpoint(toVic)
    GraphOps.releaseLocalCheckpoint(aff)
    GraphOps.releaseLocalCheckpoint(pool0)
    delta
  }

  /** GRAPH-NAVIGATION ANN SEARCH — greedy beam search over a kNN graph,
    * the query-time half of the HNSW/NSG family (Malkov & Yashunin,
    * TPAMI 2018; here single-layer, fixed-hop): start every probe at a
    * deterministic entry node (lowest live id), then per hop expand the
    * beam through the graph's out-edges, score expansions against the
    * probe, and keep the best `beam` nodes by (cosine desc, id). After
    * `hops` rounds the beam's top `k` (self excluded when probe and
    * corpus share an id space) is the answer. The beam is MONOTONE —
    * current members always rejoin the candidate set, so beam quality
    * never regresses — and every step is deterministic, which makes the
    * whole trajectory replayable hop-by-hop on an independent engine.
    *
    * Scale shape: per hop, candidates number probes × beam × (degree+1)
    * — probe-sized, never corpus-sized. Scoring joins the vector table
    * on the 8-byte node id (the candidate side is tiny and broadcasts
    * under AQE); the corpus itself never shuffles. Graph construction is
    * the separate concern: feed [[nnDescent]] output (the certified
    * linear-at-scale path) — a brute-force graph is gate-scale
    * instrumentation only. Recall rises with `hops`/`beam` (HNSW's ef);
    * the q200 gate pins a hit flag against the exact top-k so measured
    * recall ships with the result.
    *
    * @param graph directed kNN edges (probe_id, nbr_id) — [[knnGraph]] /
    *              [[nnDescent]] output; extra columns ignored
    * @return (probe_id, nbr_id, score, rank ≤ k) */
  def beamSearchTopK(corpus: DataFrame, probes: DataFrame, graph: DataFrame,
                     idCol: String, probeIdCol: String, vecCol: String,
                     k: Int = 10, beam: Int = 8, hops: Int = 3): DataFrame = {
    val c0 = corpus.select(col(idCol).as("nbr_id"), vnorm(col(vecCol)).as("__cn"))
      .where(col("__cn") > 0)
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    beamSearchTopKFrom(corpus, probes, graph,
      p0.select("probe_id").crossJoin(broadcast(c0.agg(min(col("nbr_id")).as("nbr_id")))),
      idCol, probeIdCol, vecCol, k, beam, hops)
  }

  /** PER-PROBE ENTRY ROUTING for [[beamSearchTopKFrom]] — the quantizer-
    * routed entry the HNSW family reaches with hierarchical layers,
    * recovered here from state the engine already maintains: each probe
    * picks its nearest NON-EMPTY cell under the frozen coarse quantizer
    * (the [[ivfStore]] cid layout) and enters the graph at that cell's
    * minimum live node id. A single global entry costs O(graph diameter)
    * hops to reach a far cluster — a recall cliff for probes far from
    * the entry (the q235 fixture measures it); routing starts the walk
    * inside the probe's own region, so the same hops/beam budget spends
    * on refinement instead of transit.
    *
    * Scale shape: the per-cell minimum is one aggregate on the
    * cid-bucketed store (no Exchange); cells-with-entries joined onto
    * the model-sized centroid table stays model-sized and broadcasts
    * under the probe-side top-1 window — probes never shuffle the store.
    *
    * @param store (idCol, "cid") rows — [[ivfStore]] layout (live view)
    * @return (probe_id, nbr_id) — one entry node per probe */
  def cellEntryNodes(store: DataFrame, probes: DataFrame, centroids: DataFrame,
                     idCol: String, probeIdCol: String, centroidIdCol: String,
                     vecCol: String): DataFrame = {
    GraftFunctions.register(store.sparkSession)
    val cellMin = store.groupBy(col("cid"))
      .agg(min(col(idCol)).as("nbr_id"))
    val cent = centroids.select(col(centroidIdCol).as("cid"),
        col(vecCol).as("__cenv"), vnorm(col(vecCol)).as("__cenn"))
      .where(col("__cenn") > 0)
      .join(cellMin, Seq("cid")) // only cells that actually hold nodes
    val wP = Window.partitionBy("probe_id")
      .orderBy(col("__cscore").desc, col("cid").asc)
    probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
        vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("__cscore",
        vdot(col("__pv"), col("__cenv")) / (col("__pn") * col("__cenn")))
      .withColumn("__rn", row_number().over(wP)).where(col("__rn") === 1)
      .select(col("probe_id"), col("nbr_id"))
  }

  /** [[beamSearchTopK]] with CALLER-SUPPLIED entry nodes — the routed
    * variant ([[cellEntryNodes]] builds the (probe_id, nbr_id) entries
    * from the coarse quantizer); the fixed-entry overload delegates
    * here with the global minimum id fanned across probes. */
  def beamSearchTopKFrom(corpus: DataFrame, probes: DataFrame, graph: DataFrame,
                         entries: DataFrame, idCol: String, probeIdCol: String,
                         vecCol: String, k: Int = 10, beam: Int = 8,
                         hops: Int = 3): DataFrame = {
    val (b, _, wBeam) = beamWalk(corpus, probes, graph, entries, idCol,
      probeIdCol, vecCol, k, beam, hops)
    val answer = if (idCol == probeIdCol) b.where(col("probe_id") =!= col("nbr_id")) else b
    answer
      .withColumn("rank", row_number().over(wBeam)).where(col("rank") <= k)
  }

  /** The SHARED beam walk under both serving entry points
    * ([[beamSearchTopKFrom]] ranks the final beam;
    * [[beamSearchTopKFilteredFrom]] ranks the visited pool ∩ filter) —
    * one implementation so the walk's conventions (cosine desc / id-asc
    * tie-break, zero-norm exclusion, self kept in the beam for
    * navigation) cannot drift between the two.
    *
    * @return (final beam with `score`, visited (probe_id, nbr_id) pool —
    *         entries ∪ every hop's candidate set, pre-distinct — and the
    *         per-probe rank window both tails order by) */
  private def beamWalk(corpus: DataFrame, probes: DataFrame, graph: DataFrame,
                       entries: DataFrame, idCol: String, probeIdCol: String,
                       vecCol: String, k: Int, beam: Int,
                       hops: Int): (DataFrame, DataFrame, WindowSpec) = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got k=$k beam=$beam")
    require(hops >= 1, s"hops must be >= 1, got $hops")
    GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0)
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    val g = graph.select(col("probe_id").as("__src"), col("nbr_id").as("__dst"))
    val wBeam = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    // score a (probe_id, nbr_id) candidate set and keep the best `beam`;
    // self stays IN the beam (it is navigationally useful) and is only
    // dropped from the final answer by the caller
    def rankBeam(cand: DataFrame): DataFrame = cand
      .join(c, Seq("nbr_id"))
      .join(broadcast(p), Seq("probe_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
      .withColumn("rank", row_number().over(wBeam)).where(col("rank") <= beam)
    var b = rankBeam(entries.select(col("probe_id"), col("nbr_id")))
    var visited = entries.select(col("probe_id"), col("nbr_id"))
    for (_ <- 1 to hops) {
      val expanded = b.select("probe_id", "nbr_id")
        .join(g, b("nbr_id") === g("__src"))
        .select(col("probe_id"), col("__dst").as("nbr_id"))
      val cand = b.select("probe_id", "nbr_id").unionByName(expanded).distinct()
      visited = visited.unionByName(cand)
      b = rankBeam(cand)
    }
    (b, visited, wBeam)
  }

  /** FILTERED graph-ANN serving — [[beamSearchTopKFrom]]'s walk with an
    * attribute predicate on the ANSWER set (the Filtered-DiskANN
    * post-collection form, Gollapudi et al., WWW 2023): the beam
    * navigates the UNFILTERED graph (restricting edges to matching nodes
    * fragments connectivity — on a 30%-selective filter the matching
    * subgraph's out-degree drops 3×, stranding the walk), while every
    * candidate the walk ever SCORES is collected into a visited pool;
    * the answer is the top `k` of visited ∩ `allowed`. Deterministic end
    * to end, so the whole trajectory — walk plus collection — replays on
    * an independent engine (the q255 gate).
    *
    * Recall at a fixed hops/beam budget is bounded by where the walk's
    * basin lands, so PAIR this with filter-aware entry routing: route
    * entries via [[cellEntryNodes]] over the attribute-carrying IVF
    * store's FILTERED view (`store.where(pred)` — the predicate is a
    * map-side cut on the cid-bucketed scan, and cells without a matching
    * member drop out of the routing table, so every probe enters at a
    * matching node in its own region). The q255 gate measures the lift:
    * 57 vs 35 exact-filtered-top-5 hits per 250 at identical budget.
    *
    * Scale shape: the walk is [[beamSearchTopKFrom]]'s — per hop,
    * probes × beam × (degree+1) candidates, corpus never shuffles. The
    * visited pool is the union of those per-hop candidate sets
    * (probe-shaped, ≤ hops × the per-hop volume); the `allowed` cut is
    * one semi-join of that pool against the id set (serving deployments
    * take `allowed` from the carry-col store's filtered view, so the cut
    * is a bucketed scan, not a metadata join).
    *
    * @param allowed ids passing the predicate — one column named
    *                `idCol` (extra columns ignored)
    * @return (probe_id, nbr_id, score, rank ≤ k) — matching nodes only */
  def beamSearchTopKFilteredFrom(corpus: DataFrame, probes: DataFrame,
                                 graph: DataFrame, entries: DataFrame,
                                 allowed: DataFrame, idCol: String,
                                 probeIdCol: String, vecCol: String,
                                 k: Int = 10, beam: Int = 8,
                                 hops: Int = 3): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val (_, visited, wBeam) = beamWalk(corpus, probes, graph, entries, idCol,
      probeIdCol, vecCol, k, beam, hops)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn")).where(col("__cn") > 0)
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
      vnorm(col(vecCol)).as("__pn")).where(col("__pn") > 0)
    val pool = visited.distinct()
      .join(allowed.select(col(idCol).as("nbr_id")).distinct(),
        Seq("nbr_id"), "left_semi")
    val scored = pool
      .join(c, Seq("nbr_id"))
      .join(broadcast(p), Seq("probe_id"))
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val answer = if (idCol == probeIdCol)
      scored.where(col("probe_id") =!= col("nbr_id")) else scored
    answer
      .withColumn("rank", row_number().over(wBeam)).where(col("rank") <= k)
  }

  /** GRID-DENSITY CLUSTERING of an embedding corpus — the CLIQUE/STING
    * family (Agrawal et al., SIGMOD 1998): project every vector to 2
    * exact-integer JL coordinates ([[randomProjection]] — deterministic,
    * engine-portable), bucket into a `cellWidth` grid, call a cell CORE
    * when it holds ≥ `minPts` points, and union 8-adjacent core cells
    * into clusters. The density-based complement to the k-means family
    * ([[kmeansCentroids]]/SemDeDup): finds arbitrarily-shaped dense
    * regions and labels sparse points as noise instead of forcing them
    * into a nearest centroid — the "is this embedding space clumpy, and
    * where" question k-means answers badly.
    *
    * Scale shape: the corpus pays one map-side projection and ONE
    * (cx, cy) count aggregate; everything after (core filter, dense cell
    * ids, 9-offset self equi-join, connected components, label joins)
    * runs on the CELL table — corpus/minPts at worst, grid-bounded in
    * practice. The one global window (dense cid assignment) orders cells,
    * never points. Label attach is two cell-keyed equi-joins back onto
    * the point frame.
    *
    * @return (idCol, cx, cy, is_core, cluster) — cluster is the min
    *         dense-cell id of the connected core region, −1 for noise */
  def gridDensityClusters(corpus: DataFrame, idCol: String, vecCol: String,
                          cellWidth: Long = 200000L, minPts: Long = 5L): DataFrame = {
    require(cellWidth >= 1, s"cellWidth must be positive, got $cellWidth")
    require(minPts >= 1, s"minPts must be positive, got $minPts")
    val pts = corpus.select(col(idCol), randomProjection(col(vecCol), 2).as("__p"))
      .withColumn("__x", col("__p").getItem(0))
      .withColumn("__y", col("__p").getItem(1))
      // exact floor division (negatives included): strip the nonneg pmod
      .withColumn("__mx", col("__x") - pmod(col("__x"), lit(cellWidth)))
      .withColumn("__my", col("__y") - pmod(col("__y"), lit(cellWidth)))
      .select(col(idCol), expr(s"__mx div ${cellWidth}L").as("cx"),
        expr(s"__my div ${cellWidth}L").as("cy"))
    val core = pts.groupBy("cx", "cy").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minPts)
    val cid = core.select(col("cx"), col("cy"),
      row_number().over(Window.orderBy("cx", "cy")).cast("long").as("cid"))
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val edges = cid.select(col("cid").as("cid_a"), col("cx"), col("cy"))
      .withColumn("__o", explode(array(offsets: _*)))
      .select(col("cid_a"), (col("cx") + col("__o.dx")).as("cx"),
        (col("cy") + col("__o.dy")).as("cy"))
      .join(cid.select(col("cid").as("cid_b"), col("cx"), col("cy")), Seq("cx", "cy"))
      .select("cid_a", "cid_b")
    val comp = GraphOps.connectedComponents(edges, "cid_a", "cid_b")
    pts.join(cid, Seq("cx", "cy"), "left")
      .join(comp.withColumnRenamed("id", "cid"), Seq("cid"), "left")
      .select(col(idCol), col("cx"), col("cy"),
        col("cid").isNotNull.as("is_core"),
        // isolated core cells never enter an edge: they are their own
        // cluster; non-core points are noise
        coalesce(col("component"), col("cid"), lit(-1L)).as("cluster"))
  }

  /** The PERSISTED-IVF store content: every corpus vector assigned to its
    * nearest cell under a FROZEN trained quantizer — (idCol, vecCol,
    * "cid") rows, the inverted file as a table. Persist via
    * [[graft.sources.TableStore.saveBucketed]] clustered on "cid":
    * searches then semi-join the bucketed scan on the cell id with no
    * store-side Exchange, and [[semanticDedupIncrement]] consumes the
    * SAME layout — one store serves both the ANN search and the
    * semantic-dedup ingestion gate.
    *
    * This function is BOTH the initial build and the absorb step of the
    * lifecycle (train once → persist → absorb increments → search): cell
    * assignment under frozen centroids is stateless and map-only
    * (broadcast centroids, WindowGroupLimit pre-reduction — the
    * [[ivfTopK]] shape), so absorbing a batch is `ivfStore(increment)`
    * appended to the table — O(batch), never a corpus rescan. Zero-norm
    * vectors are dropped (cosine undefined — they could never be
    * returned by a search anyway).
    *
    * @param carryCols attribute columns copied into the store rows —
    *                  the attribute-payload layout that lets
    *                  [[ivfSearchStoreFiltered]] filter-before-score
    *                  map-side instead of joining a metadata table */
  def ivfStore(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, centroidIdCol: String,
               carryCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cent = centroids.select(col(centroidIdCol).as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("__cv"))
    assignCells(normalizedCorpus(corpus, idCol, vecCol, carryCols), idCol, cent,
        carryCols)
      .select(col(idCol) +: carryCols.map(col) :+ col("__v").as(vecCol)
        :+ col("cid"): _*)
  }

  /** RETRAIN/REINDEX leg of the persisted-IVF lifecycle — the batch job
    * that closes build → absorb → delete → compact → RETRAIN: after the
    * corpus has grown or drifted, retrain the coarse quantizer (e.g.
    * [[kmeansCentroids]] over the live corpus) and REASSIGN every live
    * store row under the new centroids, producing a fresh [[ivfStore]]
    * layout to rewrite at epoch 0 with the cid-bucketing preserved
    * (the compaction analog for quantizer drift — absorbing under a
    * frozen quantizer is O(batch), but the frozen cells slowly stop
    * matching the data distribution, and search recall decays until a
    * reindex).
    *
    * Semantics-preserving by construction: assignment under fixed
    * centroids is deterministic, so the reindexed store is IDENTICAL to
    * a fresh [[ivfStore]] build over the live corpus (the q178 gate pins
    * search-over-reindexed ≡ search-over-fresh-build, hash-identical).
    * Cost is one pass over the store (broadcast centroids, map-side
    * WindowGroupLimit top-1, one id-keyed exchange) — a batch job, not
    * an increment, which is exactly why the lifecycle keeps it separate
    * from [[ivfStore]]-as-absorb.
    *
    * @param store (idCol, vecCol, "cid" [, epoch …]) — live rows (apply
    *              [[graft.sources.TableStore.liveView]] first if the
    *              table carries tombstones); old cid/extra columns are
    *              dropped
    * @return (idCol, vecCol, "cid") under `newCentroids`
    */
  def ivfReindex(store: DataFrame, idCol: String, vecCol: String,
                 newCentroids: DataFrame, centroidIdCol: String): DataFrame =
    ivfStore(store.select(col(idCol), col(vecCol)), idCol, vecCol,
      newCentroids, centroidIdCol)

  /** Search a PERSISTED inverted file ([[ivfStore]] layout, typically
    * reloaded from its cid-bucketed parquet table): probes pick their
    * nearest cells under the same frozen centroids with FRACTION-scaled
    * probing (the [[ivfTopKFraction]] deployment rule), and the store is
    * scanned map-only — the probe-cell side is explicitly broadcast, so
    * the (bucketed) store never shuffles and no cell assignment is
    * recomputed. Results are IDENTICAL to [[ivfTopKFraction]] over the
    * corpus the store was built from: assignment under frozen centroids
    * is deterministic, so the persisted cells ARE the in-query cells.
    *
    * @param store (idCol, vecCol, "cid") rows — [[ivfStore]] output,
    *              plus any absorbed increments
    */
  def ivfSearchStore(store: DataFrame, probes: DataFrame, centroids: DataFrame,
                     idCol: String, probeIdCol: String, centroidIdCol: String,
                     vecCol: String, k: Int = 10,
                     probeFraction: Double = 0.25, minProbe: Int = 2): DataFrame = {
    require(probeFraction > 0 && probeFraction <= 1,
      s"probeFraction in (0,1], got $probeFraction")
    require(minProbe >= 1, s"minProbe must be >= 1, got $minProbe")
    GraftFunctions.register(store.sparkSession)
    val cent = centroids.select(col(centroidIdCol).as("cid"), col(vecCol).as("__cenv"),
      vnorm(col(vecCol)).as("__cenn")).where(col("__cenn") > 0)
      .localCheckpoint(false) // counted (planning scalar) AND probed
    val np = math.max(minProbe, math.ceil(probeFraction * cent.count()).toInt)
    val wP = Window.partitionBy("probe_id").orderBy(col("__cscore").desc, col("cid").asc)
    val pcells = probes
      .select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
        vnorm(col(vecCol)).as("__pn"))
      .where(col("__pn") > 0) // zero-norm → NaN cosine, see bruteForceTopK
      .crossJoin(broadcast(cent))
      .withColumn("__cscore", vdot(col("__pv"), col("__cenv")) / (col("__pn") * col("__cenn")))
      .withColumn("__rn", row_number().over(wP)).where(col("__rn") <= np)
      .select(col("probe_id"), col("__pv"), col("__pn"), col("cid"))
    // store side: map-only scan (norms recomputed on read — cheaper than
    // persisting them, and robust to hand-built stores); the probed-cell
    // frame is probe-bounded, so it broadcasts — the store never shuffles
    val asn = store.select(col(idCol).as("nbr_id"), col(vecCol).as("__cv"),
      vnorm(col(vecCol)).as("__cn"), col("cid")).where(col("__cn") > 0)
    val cand0 = asn.join(broadcast(pcells), Seq("cid"))
    val scored = (if (idCol == probeIdCol) cand0.where(col("nbr_id") =!= col("probe_id")) else cand0)
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))).as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** CELL-OCCUPANCY monitOR for a persisted inverted file — the
    * operational metric that decides WHEN to [[ivfReindex]]: absorbing
    * under a frozen quantizer is O(batch), but as the data distribution
    * drifts, cells fill unevenly — search cost tracks the probed cells'
    * sizes, so a hot cell degrades every query that probes it. Emits
    * per-cell row counts with an integer imbalance score
    * (`excess_milli` = cell size ÷ balanced size, in milli — 1000 =
    * perfectly balanced; the max over cells is the classic imbalance
    * factor IVF deployments alert on).
    *
    * Scale shape: one count aggregate keyed on the bucket column (the
    * cid-bucketed store aggregates WITHOUT an Exchange) + a 1-row
    * (total, n_cells) broadcast — the monitor costs one map-only store
    * pass, so it can run after every absorb.
    *
    * @return (cidCol, n_rows, excess_milli), one row per non-empty cell */
  def ivfOccupancy(store: DataFrame, cidCol: String = "cid"): DataFrame = {
    val counts = store.groupBy(cidCol).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum("n_rows").as("__tot"),
      count(lit(1)).as("__cells"))
    counts.crossJoin(broadcast(tot))
      .select(col(cidCol), col("n_rows"),
        expr("n_rows * __cells * 1000 div __tot").as("excess_milli"))
  }

  /** FILTERED vector search over the persisted inverted file — the
    * metadata-constrained ANN query ("top-k among rows WHERE …") every
    * retrieval deployment needs, with PRE-FILTER semantics: the
    * predicate (over attribute columns the store carries — build with
    * [[ivfStore]]'s `carryCols`) cuts the store scan BEFORE any vector
    * is scored, so the result is the exact top-k among MATCHING rows in
    * the probed cells — always k results when the filtered cells hold k
    * candidates. The naive alternative, post-filtering an unfiltered
    * top-k, silently returns < k (often 0) once the filter is selective:
    * with a uniform 10% attribute, an unfiltered top-10 keeps ~1
    * survivor — the recall gap the q214 gate measures as a column.
    *
    * Scale shape: identical to [[ivfSearchStore]] — the predicate is a
    * map-side filter on the cid-bucketed scan (simple comparisons reach
    * the parquet reader as PushedFilters and prune row groups), the
    * probed-cell frame broadcasts, the store never shuffles. Carrying
    * filterable attributes IN the index costs bytes-per-row at write
    * time and buys filter-before-score reads — the attribute-payload
    * index layout, vs. an id-join against a separate metadata table
    * that would shuffle either side at corpus scale.
    *
    * Equivalence: assignment under frozen centroids is row-wise, so
    * filtering the store commutes with cell assignment — results are
    * IDENTICAL to [[ivfTopKFraction]] over the pre-filtered corpus with
    * the same centroids (spec-pinned).
    *
    * @param predicate filter over store columns (id, carried attrs, cid)
    */
  def ivfSearchStoreFiltered(store: DataFrame, probes: DataFrame,
                             centroids: DataFrame, idCol: String,
                             probeIdCol: String, centroidIdCol: String,
                             vecCol: String, predicate: Column, k: Int = 10,
                             probeFraction: Double = 0.25,
                             minProbe: Int = 2): DataFrame =
    ivfSearchStore(store.where(predicate), probes, centroids, idCol,
      probeIdCol, centroidIdCol, vecCol, k, probeFraction, minProbe)

  /** Distributed Lloyd's k-means assignment (cosine flavor) over an
    * embedding column.
    *
    * Deterministic by construction: centroids come from a caller-supplied
    * init table (e.g. a hash-sampled corpus subset) and exactly
    * `updateRounds` assign→re-center rounds run — no convergence test, so
    * the output never depends on an FP-noise-sensitive stopping rule.
    * Per round the k×dim centroid table is broadcast and each vector picks
    * its top-1 cell map-side (WindowGroupLimit pre-reduces the broadcast
    * cross product before any exchange — same shape as [[ivfTopK]]); new
    * centroids are per-(cell, position) means via posexplode — two
    * aggregates over k·dim keys. Nothing corpus-sized ever reaches the
    * driver; the centroid model stays a (tiny) distributed DataFrame.
    *
    * Ties (equal cosine) break toward the smallest centroid id, matching
    * the `ORDER BY score DESC, cid` convention of the SQL oracle. Zero-norm
    * vectors and zero-norm centroids are dropped (cosine undefined).
    *
    * @return (idCol, "cid") — the assignment under the final centroids
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   initCentroids: DataFrame, centroidIdCol: String,
                   updateRounds: Int = 1): DataFrame =
    kmeansFull(corpus, idCol, vecCol, initCentroids, centroidIdCol, updateRounds)
      .select(col(idCol), col("cid"))

  /** The trained coarse quantizer itself: the centroid table
    * [[kmeansAssign]]'s final assignment uses, as (centroidIdCol, vecCol)
    * with double-precision vectors — feed it to [[ivfTopK]] to search with
    * a TRAINED inverted file instead of raw sampled cells. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      initCentroids: DataFrame, centroidIdCol: String,
                      updateRounds: Int = 1): DataFrame =
    trainedCentroids(normalizedCorpus(corpus, idCol, vecCol),
      idCol, vecCol, initCentroids, centroidIdCol, updateRounds)
      .select(col("cid").as(centroidIdCol), col("__cv").as(vecCol))

  private def normalizedCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                               carryCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol) +: carryCols.map(col) :+ col(vecCol).as("__v")
        :+ vnorm(col(vecCol)).as("__n"): _*)
      .where(col("__n") > 0)
  }

  /** One top-1-cell assignment pass: broadcast centroids, map-side
    * WindowGroupLimit pre-reduction (the [[ivfTopK]] shape). */
  private def assignCells(v: DataFrame, idCol: String, cent: DataFrame,
                          carryCols: Seq[String] = Nil): DataFrame = {
    val c = cent.select(col("cid"), col("__cv"), vnorm(col("__cv")).as("__cn"))
      .where(col("__cn") > 0)
    val w = Window.partitionBy(idCol).orderBy(col("__score").desc, col("cid").asc)
    v.crossJoin(broadcast(c))
      .withColumn("__score", vdot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol) +: carryCols.map(col) :+ col("__v") :+ col("__n")
        :+ col("cid"): _*)
  }

  /** `updateRounds` Lloyd rounds from the init table; returns (cid, __cv)
    * double-array centroids. Per-(cell, position) means via posexplode —
    * k·dim aggregate keys, no driver round-trip. */
  private def trainedCentroids(v: DataFrame, idCol: String, vecCol: String,
                               initCentroids: DataFrame, centroidIdCol: String,
                               updateRounds: Int): DataFrame = {
    require(updateRounds >= 0, s"updateRounds must be >= 0, got $updateRounds")
    def recenter(asn: DataFrame): DataFrame =
      asn.select(col("cid"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("cid", "__pos").agg(avg(col("__x").cast("double")).as("__m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
        .select(col("cid"), transform(col("__pm"), p => p.getField("__m")).as("__cv"))
    var cent = initCentroids.select(col(centroidIdCol).as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("__cv"))
    var round = 0
    while (round < updateRounds) {
      cent = recenter(assignCells(v, idCol, cent))
      round += 1
    }
    // trained centroids are model-sized and consumed as the build side of
    // at least two broadcast exchanges (corpus assignment + probe
    // routing); a lazy frame re-runs the Lloyd round(s) — a full corpus
    // pass each — inside every broadcast build (the pqCodebook pattern,
    // r16). Init passthrough (0 rounds) stays lazy: nothing to re-run.
    if (updateRounds == 0) cent else cent.localCheckpoint(false)
  }

  /** [[kmeansAssign]] keeping the vector and its norm alongside the cell id
    * — internal feed for [[semanticDedup]]'s intra-cluster pair scan. */
  private def kmeansFull(corpus: DataFrame, idCol: String, vecCol: String,
                         initCentroids: DataFrame, centroidIdCol: String,
                         updateRounds: Int): DataFrame = {
    val v = normalizedCorpus(corpus, idCol, vecCol)
    assignCells(v, idCol,
      trainedCentroids(v, idCol, vecCol, initCentroids, centroidIdCol, updateRounds))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    * with [[kmeansAssign]], then mark cosine near-duplicates WITHIN each
    * cluster and keep only the smallest id of each duplicate pair. The
    * clustering bounds the pair scan to intra-cluster pairs — the global
    * all-pairs n² never materializes; with balanced clusters candidate
    * volume is k·(n/k)² and the pair join shuffles on the cluster id only.
    * (At 100 TB you'd raise k so n/k stays executor-sized — candidate
    * volume and skew are both governed by the same knob.)
    *
    * The final assignment is computed once and persisted: the pair scan
    * reads it from both sides and the verdict join reads it again — without
    * the persist the whole kmeans chain would re-run three times.
    *
    * @return one row per in-corpus vector: (idCol, "cid", "kept") where
    *         kept=false iff a smaller-id vector in the same cluster is
    *         cosine-`threshold`-close
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    initCentroids: DataFrame, centroidIdCol: String,
                    threshold: Double = 0.9, updateRounds: Int = 1): DataFrame = {
    val full = kmeansFull(corpus, idCol, vecCol, initCentroids, centroidIdCol, updateRounds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = full.select(col("cid"), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = full.select(col("cid"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val losers = a.join(b, Seq("cid")).where(col("id_a") < col("id_b"))
      .where(vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    full.select(col(idCol), col("cid"))
      .join(losers.withColumn("__lost", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cid"), col("__lost").isNull.as("kept"))
  }

  /** Contrastive-triplet mining for embedding-model training data:
    * (anchor, positive, hard negative) where the positive is a
    * cosine-near-duplicate (≥ threshold, smallest id) and the hard
    * negative is the MOST similar same-cell vector still below the
    * threshold — the classic hard-negative regime, bounded to k-means
    * cells so the candidate scan is k·(n/k)², never all-pairs.
    *
    * Negative ranking uses the score QUANTIZED to 6 decimals with an id
    * tie-break: near-duplicate candidate sets contain pairs whose cosines
    * differ only in the 12th decimal (e.g. a vector vs its scaled copy
    * seen from a third vector), and ranking raw doubles there would make
    * the winner an artifact of FP summation order. Quantization makes the
    * selection reproducible across engines and partitionings; genuinely
    * distinct candidates are separated far above 1e-6.
    *
    * @return (anchor, pos_id, neg_id) for every anchor that has both
    */
  def contrastiveTriplets(corpus: DataFrame, idCol: String, vecCol: String,
                          initCentroids: DataFrame, centroidIdCol: String,
                          threshold: Double = 0.9): DataFrame = {
    val full = kmeansFull(corpus, idCol, vecCol, initCentroids, centroidIdCol, 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = full.select(col("cid"), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = full.select(col("cid"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // scored once per unordered same-cell pair, reused by both stages
    val sc = a.join(b, Seq("cid")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pos = sc.where(col("c") >= threshold)
      .groupBy(col("id_a").as("anchor")).agg(min(col("id_b")).as("pos_id"))
    val below = sc.where(col("c") < threshold)
    val cand = below.select(col("id_a").as("anchor"), col("id_b").as("cand"), col("c"))
      .unionByName(below.select(col("id_b").as("anchor"), col("id_a").as("cand"), col("c")))
    val w = Window.partitionBy("anchor")
      .orderBy(round(col("c"), 6).desc, col("cand").asc)
    val neg = cand.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("anchor"), col("cand").as("neg_id"))
    pos.join(neg, Seq("anchor"))
  }

  /** Diversity coreset: per k-means cell, the `k` members FARTHEST from
    * their centroid (lowest cosine) — the cheap diversity-aware selection
    * pass that complements [[semanticDedup]]: dedup removes redundancy,
    * the coreset keeps the spread (cluster-margin sampling in the coreset
    * literature). Ranking uses the 6-decimal-quantized score with an id
    * tie-break (the [[contrastiveTriplets]] rationale — raw-double order
    * among near-identical members is FP-summation-order noise).
    *
    * @return (idCol, "cid", "rank"): rank 1 = farthest from centroid
    */
  def cellCoreset(corpus: DataFrame, idCol: String, vecCol: String,
                  initCentroids: DataFrame, centroidIdCol: String,
                  k: Int, updateRounds: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val full = kmeansFull(corpus, idCol, vecCol, initCentroids, centroidIdCol, updateRounds)
    val c = trainedCentroids(normalizedCorpus(corpus, idCol, vecCol),
      idCol, vecCol, initCentroids, centroidIdCol, updateRounds)
      .select(col("cid"), col("__cv"), vnorm(col("__cv")).as("__cn"))
      .where(col("__cn") > 0)
    val w = Window.partitionBy("cid")
      .orderBy(round(col("__score"), 6).asc, col(idCol).asc)
    full.join(broadcast(c), Seq("cid"))
      .withColumn("__score", vdot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("cid"), col("rank"))
  }

  /** Two-level [[semanticDedup]] — the 100 TB configuration of the
    * semantic-cell family, fixing the two scale walls of the flat version:
    *
    *  1. **Assignment work.** Flat SemDeDup with corpus-proportional k pays
    *     n·k dot products (n²/cellSize). Here a vector scores the `k1`
    *     trained coarse centroids (one Lloyd round from a FIXED-size init —
    *     [[kmeansCentroids]]'s quantizer fed back in as the pruning
    *     structure), then ONLY the `finePerCell` fine centroids of its own
    *     coarse cell: O(n·(k1 + finePerCell)) — linear in the corpus with
    *     both knobs constants.
    *  2. **The broadcast wall.** The broadcast tables are k1 coarse rows
    *     and ≤ k1·finePerCell fine rows — bounded by configuration, never
    *     by corpus size, so the map-side assignment pattern survives any n.
    *
    * Fine centroids are real member vectors (the `finePerCell` smallest
    * LCG-priorities per coarse cell — [[graft.operators.TrainShuffle.lcgPrio]],
    * engine-portable and tie-free), selected by a per-ccid row_number that
    * Spark's WindowGroupLimit pre-reduces map-side to `finePerCell` rows per
    * map task — the window never sees corpus-sized partitions even though
    * there are only k1 groups. Fine-assignment ranking quantizes the cosine
    * to 6 decimals with a fid tie-break (the [[contrastiveTriplets]]
    * rationale: a vector ties exactly with its scaled copy, and raw-double
    * order there is FP-summation noise).
    *
    * The dedup pair scan runs within (ccid, fid) cells. With fixed cell
    * COUNT, cell size grows with the corpus — the explicit trade for
    * linear assignment; re-tier both knobs ~√k as the corpus grows and
    * assignment stays n·2√k with the pair scan at n·cellSize, still with
    * no corpus-sized broadcast anywhere.
    *
    * @return one row per in-corpus vector: (idCol, "ccid", "fid", "kept"),
    *         kept=false iff a smaller-id vector in the same fine cell is
    *         cosine-`threshold`-close
    */
  def semanticDedupTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                            coarseInit: DataFrame, coarseIdCol: String,
                            finePerCell: Int, threshold: Double = 0.9,
                            coarseRounds: Int = 1, fineSeed: Long = 4242L): DataFrame = {
    require(finePerCell > 0, s"finePerCell must be positive, got $finePerCell")
    val v = normalizedCorpus(corpus, idCol, vecCol)
    val cent = trainedCentroids(v, idCol, vecCol, coarseInit, coarseIdCol, coarseRounds)
    // persisted: feeds fine-centroid selection, fine assignment, and (via
    // fasn) both pair-scan sides — without it the coarse chain re-runs
    val casn = assignCells(v, idCol, cent).withColumnRenamed("cid", "ccid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wSel = Window.partitionBy("ccid").orderBy(col("__prio").asc)
    val fine = casn
      .withColumn("__prio", graft.operators.TrainShuffle.lcgPrio(col(idCol), fineSeed))
      .withColumn("__rn", row_number().over(wSel)).where(col("__rn") <= finePerCell)
      .select(col("ccid"), col(idCol).as("fid"), col("__v").as("__fv"), col("__n").as("__fn"))
    val wAsn = Window.partitionBy(idCol).orderBy(round(col("__fs"), 6).desc, col("fid").asc)
    val fasn = casn.join(broadcast(fine), Seq("ccid"))
      .withColumn("__fs", vdot(col("__v"), col("__fv")) / (col("__n") * col("__fn")))
      .withColumn("__rn", row_number().over(wAsn)).where(col("__rn") === 1)
      .select(col(idCol), col("ccid"), col("fid"), col("__v"), col("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = fasn.select(col("ccid"), col("fid"), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = fasn.select(col("ccid"), col("fid"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val losers = a.join(b, Seq("ccid", "fid")).where(col("id_a") < col("id_b"))
      .where(vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    fasn.select(col(idCol), col("ccid"), col("fid"))
      .join(losers.withColumn("__lost", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("ccid"), col("fid"), col("__lost").isNull.as("kept"))
  }

  /** TWO-LEVEL IVF ANN search — the search-side answer to the flat
    * quantizer's scale wall (and the ANN sibling of
    * [[semanticDedupTwoLevel]], sharing its exact assignment structure):
    * a FLAT inverted file needs cells ∝ corpus to keep cell size
    * constant, which makes assignment n·k dot products (the measured
    * n²/40 regime that exempts the `% 40`-init gates from decade runs).
    * Here a vector scores `k1` trained coarse centroids, then ONLY the
    * `finePerCell` fine centroids of its own coarse cell —
    * O(n·(k1 + finePerCell)) assignment with BOTH knobs constants, and
    * every broadcast (k1 coarse rows, ≤ k1·finePerCell fine rows) is
    * model-sized at any corpus size.
    *
    * Probes route the same way: top-`coarseProbe` coarse cells, then
    * top-`fineProbe` fine cells within each probed coarse cell, and only
    * the matching (ccid, fid) corpus rows are scored exactly — per-probe
    * candidate work is coarseProbe·fineProbe·avgFineCell. With the
    * corpus split over ~k1·finePerCell fine cells, re-tier the two knobs
    * ~√cells as the corpus grows (the [[semanticDedupTwoLevel]] rule) to
    * hold both assignment and candidate volume linear.
    *
    * Fine centroids are real member vectors (smallest `finePerCell` LCG
    * priorities per coarse cell — [[graft.operators.TrainShuffle
    * .lcgPrio]], engine-portable, tie-free); fine-level ranking (both
    * corpus assignment and probe routing) quantizes the cosine to 6
    * decimals with a fid tie-break, the [[contrastiveTriplets]]
    * FP-noise rationale. Coarse ranking is raw-score with a cid
    * tie-break ([[ivfTopK]]'s convention).
    *
    * @return (probe_id, nbr_id, score, rank) edges, rank ≤ k per probe
    */
  def ivfTopKTwoLevel(corpus: DataFrame, probes: DataFrame,
                      idCol: String, probeIdCol: String, vecCol: String,
                      coarseInit: DataFrame, coarseIdCol: String,
                      finePerCell: Int, k: Int = 10,
                      coarseProbe: Int = 2, fineProbe: Int = 2,
                      coarseRounds: Int = 1, fineSeed: Long = 4242L): DataFrame = {
    require(finePerCell > 0, s"finePerCell must be positive, got $finePerCell")
    require(k >= 1 && coarseProbe >= 1 && fineProbe >= 1,
      s"k/coarseProbe/fineProbe must be >= 1, got $k/$coarseProbe/$fineProbe")
    val v = normalizedCorpus(corpus, idCol, vecCol)
    val cent = trainedCentroids(v, idCol, vecCol, coarseInit, coarseIdCol, coarseRounds)
      .select(col("cid"), col("__cv"), vnorm(col("__cv")).as("__cn"))
      .where(col("__cn") > 0)
      .localCheckpoint(false) // corpus assignment AND probe routing read it
    // corpus → coarse cell (raw-score top-1, the assignCells shape)
    val wC = Window.partitionBy(idCol).orderBy(col("__score").desc, col("cid").asc)
    val casn = v.crossJoin(broadcast(cent))
      .withColumn("__score", vdot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      .withColumn("__rn", row_number().over(wC)).where(col("__rn") === 1)
      .select(col(idCol), col("__v"), col("__n"), col("cid").as("ccid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fine centroids: finePerCell members per coarse cell by LCG priority
    // (WindowGroupLimit pre-reduces map-side — k1 groups, never a wall)
    val wSel = Window.partitionBy("ccid").orderBy(col("__prio").asc)
    val fine = casn
      .withColumn("__prio", graft.operators.TrainShuffle.lcgPrio(col(idCol), fineSeed))
      .withColumn("__rn", row_number().over(wSel)).where(col("__rn") <= finePerCell)
      .select(col("ccid"), col(idCol).as("fid"), col("__v").as("__fv"), col("__n").as("__fn"))
      .localCheckpoint(false) // corpus fine-assignment AND probe routing
    // corpus → fine cell within its coarse cell (quantized, fid tie-break)
    val wF = Window.partitionBy(idCol).orderBy(round(col("__fs"), 6).desc, col("fid").asc)
    val fasn = casn.join(broadcast(fine), Seq("ccid"))
      .withColumn("__fs", vdot(col("__v"), col("__fv")) / (col("__n") * col("__fn")))
      .withColumn("__rn", row_number().over(wF)).where(col("__rn") === 1)
      .select(col(idCol).as("nbr_id"), col("ccid"), col("fid"),
        col("__v").as("__cv2"), col("__n").as("__cn2"))
    // probe routing: top-coarseProbe coarse cells …
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv0"),
      vnorm(col(vecCol)).as("__pn0")).where(col("__pn0") > 0)
    val wPC = Window.partitionBy("probe_id").orderBy(col("__cs").desc, col("cid").asc)
    val pcc = p.crossJoin(broadcast(cent))
      .withColumn("__cs", vdot(col("__pv0"), col("__cv")) / (col("__pn0") * col("__cn")))
      .withColumn("__rn", row_number().over(wPC)).where(col("__rn") <= coarseProbe)
      .select(col("probe_id"), col("__pv0"), col("__pn0"), col("cid").as("ccid"))
    // … then top-fineProbe fine cells within each probed coarse cell
    val wPF = Window.partitionBy("probe_id", "ccid")
      .orderBy(round(col("__fs"), 6).desc, col("fid").asc)
    val pf = pcc.join(broadcast(fine), Seq("ccid"))
      .withColumn("__fs", vdot(col("__pv0"), col("__fv")) / (col("__pn0") * col("__fn")))
      .withColumn("__rn", row_number().over(wPF)).where(col("__rn") <= fineProbe)
      .select(col("probe_id"), col("__pv0").as("__pv"), col("__pn0").as("__pn"),
        col("ccid"), col("fid"))
    // exact scoring of the probed fine cells only; the probe-cell frame
    // is probe-bounded, so the (bucketable) corpus side never shuffles
    val cand0 = fasn.join(broadcast(pf), Seq("ccid", "fid"))
    val scored = (if (idCol == probeIdCol)
        cand0.where(col("nbr_id") =!= col("probe_id")) else cand0)
      .select(col("probe_id"), col("nbr_id"),
        (vdot(col("__cv2"), col("__pv")) / (col("__cn2") * col("__pn"))).as("score"))
    val wTop = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    val res = scored.withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
      .localCheckpoint(true) // probe-bounded; release the assignment cache
    casn.unpersist(blocking = false)
    res
  }

  /** Per-dimension [lo, hi] quantization bounds over a corpus — the
    * train step of SQ8 scalar quantization ([[sq8Encode]]). One
    * posexplode aggregate with dim-keyed map-side partials; the output
    * is dim rows — model-sized at any corpus size. */
  def sq8Bounds(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy("dim").agg(min(col("__x").cast("double")).as("lo"),
        max(col("__x").cast("double")).as("hi"))

  /** SQ8 scalar quantization: each float coordinate → an int in [0, 255]
    * by per-dimension affine mapping q = round(255·(x − lo)/(hi − lo)),
    * clamped (probes may fall outside the trained bounds; a degenerate
    * dimension hi = lo maps to 0). The FAISS-style memory tier one up
    * from PQ: 4× smaller than float32 with near-exact recall, and —
    * unlike float arithmetic — every downstream dot product is EXACT
    * integer math, so rankings are engine-reproducible by construction.
    * Map-only behind the dim-sized bounds broadcast.
    *
    * @return (idCol, qv: Array[Long] of dim entries in 0..255) */
  def sq8Encode(df: DataFrame, idCol: String, vecCol: String,
                bounds: DataFrame): DataFrame = {
    val b = bounds.groupBy().agg(
      array_sort(collect_list(struct(col("dim"), col("lo"), col("hi")))).as("__bs"))
    df.crossJoin(broadcast(b))
      .select(col(idCol), transform(sequence(lit(0), size(col(vecCol)) - 1), d => {
        val e = element_at(col("__bs"), d + 1)
        val lo = e.getField("lo")
        val hi = e.getField("hi")
        when(hi > lo,
          least(greatest(
            round(lit(255.0) * (element_at(col(vecCol), d + 1).cast("double") - lo)
              / (hi - lo)).cast("long"), lit(0L)), lit(255L)))
          .otherwise(lit(0L))
      }).as("qv"))
  }

  /** Top-k cosine search in SQ8 space: bounds trained on the corpus,
    * both sides encoded, numerator an exact integer fold and ONE closed
    * float op (÷ √·√) per pair at the end — the engine-portable float
    * discipline. Same scan shape as [[bruteForceTopK]] (probe side
    * broadcast, corpus map-only, WindowGroupLimit top-k): this is the
    * memory-bounded exact-scan tier — 1 byte/coord lets a 100 TB float
    * corpus scan from a 25 TB code table — where [[graft.functions
    * .PqOps.ivfPqTopK]] is the sublinear-scan tier below it.
    *
    * @return (probe_id, nbr_id, rank), rank 1..k by quantized cosine */
  def sq8TopK(corpus: DataFrame, probes: DataFrame,
              idCol: String, probeIdCol: String, vecCol: String,
              k: Int = 10): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val bounds = sq8Bounds(corpus, vecCol)
    def qnorm(c: Column): Column = aggregate(c, lit(0L), (a, x) => a + x * x)
    val qc = sq8Encode(corpus, idCol, vecCol, bounds)
      .select(col(idCol).as("nbr_id"), col("qv").as("__qc"))
      .withColumn("__nc", qnorm(col("__qc"))).where(col("__nc") > 0)
    val qp = sq8Encode(probes, probeIdCol, vecCol, bounds)
      .select(col(probeIdCol).as("probe_id"), col("qv").as("__qp"))
      .withColumn("__np", qnorm(col("__qp"))).where(col("__np") > 0)
    val cand = qc.crossJoin(broadcast(qp))
    val filtered = if (idCol == probeIdCol)
      cand.where(col("nbr_id") =!= col("probe_id")) else cand
    val scored = filtered.select(col("probe_id"), col("nbr_id"),
      (aggregate(zip_with(col("__qc"), col("__qp"), (x, y) => x * y),
        lit(0L), (a, x) => a + x).cast("double")
        / (sqrt(col("__nc").cast("double")) * sqrt(col("__np").cast("double"))))
        .as("score"))
    val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("probe_id"), col("nbr_id"), col("rank").cast("int").as("rank"))
  }

  /** Incremental [[semanticDedup]]: absorb a batch of NEW vectors against
    * a persisted assignment store without rescanning the corpus — the
    * ingestion shape at 100 TB (the embedding analog of
    * [[DedupOps.incrementalMinhashDedup]]).
    *
    * The quantizer is FROZEN at ingest time (centroids are parameters, not
    * state — retraining would reassign the whole store, i.e. a batch job,
    * not an increment). Work is O(increment × cell density): new vectors
    * are assigned map-side against the broadcast centroids, the store is
    * semi-joined down to the cells the increment touches (the touched-cid
    * set is increment-bounded and broadcast — left to the planner, a
    * sort-merge semi-join would shuffle the entire store), and cosine
    * pairs are scored within those cells only. A new vector is dropped if
    * it matches ANY store vector; within the batch, min-id wins.
    *
    * @param store (idCol, vecCol, "cid") — previously kept vectors with
    *              their cell assignment (bucket it by "cid" on disk via
    *              TableStore.saveBucketed for shuffle-free reuse)
    * @return (survivors with their "cid", updated store)
    */
  def semanticDedupIncrement(newVecs: DataFrame, idCol: String, vecCol: String,
                             store: DataFrame, centroids: DataFrame, centroidIdCol: String,
                             threshold: Double = 0.9): (DataFrame, DataFrame) = {
    GraftFunctions.register(newVecs.sparkSession)
    val cent = centroids.select(col(centroidIdCol).as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("__cv"))
    // cid-keyed fan-out: the increment arrives as 1-2 AQE-coalesced
    // partitions, so the intra-cell pair scans below would explode inside
    // 1-2 tasks (measured: q240 6.8→5.6 s, q168 9.2→6.6 s; the BATCH
    // semanticDedup was measured NOT to benefit and keeps its shape)
    val newAsn = fanOutSmallBy(
        assignCells(normalizedCorpus(newVecs, idCol, vecCol), idCol, cent),
        col("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = newAsn.select("cid").distinct()
    val storeTouched = store
      .join(broadcast(touched), Seq("cid"), "left_semi")
      .select(col("cid"), col(idCol).as("id_b"), col(vecCol).as("__vb"),
        vnorm(col(vecCol)).as("__nb"))
    val newA = newAsn.select(col("cid"), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    def cos = vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
    val dropVsStore = newA.join(storeTouched, Seq("cid"))
      .where(cos >= threshold).select(col("id_a").as("drop_id"))
    val newB = newAsn.select(col("cid"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val dropInBatch = newA.join(newB, Seq("cid"))
      .where(col("id_a") < col("id_b")).where(cos >= threshold)
      .select(col("id_b").as("drop_id"))
    // increment-bounded; checkpoint so the returned frames outlive the
    // persist below (same discipline as incrementalMinhashDedup)
    val dropIds = dropVsStore.union(dropInBatch).distinct().localCheckpoint(true)
    val keptAsn = newAsn.select(col(idCol), col("cid"))
      .join(dropIds, newAsn(idCol) === dropIds("drop_id"), "left_anti")
      .localCheckpoint(true)
    newAsn.unpersist(blocking = false)
    val survivors = newVecs.join(keptAsn, Seq(idCol))
    val updatedStore = store.unionByName(
      survivors.select(col(idCol), col(vecCol), col("cid")))
    (survivors, updatedStore)
  }

  /** Embedding-cosine near-duplicate pairs (brute force within SRP buckets
    * — the embedding analog of MinHash dedup). SRP blocking has high
    * recall only for genuinely near-identical vectors (threshold ≳ 0.9);
    * `nBits = 0` disables blocking for an exact all-pairs pass.
    *
    * `bands > 1` is the scale path: the nBits SRP bits split into `bands`
    * contiguous chunks and a pair is a candidate when ANY chunk matches
    * exactly — the pigeonhole blocking of the SimHash pair finder
    * (DedupOps.simhashPairs) applied in embedding space. Recall is
    * GUARANTEED for pairs within bucket hamming distance `bands - 1`
    * (≤ bands-1 differing bits touch ≤ bands-1 chunks, so one chunk is
    * clean); near-identical vectors disagree on an SRP bit only when a
    * hyperplane passes between them, so high thresholds sit well inside
    * that guarantee. Each band key carries nBits/bands bits, so candidate
    * volume scales ~ bands · n²/2^(nBits/bands) — one (band, key) shuffle,
    * no all-pairs stage.
    *
    * DEFAULTS are the srp21 configuration (63 bits × 3 bands → 21-bit
    * band keys, 2^21 buckets per band): the decade-validated deployment
    * regime — band occupancy stays < 1 up to millions of vectors, so
    * candidate volume tracks ~ n where few-bit single-band configs have
    * gone quadratic, and ScaleProbe measured it faster at every decade
    * with ≤ 0.0025% planted-pair loss at threshold 0.9 (199995/200000
    * recovered at sf10). Recall guarantee: collision in ≥ 1 band for
    * any pair within 2 differing SRP bits of 63 — near-identical
    * vectors sit well inside. Small corpora that want an exact pass
    * still set `nBits = 0`.
    *
    * COMPATIBILITY NOTE (defaults changed in round 10): both defaults
    * moved together, nBits 8→63 AND bands 1→3. A caller that passes
    * `nBits` explicitly but relies on the bands default must now pass a
    * multiple of 3 (or set `bands = 1` explicitly) — e.g. the old
    * `nBits = 8` alone now fails the divisibility `require` below
    * rather than silently running a different banding. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, nBits: Int = 63,
                        bands: Int = 3): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require(bands >= 1, s"bands must be >= 1, got $bands")
    // nBits = 0 is the explicit exact-all-pairs switch: it overrides the
    // (defaulted) banding entirely rather than fighting the divisibility
    // rule, so `nBits = 0` keeps meaning "no blocking" under any bands
    val nb = if (nBits == 0) 1 else bands
    require(nb == 1 || (nBits > 0 && nBits % nb == 0),
      s"nBits ($nBits) must be a positive multiple of bands ($nb)")
    val bucket = if (nBits == 0) lit(0L) else srpBucket(col(vecCol), nBits)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("__v"),
      vnorm(col(vecCol)).as("__n"), bucket.as("bucket"))
      .where(col("__n") > 0) // zero-norm → NaN cosine, see bruteForceTopK
    if (nb == 1) {
      val a = v.select(col("bucket"), col("id").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
      val b = v.select(col("bucket"), col("id").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
      // each pair shares exactly one bucket (both rows carry ONE bucket key),
      // so the join emits it once — no dedup shuffle needed
      a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cos"))
        .where(col("cos") >= threshold)
    } else {
      val r = nBits / bands
      val bandKeys = array((0 until bands).map { i =>
        struct(lit(i).as("band"),
          shiftright(col("bucket"), i * r).bitwiseAND(lit((1L << r) - 1)).as("key"))
      }: _*)
      val e = v.select(col("id"), col("__v"), col("__n"), explode(bandKeys).as("bk"))
        .select(col("id"), col("__v"), col("__n"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val a = e.select(col("band"), col("key"), col("id").as("id_a"),
        col("__v").as("__va"), col("__n").as("__na"))
      val b = e.select(col("band"), col("key"), col("id").as("id_b"),
        col("__v").as("__vb"), col("__n").as("__nb"))
      // a pair may match on several bands: score in the band join (only
      // threshold survivors reach the dedup), then collapse duplicates
      a.join(b, Seq("band", "key")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (vdot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cos"))
        .where(col("cos") >= threshold)
        .dropDuplicates("id_a", "id_b")
    }
  }

  /** GROUP-CENTROID cosine map — the source-similarity matrix that drives
    * mixture design (two sources whose embedding centroids nearly
    * coincide are redundant in a data mix; a source near nothing is the
    * diversity outlier). All arithmetic until the final cosine division
    * is EXACT INTEGERS: embeddings quantize to milli units
    * (`round(x·1000)`, the q120 convention), centroid SUMS per (group,
    * dim) are integer aggregates — order-independent, unlike float mean
    * vectors — and dots/norms fold those sums, so any engine reproduces
    * the micro-rounded cosine bit-for-bit.
    *
    * Scale shape: one (group, dim)-keyed corpus aggregate (map-side
    * partials), then everything is MODEL-sized — the centroid table is
    * groups × dims rows, the pair join G²·dims/2. Unnormalized sums (not
    * means) are deliberate: cosine is scale-invariant, so dividing by the
    * group count would only launder exactness through a float.
    *
    * @return (g_a, g_b, cos_micro), g_a < g_b
    */
  def groupCentroidCosines(df: DataFrame, groupCol: String,
                           vecCol: String): DataFrame = {
    val q = df.select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("g"), col("dim"),
        round(col("x").cast("double") * 1000).cast("long").as("qv"))
    val sums = q.groupBy("g", "dim").agg(sum("qv").as("s"))
      .localCheckpoint(false) // feeds the norms AND both pair-join sides
    val norms = sums.groupBy("g").agg(sum(col("s") * col("s")).as("n2"))
    val a = sums.select(col("g").as("g_a"), col("dim"), col("s").as("sa"))
    val b = sums.select(col("g").as("g_b"), col("dim"), col("s").as("sb"))
    a.join(b, Seq("dim")).where(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b").agg(sum(col("sa") * col("sb")).as("dot"))
      .join(broadcast(norms.select(col("g").as("g_a"), col("n2").as("na"))), Seq("g_a"))
      .join(broadcast(norms.select(col("g").as("g_b"), col("n2").as("nb"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"),
        round(lit(1e6) * col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .cast("long").as("cos_micro"))
  }
}
