package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Seed-classifier data selection — the two published families used to
  * filter LLM pretraining corpora against a trusted seed set, in their
  * SQL-auditable bag-of-words forms:
  *
  *   - [[naiveBayesLogOdds]]: a multinomial Naive Bayes quality
  *     classifier trained on a labeled seed subset and applied to the
  *     whole corpus (the "classifier trained on a high-quality reference
  *     corpus" filter of CCNet / the GPT-3 data work, with NB standing in
  *     for their linear models so every weight is a closed-form count
  *     ratio an external SQL engine can re-derive).
  *   - [[dsirLogWeights]]: Data Selection via Importance Resampling
  *     (Xie et al., arXiv:2302.03169): hashed bag-of-ngram features, per
  *     document importance log-weight = Σ counts·(ln p̂_target − ln p̂_raw),
  *     resampled via deterministic Gumbel top-k.
  *
  * Scale shape (both): one exploded token pass over the corpus (shareable
  * with vocab/tokenize/surprise passes — callers persist it), aggregates
  * whose state is model-sized (vocab × 2 counts for NB, `buckets` cells
  * for DSIR — never corpus-sized), the model broadcast back for a
  * map-side join, and one per-doc sum. Nothing all-pairs, no driver
  * loops; the only global ordering is DSIR's Gumbel top-k, which Spark
  * executes as TakeOrderedAndProject (per-partition heap of k, driver
  * merge of partition heads — k-bounded, not corpus-bounded).
  */
object ClassifierOps {

  /** Train multinomial NB with Laplace smoothing `alpha` on the seed rows
    * and score EVERY document in `occ` with the class log-odds
    * (including the seed's class prior). Words unseen in the seed fall
    * back to the smoothed-zero likelihood ratio ln(tn+αV) − ln(tp+αV).
    *
    * @param occ   one row per token occurrence: (idCol, wordCol) — the
    *              [[VocabOps.explodeTokens]] frame; persist it if shared
    * @param seed  labeled training docs: (idCol, labelCol: boolean);
    *              must contain both classes — a one-class seed fails
    *              only at action time, as an opaque ANSI DIVIDE_BY_ZERO
    *              from inside the prior that names nothing useful (with
    *              ANSI off: silent ±Infinity scores).
    *              Pass `validate = true` to fail loudly instead: it
    *              forces the model-path precondition check at call time
    *              (one extra model-sized aggregate action — the price of
    *              the check; the default stays lazily composable, same
    *              contract as [[naiveBayesModel]]'s require)
    * @return (idCol, "log_odds": double) for every doc present in `occ`
    */
  def naiveBayesLogOdds(occ: DataFrame, idCol: String, wordCol: String,
                        seed: DataFrame, labelCol: String,
                        alpha: Double = 0.5, validate: Boolean = false): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val y = col("__y")
    val seedLab = seed.select(col(idCol), col(labelCol).cast("boolean").as("__y"))

    // vocab × 2 class counts from the seed slice of the occurrence frame
    val counts = occ.join(seedLab, Seq(idCol))
      .groupBy(wordCol)
      .agg(sum(when(y, 1L).otherwise(0L)).as("cp"),
        sum(when(!y, 1L).otherwise(0L)).as("cn"))
    if (validate) {
      val t = counts.agg(sum("cp"), sum("cn")).head()
      require(!t.isNullAt(0) && t.getLong(0) > 0 && t.getLong(1) > 0,
        "seed must contribute tokens of BOTH classes to the occurrence frame " +
          s"(got pos=${if (t.isNullAt(0)) 0 else t.getLong(0)}, " +
          s"neg=${if (t.isNullAt(1)) 0 else t.getLong(1)})")
    }
    // single-row totals: class token masses + vocab size (words seen in
    // the seed — the Laplace support, matching the standard formulation)
    val tot = counts.agg(sum("cp").as("tp"), sum("cn").as("tn"),
      count(lit(1)).cast("long").as("v"))
    // single-row class prior from seed DOC counts
    val prior = seedLab.agg(
      log(sum(when(y, 1.0).otherwise(0.0)) / sum(when(y, 0.0).otherwise(1.0)))
        .as("__prior"))

    val llr: Column =
      log((col("cp") + alpha) / (col("tp") + col("v") * alpha)) -
        log((col("cn") + alpha) / (col("tn") + col("v") * alpha))
    val unseenLlr: Column =
      log(col("tn") + col("v") * alpha) - log(col("tp") + col("v") * alpha)

    val model = counts.crossJoin(broadcast(tot))
      .select(col(wordCol), llr.as("__llr"))
    occ
      .join(broadcast(model), Seq(wordCol), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol), coalesce(col("__llr"), unseenLlr).as("__term"))
      .groupBy(idCol).agg(sum("__term").as("__sum"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), (col("__sum") + col("__prior")).as("log_odds"))
  }

  /** Train the NB model and hand it back AS DATA — the shape a
    * stream-static scoring join needs: a (wordCol, "__llr") frame to
    * broadcast, plus the unseen-word default and the class prior as
    * scalars (two driver actions on MODEL-sized aggregates — training
    * is a batch step; only scoring has to stay fully distributed).
    * Same counts and smoothing as [[naiveBayesLogOdds]]. */
  def naiveBayesModel(occ: DataFrame, idCol: String, wordCol: String,
                      seed: DataFrame, labelCol: String,
                      alpha: Double = 0.5): (DataFrame, Double, Double) = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val y = col("__y")
    val seedLab = seed.select(col(idCol), col(labelCol).cast("boolean").as("__y"))
    val counts = occ.join(seedLab, Seq(idCol))
      .groupBy(wordCol)
      .agg(sum(when(y, 1L).otherwise(0L)).as("cp"),
        sum(when(!y, 1L).otherwise(0L)).as("cn"))
    val totRow = counts.agg(sum("cp"), sum("cn"), count(lit(1))).head()
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0 && totRow.getLong(1) > 0,
      "seed must contribute tokens of BOTH classes to the occurrence frame " +
        s"(got pos=${if (totRow.isNullAt(0)) 0 else totRow.getLong(0)}, " +
        s"neg=${if (totRow.isNullAt(1)) 0 else totRow.getLong(1)})")
    val Seq(tp, tn, v) = totRow.toSeq.map(_.toString.toDouble)
    val prior = {
      val r = seedLab.agg(sum(when(y, 1.0).otherwise(0.0)),
        sum(when(y, 0.0).otherwise(1.0))).head()
      math.log(r.getDouble(0) / r.getDouble(1))
    }
    val model = counts.select(col(wordCol),
      (log((col("cp") + alpha) / (tp + v * alpha)) -
        log((col("cn") + alpha) / (tn + v * alpha))).as("__llr"))
    val unseen = math.log(tn + v * alpha) - math.log(tp + v * alpha)
    (model, unseen, prior)
  }

  /** Score an occurrence frame — batch OR STREAMING — against a trained
    * [[naiveBayesModel]]: broadcast model join (stream-static joins
    * admit exactly this shape), literal fallback for unseen words, one
    * per-doc aggregation. On a stream the groupBy is a streaming
    * aggregation (update/complete semantics — each doc's score finalizes
    * once its tokens' micro-batch is processed). */
  def scoreWithModel(occ: DataFrame, idCol: String, wordCol: String,
                     model: DataFrame, unseenLlr: Double, prior: Double): DataFrame =
    occ.join(broadcast(model), Seq(wordCol), "left")
      .select(col(idCol), coalesce(col("__llr"), lit(unseenLlr)).as("__term"))
      .groupBy(idCol)
      .agg((sum("__term") + prior).as("log_odds"))

  /** DSIR importance log-weights: hashed-unigram bag features over
    * `buckets` cells, target distribution fitted on the docs in `target`
    * (semi-join on idCol), raw distribution on all of `occ`, both
    * Laplace-smoothed by `alpha`. Returns every doc's importance
    * log-weight Σ_tokens ln(p̂_target[b]/p̂_raw[b]).
    */
  def dsirLogWeights(occ: DataFrame, idCol: String, wordCol: String,
                     target: DataFrame, buckets: Int = 512,
                     alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // hash60 is a 60-bit non-negative md5 prefix, so % == pmod and an
    // external engine can replicate the bucketing from md5 alone
    val b = occ.select(col(idCol),
      (DedupOps.hash60(col(wordCol)) % buckets).as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = dsirModelFromBucketed(b, idCol, target, buckets, alpha)
    // checkpoint-then-unpersist (the semanticDedupIncrement convention):
    // the result is per-doc — bounded, far smaller than the bucketed
    // occurrence frame — so materializing it here lets this call release
    // its own cache instead of leaking it into the caller's session
    val out = b.join(broadcast(model), Seq("__b"))
      .groupBy(idCol).agg(sum("__lw").as("log_weight"))
      .localCheckpoint(true)
    b.unpersist(blocking = false)
    out
  }

  /** The DSIR cell model AS DATA: (`__b`: bucket, `__lw`: per-occurrence
    * log-weight), `buckets` rows — the bounded store a scoring stage
    * (batch or streaming) loads/joins/folds. Same counts and smoothing
    * as [[dsirLogWeights]], which is exactly `Σ __lw` over a doc's
    * bucketed tokens. */
  def dsirModel(occ: DataFrame, idCol: String, wordCol: String,
                target: DataFrame, buckets: Int = 512,
                alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    dsirModelFromBucketed(
      occ.select(col(idCol), (DedupOps.hash60(col(wordCol)) % buckets).as("__b")),
      idCol, target, buckets, alpha)
  }

  private def dsirModelFromBucketed(b: DataFrame, idCol: String, target: DataFrame,
                                    buckets: Int, alpha: Double): DataFrame = {
    val raw = b.groupBy("__b").agg(count(lit(1)).as("cr"))
    val tgt = b.join(target.select(col(idCol)).distinct(), Seq(idCol))
      .groupBy("__b").agg(count(lit(1)).as("ct"))
    // bucket-sized model: ln p̂_t[b] − ln p̂_r[b]; buckets the target never
    // hit still get their smoothed mass via the full outer frame below
    val cells = raw.join(tgt, Seq("__b"), "left")
      .select(col("__b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = cells.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    cells.crossJoin(broadcast(tot))
      .select(col("__b"),
        (log((col("ct") + alpha) / (col("tt") + alpha * buckets)) -
          log((col("cr") + alpha) / (col("tr") + alpha * buckets))).as("__lw"))
  }

  /** Score WHOLE-DOCUMENT rows against a trained [[dsirModel]] with the
    * model folded into a LITERAL lookup array — a stateless, map-only
    * projection: no join, no aggregation, no state. That is what makes
    * it composable: a document STREAM scored this way can feed a
    * stateful operator (budget admission, dedup) in the SAME streaming
    * query, where the per-token stream-static-join + streaming-
    * aggregation formulation would chain two stateful operators —
    * unsupported around flatMapGroupsWithState. The fold is sound
    * because the DSIR model is CONFIGURATION-bounded: `buckets` doubles
    * (512 cells ≈ 4 KB) regardless of corpus size — the same bounded-
    * model-state argument as the q91 fixed-k quantizer.
    *
    * Batch parity: `dsir_score` ≡ [[dsirLogWeights]]'s `log_weight` for
    * every doc with ≥1 token (spec-asserted); docs with no tokens score
    * 0 here and are absent there (no occurrence rows).
    */
  def dsirScoreDocs(docs: DataFrame, textCol: String, model: DataFrame,
                    buckets: Int = 512): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val weights = {
      val arr = Array.fill(buckets)(0.0)
      model.select(col("__b").cast("int"), col("__lw").cast("double")).collect()
        .foreach(r => arr(r.getInt(0)) = r.getDouble(1))
      array(arr.toIndexedSeq.map(lit): _*)
    }
    docs.withColumn("dsir_score",
      when(length(trim(col(textCol))) === 0, lit(0.0)).otherwise(
        aggregate(
          graft.functions.TextFunctions.tokens(lower(col(textCol))),
          lit(0.0),
          (acc, w) => acc + element_at(weights, (DedupOps.hash60(w) % buckets).cast("int") + 1))))
  }

  /** Gumbel top-k resampling key for [[dsirLogWeights]] output:
    * `log_weight + Gumbel(0,1)` with the noise derived deterministically
    * from the id (md5 → uniform in (0,1) → −ln(−ln u)), so selection is
    * reproducible and externally checkable. Sampling WITHOUT replacement
    * from the softmax of log-weights ≡ taking the k largest such keys. */
  def gumbelKey(id: Column, logWeight: Column): Column = {
    val u = (DedupOps.hash60(id.cast("string")) % 1000000L + lit(0.5)) / 1000000.0
    logWeight + (-log(-log(u)))
  }

  /** Interpolated KNESER–NEY bigram language model TRAINING (Kneser &
    * Ney, ICASSP 1995; Chen & Goodman, 1999 eq. 4.24) with the fixed
    * discount d = 3/4 — the LM family behind CCNet-style perplexity
    * filtering (KenLM trains exactly this, at order 5):
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − d, 0)/c(w₁) + λ(w₁)·P_cont(w₂)
    *   λ(w₁) = d·N₁₊(w₁•)/c(w₁),  P_cont(w₂) = N₁₊(•w₂)/B
    *
    * d = 3/4 makes every term RATIONAL with integer numerators, so the
    * probability is one exact integer expression:
    *   prob_micro = ⌊10⁶·((4·c₁₂ − 3)·B + 3·N₁₊(w₁•)·N₁₊(•w₂))
    *                 / (4·c(w₁)·B)⌋
    * — pure BIGINT arithmetic, engine-exact, no float anywhere.
    * Overflow envelope: 4·10⁶·c₁₂·B < 2⁶³ (c₁₂ ≤ 10⁵ bigram count with
    * B ≤ 5·10⁶ distinct bigrams clears it; corpora beyond that rescale
    * counts first, the [[SketchOps.ksDriftFromHistogram]] discipline).
    *
    * Scale shape: one bigram count aggregate (the [[TextFunctions
    * .pmiPhrases]] map-side tail-zip, no per-doc window), three
    * model-sized aggregates over it (context totals, fan-out counts,
    * continuation counts), one broadcast 1-row B — the model is
    * vocab²-bounded state, the corpus is touched once.
    *
    * @return (w1, w2, c12, c1, n1_fanout, n1_cont, prob_micro) */
  def knBigramModel(df: DataFrame, textCol: String): DataFrame = {
    val t = df.where(trim(col(textCol)) =!= "")
      .select(TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val bg = t.select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"))
        .as("z"))
      .select(col("z.w1"), col("z.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = bg.groupBy("w1").agg(sum("c12").as("c1"),
      count(lit(1)).as("n1_fanout"))
    val cont = bg.groupBy("w2").agg(count(lit(1)).as("n1_cont"))
    val b = bg.agg(count(lit(1)).as("__B"))
    bg.join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(b))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1_fanout"), col("n1_cont"),
        expr("(1000000 * ((4 * c12 - 3) * __B + 3 * n1_fanout * n1_cont)) div (4 * c1 * __B)")
          .as("prob_micro"))
  }

  /** PERPLEXITY SCORING against a [[knBigramModel]] — the CCNet filter
    * read (Wenzek et al., LREC 2020 §3.3: rank documents by LM
    * perplexity, keep the head/middle): per document, the mean negative
    * log-probability of its adjacent token pairs under the model.
    * Backoff ladder for pairs the model never saw: seen bigram → model
    * probability; seen context only → the continuation backoff term
    * (clamped to ≥ 1 micro when the continuation is also novel); novel
    * context → uniform 1/|vocab|. Per-pair log-probs are floored to
    * INTEGER micro units before the per-doc sum, so document scores are
    * exact BIGINT arithmetic — float addition order never moves a rank
    * (the one float per pair is a closed-form ln of an integer ratio).
    *
    * Scale shape: the pair stream joins the model (model-sized,
    * broadcast when it fits) on (w1, w2) and the two marginal tables on
    * 1 key each; one per-doc sum aggregate. The model frame is eagerly
    * checkpointed once — five derived reads (probs, context, cont,
    * B, vocab) reuse it instead of replaying the training aggregate.
    *
    * @return (idCol, n_pairs, ll_sum_micro ≤ 0, avg_nll_micro ≥ 0);
    *         documents with < 2 tokens have no pairs and are absent */
  def knPerplexity(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame): DataFrame = {
    val mm = model.localCheckpoint(true)
    val pairs = docs.where(trim(col(textCol)) =!= "")
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"))
        .as("z"))
      .select(col(idCol), col("z.w1"), col("z.w2"))
    val probs = mm.select("w1", "w2", "prob_micro")
    val ctx = mm.groupBy("w1").agg(max("c1").as("__c1"), max("n1_fanout").as("__nf"))
    val cont = mm.groupBy("w2").agg(max("n1_cont").as("__nc"))
    val b = mm.agg(count(lit(1)).as("__B"))
    val vocab = mm.select(col("w1").as("w"))
      .unionByName(mm.select(col("w2").as("w"))).distinct()
      .agg(count(lit(1)).as("__V"))
    pairs.join(probs, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(b)).crossJoin(broadcast(vocab))
      .withColumn("__p",
        when(col("prob_micro").isNotNull, col("prob_micro"))
          .when(col("__c1").isNotNull, greatest(
            expr("(1000000 * (3 * __nf * coalesce(__nc, 0L))) div (4 * __c1 * __B)"),
            lit(1L)))
          .otherwise(greatest(expr("1000000 div __V"), lit(1L))))
      .withColumn("__lp", expr(
        "cast(floor(1000000.0 * ln(cast(__p AS double) / 1000000.0)) AS long)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__lp")).as("ll_sum_micro"))
      .withColumn("avg_nll_micro", expr("(-ll_sum_micro) div n_pairs"))
  }
}
