package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic data-mixture construction: per-group token-budget
  * sampling.
  *
  * A training-data pipeline rarely takes a corpus whole — it takes "w_s
  * tokens from source s" for a target mixture (Pile-style source weighting;
  * DoReMi, arXiv:2305.10429, optimizes exactly these per-domain token
  * budgets). Given a per-row token count, a per-group budget table, and a
  * deterministic priority (e.g. a hash of the id — NOT arrival order,
  * which is nondeterministic at scale), this selects rows in priority
  * order within each group until the group's token budget is exhausted:
  * `picked = running_sum(tokens) <= budget` (a row that would cross the
  * budget boundary is excluded, as is everything after it).
  *
  * Scale path: the running sum is [[PrefixSum.groupedRunningSum]] — a
  * corpus-sized group ("all of src_web") never lands on one reducer, which
  * is precisely where the naive `Window.partitionBy(source)` dies at
  * 100 TB. The budget table is group-cardinality-sized and broadcast.
  */
object MixtureSample {

  /** @param df          rows to sample; must contain `groupCol`,
    *                    `tokenCol`, `priorityCol`
    * @param groupCol    mixture component key (e.g. source/domain)
    * @param tokenCol    per-row token count (non-negative long)
    * @param priorityCol deterministic selection order within a group;
    *                    numeric, non-null, unique per group (PrefixSum
    *                    requirement — ties would make the prefix ambiguous)
    * @param budgets     one row per group: (budgetGroupCol, budgetCol).
    *                    Groups ABSENT from this table are dropped entirely
    *                    (inner join) — an unlisted source is "not in the
    *                    mixture", not "unlimited"
    * @return the budgeted groups' rows plus a `picked` boolean; rows are
    *         kept whether picked or not so callers can audit what the
    *         budget excluded
    */
  def tokenBudgetSample(df: DataFrame, groupCol: String, tokenCol: String,
                        priorityCol: String, budgets: DataFrame,
                        budgetGroupCol: String, budgetCol: String): DataFrame = {
    val cum = PrefixSum.groupedRunningSum(df, Seq(groupCol), priorityCol, tokenCol, "__cum")
    cum.join(
        broadcast(budgets.select(col(budgetGroupCol).as(groupCol), col(budgetCol).as("__budget"))),
        Seq(groupCol))
      .withColumn("picked", col("__cum") <= col("__budget"))
      .drop("__cum", "__budget")
  }

  /** SYSTEMATIC weighted sampling (the resampling scheme of particle
    * filters — Kitagawa 1996; Douc/Cappé 2005 show it dominates multinomial
    * resampling in variance): lay every row's integer weight end-to-end on
    * a cumulative axis, then take equally-spaced ticks
    * `offset + 1 + j·step`, `step = ceil(W/k)` — a row is selected once
    * per tick inside its weight interval, so
    *
    *   copies_i ∈ { floor(w_i/step), ceil(w_i/step) },  E[copies_i] ∝ w_i
    *
    * and the total draw is exactly `g(W) ≤ k` (k or k−1 by divisibility).
    * EVERYTHING IS INTEGER — no float inverse-CDF, no per-row RNG — so the
    * sample is reproducible on any engine (q119's DuckDB oracle) and
    * stable under repartition. The deterministic tick offset (`step/2`)
    * replaces the classic uniform draw; rows are laid on the axis in
    * md5-LCG priority order, not id order, so adjacency on the axis — the
    * one bias systematic sampling has — is decorrelated from storage
    * order. Training-data use: quality- or length-proportional corpus
    * draws with replacement bounded to ±1 copy of proportionality.
    *
    * Scale shape: ONE [[PrefixSum.groupedRunningSum]] pass (distributed
    * prefix sum — no single-reducer window), a 1-row total cross-joined
    * back in, and a map-only tick count per row.
    *
    * @param weightCol positive integer weights
    * @return input rows + (cum, copies), copies ≥ 1 rows only
    */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
                       k: Long, seed: Long = 99991L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val prio = TrainShuffle.lcgPrio(col(idCol), seed)
    val laid = df.withColumn("__prio", prio).withColumn("__grp", lit(0))
    val cum = PrefixSum.groupedRunningSum(laid, Seq("__grp"), "__prio", weightCol, "cum")
    val tot = cum.groupBy("__grp").agg(max("cum").as("__w"))
    // `div` (not `/`): Column `/` on longs is DOUBLE division — silent
    // precision loss past 2^53 cumulative weight
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    def g(x: Column, offset: Column, step: Column): Column =
      when(x > offset, idiv(x - offset - lit(1L), step) + lit(1L))
        .otherwise(lit(0L)).cast("long")
    cum.join(broadcast(tot), Seq("__grp"))
      .withColumn("__step", idiv(col("__w") + lit(k - 1), lit(k)))
      .withColumn("__off", idiv(col("__step"), lit(2L)))
      .withColumn("copies",
        g(col("cum"), col("__off"), col("__step")) -
          g(col("cum") - col(weightCol), col("__off"), col("__step")))
      .where(col("copies") >= 1)
      .drop("__grp", "__prio", "__w", "__step", "__off")
  }

  /** Temperature-based mixture reweighting (the multilingual α-sampling of
    * XLM-R, arXiv:1911.02116 §3.1, also used for The Pile / LLaMA domain
    * weights): given per-row token counts, compute for each group
    * (source/language/domain)
    *
    *   p_i      = mass_i / Σ mass          (natural share)
    *   q_i      = p_i^α / Σ_j p_j^α        (temperature-flattened share)
    *   weight_i = q_i / p_i                (up/down-sampling factor)
    *   epochs_i = q_i · target / mass_i    (passes over source i needed to
    *                                        fill a `targetTokens` budget)
    *
    * α<1 flattens the mixture toward uniform (boosts low-resource groups),
    * α=1 is natural sampling. The output feeds [[tokenBudgetSample]]
    * (budget_i = q_i·target) or an epoch-replication plan.
    *
    * Scale shape: ONE partial-aggregated `groupBy(group).sum(tokens)` over
    * the corpus; everything after runs on the group table, which is
    * mixture-component-sized (languages/domains: at most thousands) — the
    * unpartitioned windows below are bounded by construction, never
    * corpus-sized.
    *
    * Determinism: with the default α=0.5 every FP op in the chain —
    * sqrt, ×, ÷ — is IEEE-754 correctly-rounded, and the one
    * order-sensitive reduction (Σ p^α) is computed as an ORDERED running
    * sum over the group key, so an ANSI-SQL engine replaying the same
    * op sequence reproduces the doubles BIT-EXACTLY (the q112 DuckDB
    * oracle does). Other α go through `pow`, whose rounding is
    * platform-defined — fine for production, not for hash-exact oracles.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, tokenCol: String,
                         targetTokens: Long, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val mass = df.groupBy(groupCol).agg(sum(col(tokenCol)).cast("long").as("mass"))
    // integer total: order-independent, safe as an unordered window sum
    val whole = Window.partitionBy()
    val run = Window.orderBy(groupCol).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pa: Column => Column =
      if (alpha == 0.5) sqrt else p => pow(p, lit(alpha))
    mass
      .withColumn("p", col("mass").cast("double") / sum("mass").over(whole).cast("double"))
      .withColumn("pa", pa(col("p")))
      // Σ p^α as a running sum in group-key order: sequential left-to-right
      // addition, reproducible by any engine; terms are non-negative so the
      // final prefix (= the full sum) is the max
      .withColumn("z", max(sum("pa").over(run)).over(whole))
      .withColumn("q", col("pa") / col("z"))
      .withColumn("weight", col("q") / col("p"))
      .withColumn("epochs", col("q") * lit(targetTokens.toDouble) / col("mass").cast("double"))
      .drop("pa", "z")
  }

  /** STRATIFIED fixed-k sample: exactly `min(k, |g|)` rows from every
    * group, chosen in deterministic md5-hash order — the "k eval docs
    * per language/source" primitive (uniform within group, reproducible
    * across runs/engines/cluster sizes, no `rand()`).
    *
    * Scale shape: the rank window partitions by GROUP, which can be
    * corpus-sized — but the `row_number ≤ k` filter is recognized by
    * Spark's WindowGroupLimit rule, which inserts a map-side PARTIAL
    * top-k before the shuffle: each task forwards at most k rows per
    * group it sees, so the exchange carries ≤ k·tasks rows per group,
    * never the group. (The plan shows `WindowGroupLimit` below the
    * Exchange — asserted in the spec.)
    *
    * @return input rows with `rk` (1-based hash rank), filtered to ≤ k
    */
  def stratifiedFixedK(df: DataFrame, groupCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(graft.functions.DedupOps.hash60(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** WEIGHTED sampling WITHOUT replacement (Efraimidis–Spirtakis A-ES,
    * IPL 97(5) 2006): each row gets priority u^(1/w) for u ~ U(0,1);
    * the k highest priorities are a weighted sample without replacement
    * — the one-pass, fully parallel scheme (no sequential draw-and-
    * remove), so "sample 10k docs proportional to length" is a single
    * top-k. Complements [[systematicSample]] (with-replacement copies)
    * and [[tokenBudgetSample]] (budget-bounded prefix): this is the
    * exact-k, probability-∝-weight subset.
    *
    * Determinism/engine-portability: u is md5-derived ((52-bit digest
    * prefix + 0.5) / 2^52 — exact doubles on any engine), and the
    * priority is RANK-quantized to an integer `key_micro =
    * floor(1e6·ln(u)/w)` (ln is monotone, so ordering by ln(u)/w ≡
    * ordering by u^(1/w); one closed-form float expression per row, no
    * cross-engine accumulation-order hazard), ties broken by id.
    *
    * Scale shape: `orderBy(...).limit(k)` plans as TakeOrdered — a
    * map-side per-partition top-k then a k-sized merge, never a global
    * sort; weights stay distributed, nothing corpus-sized moves.
    *
    * @param weightCol positive integer/long weight (e.g. token count);
    *                   rows with weight ≤ 0 are FILTERED OUT up front —
    *                   weight 0 has sampling probability 0 but would
    *                   divide by zero (an error under ANSI mode), and a
    *                   negative weight would silently invert the
    *                   priority so the lightest rows win
    * @return the k sampled rows plus their `key_micro` priority
    */
  /** LEAKAGE-SAFE train/val/test split: assign every row to a split by
    * hashing its GROUP (dedup cluster, url domain, …) rather than its id,
    * so near-duplicates and same-origin documents land in the SAME split
    * by construction — the eval-contamination guard (Lee et al. 2022 §6:
    * test-set leakage through train/test near-dups inflates benchmark
    * scores; splitting by cluster is the standard fix).
    *
    * Deterministic and engine-portable: the bucket is
    * [[graft.functions.TextFunctions.hashBucket]] (16-bit md5 prefix) of
    * `salt ⊕ group`, mod 1000 — same row, same split, every engine,
    * every run; re-salting re-draws the split without touching data.
    * Permille thresholds: bucket < testPermille → test, < test+val →
    * val, else train.
    *
    * Scale shape: a narrow per-row projection (one md5 on a short group
    * key) — no shuffle, no model, no join; composes downstream of any
    * clustering that already produced `groupCol`.
    *
    * @return input + (split_bucket, split ∈ {train, val, test}) */
  def leakageSafeSplit(df: DataFrame, groupCol: String,
                       valPermille: Int, testPermille: Int,
                       salt: String = "split"): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0
      && valPermille + testPermille <= 1000,
      s"need val, test >= 0 and val+test <= 1000, got $valPermille/$testPermille")
    val b = graft.functions.TextFunctions.hashBucket(
      concat(lit(salt + ":"), col(groupCol).cast("string")), 1000)
    df.withColumn("split_bucket", b.cast("long"))
      .withColumn("split",
        when(col("split_bucket") < testPermille, lit("test"))
          .when(col("split_bucket") < testPermille + valPermille, lit("val"))
          .otherwise(lit("train")))
  }

  def weightedSampleNoReplacement(df: DataFrame, idCol: String,
                                  weightCol: String, k: Int,
                                  seed: String = "aes"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val m = conv(substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("long")
    val u = (m.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    df.where(col(weightCol) > 0)
      .withColumn("key_micro",
        floor(log(u) / col(weightCol) * lit(1000000.0)).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic weighted sampling WITH replacement — the inverse-CDF
    * draw over a model-sized item table (the mixture-construction
    * primitive [[weightedSampleNoReplacement]] can't provide: with
    * replacement, heavy items repeat in proportion to weight — the
    * SGNS unigram table, upsampling draws, bootstrap resamples). Items
    * get exact integer cumulative intervals [lo, hi) by item order;
    * draw j maps to hash60(salt, j) mod Σw and lands in exactly one
    * interval — every draw md5-reproducible on any engine, partition
    * layout, or cluster size.
    *
    * Scale shape: the interval table is ITEM-sized (sources, vocab
    * buckets, shards — model state; its cumulative window orders items,
    * never data rows) and broadcast into a non-equi interval join
    * against the draw sequence — nDraws × 1 rows out. For item tables
    * too big to broadcast, pre-bucket the intervals by ⌊lo/B⌋..⌊hi/B⌋
    * and equi-join on ⌊draw/B⌋ (the [[graft.operators.RangeJoin]]
    * floor-div discipline); semantics identical.
    *
    * @param items (itemCol, weightCol > 0) — non-positive weights dropped
    * @return (j 0..nDraws−1, itemCol) */
  def weightedDrawsWithReplacement(items: DataFrame, itemCol: String,
                                   weightCol: String, nDraws: Long,
                                   salt: String = "wdraw"): DataFrame = {
    require(nDraws >= 1, s"nDraws must be >= 1, got $nDraws")
    val cum = items.where(col(weightCol) > 0)
      .select(col(itemCol).as("__item"), col(weightCol).cast("long").as("__w"))
      .withColumn("__hi", sum("__w").over(Window.orderBy("__item")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", col("__hi") - col("__w"))
    val total = cum.agg(max("__hi").as("__tot"))
    items.sparkSession.range(nDraws).select(col("id").as("j"))
      .crossJoin(broadcast(total))
      .withColumn("__d", pmod(graft.functions.DedupOps.hash60(
        concat_ws(",", lit(salt), col("j"))), col("__tot")))
      .join(broadcast(cum), col("__d") >= col("__lo") && col("__d") < col("__hi"))
      .select(col("j"), col("__item").as(itemCol))
  }
}
