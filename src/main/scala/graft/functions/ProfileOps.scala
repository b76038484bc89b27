package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling at two fidelities: exact (oracle-verifiable, used by
  * q35/q36) and sketched (the 100 TB path — HyperLogLog++ cardinalities
  * and KLL-style quantiles in fixed memory, one pass, mergeable across
  * partitions). At scale the exact variants are the wrong tool: exact
  * distinct shuffles every value and exact percentile sorts the column;
  * the sketches are O(1) memory per group and merge map-side.
  *
  * Cache ownership: [[groupOverlap]]'s internal persist backs its lazy
  * result — the caller owns its lifetime (clearCache / unpersist once
  * consumed), the same contract as the batch DedupOps operators.
  */
object ProfileOps {

  /** Exact per-group distinct + count profile (q35's shape). */
  def distinctProfile(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(countDistinct(col(idCol)).as("n_distinct"), count(lit(1)).as("n_rows"))

  /** Sketched profile: HLL++ distinct (rsd-bounded) — the same answer
    * shape as [[distinctProfile]] in fixed memory per group. */
  def approxDistinctProfile(df: DataFrame, groupCol: String, idCol: String,
                            rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(col(idCol), rsd).as("n_distinct"),
        count(lit(1)).as("n_rows"))

  /** Sketched per-group quantiles (KLL-style, `accuracy` controls error). */
  def approxPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                        percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(percentiles.map(lit): _*)
    df.groupBy(groupCol)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("p"))
  }

  /** EXACT quantiles of an integer column in two bounded-memory passes —
    * no global sort, no single-reducer window, unlike the textbook
    * `row_number() OVER (ORDER BY v)` plan that ships the corpus to one
    * task. The k-th smallest (k = ceil(q·n), 1-based — "the smallest v
    * with at least k values ≤ it") is located by:
    *
    *   1. ONE aggregate keyed by `v div bucketWidth` — a fixed-width
    *      histogram (no min/max pre-pass needed; buckets are sparse);
    *      cumulative counts over the bucket table (≤ range/width rows,
    *      bounded by construction) find each quantile's boundary bucket
    *      and the residual rank within it;
    *   2. ONE filtered aggregate over ONLY the boundary buckets' values
    *      (≈ n·width/range rows) — per-value counts, cumulative, pick.
    *
    * Everything is integer counts — deterministic on any engine. Results
    * for all requested quantiles come from the same two passes.
    *
    * @param qs quantiles in (0, 1], basis points not required
    * @return (q_bp, k, value) per requested quantile, q_bp = q·10000
    */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                     bucketWidth: Long = 1L << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles $qs")
    require(bucketWidth >= 1, s"bad bucketWidth $bucketWidth")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(valueCol).cast("long").as("v"))
    val buckets = v.groupBy(expr(s"v div $bucketWidth").as("b"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets
      .withColumn("cumc", sum("c").over(wb))
      .withColumn("n", max(sum("c").over(wb)).over(Window.partitionBy()))
    val qdf = spark.createDataFrame(
      qs.map(q => Tuple1(math.round(q * 10000).toInt))).toDF("q_bp")
    // k = ceil(q·n) in integer arithmetic: (q_bp·n + 9999) div 10000
    val ks = cum.crossJoin(broadcast(qdf))
      .withColumn("k", expr("(CAST(q_bp AS BIGINT) * n + 9999) div 10000"))
      .where(col("cumc") >= col("k") && col("cumc") - col("c") < col("k"))
      .select(col("q_bp"), col("k"), col("b"), (col("k") - (col("cumc") - col("c"))).as("kin"))
    val wv = Window.partitionBy("q_bp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.join(broadcast(ks), expr(s"v div $bucketWidth") === ks("b"))
      .groupBy("q_bp", "k", "kin", "v").agg(count(lit(1)).as("vc"))
      .withColumn("cumv", sum("vc").over(wv))
      .where(col("cumv") >= col("kin") && col("cumv") - col("vc") < col("kin"))
      .select(col("q_bp"), col("k"), col("v").as("value"))
  }

  /** Cross-group content-overlap matrix over word-n-gram shingles — the
    * "how much does source A duplicate source B" report that decides which
    * crawl dumps are worth keeping (and the inter-source half of a
    * train/eval contamination audit).
    *
    * Shape: distinct (group, shingle-hash) pairs, a self-join on the
    * 8-byte hash, one aggregate per group pair. The join's fan-out per
    * shingle is bounded by `maxGroupFreq`: a shingle present in more than
    * that many groups (boilerplate headers, licence lines) is dropped
    * BEFORE the join — the same hot-key guard as the PPJoin path
    * (DedupOps.ngramJaccardPairs), because a ubiquitous shingle otherwise
    * contributes |groups|²/2 pairs on its own. Reported overlap is the
    * integer-basis-point overlap coefficient
    * `shared * 10000 div min(|A|, |B|)` — integer-exact, oracle-stable.
    *
    * @param maxGroupFreq drop shingles present in more than this many
    *                     groups (0 disables the guard)
    */
  def groupOverlap(df: DataFrame, textCol: String, groupCol: String,
                   n: Int = 3, maxGroupFreq: Int = 0): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    // persisted: the distinct (group, hash) set feeds the guard, both join
    // sides, and the size aggregate — without it the tokenize+explode+
    // distinct shuffle would re-run four times
    val ex = df
      .select(col(groupCol).as("grp"), explode(DedupOps.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val guarded =
      if (maxGroupFreq <= 0) ex
      else {
        val hot = ex.groupBy("h").agg(count(lit(1)).as("__gf"))
          .where(col("__gf") > maxGroupFreq).select("h")
        // hot list is ≤ distinct-shingles/maxGroupFreq rows — small on
        // natural corpora (few shingles recur across most groups), which
        // is why the broadcast matches the DedupOps guards. CAVEAT: the
        // bound is corpus-relative, not configuration-bounded; a
        // boilerplate-dominated corpus where a large shingle fraction
        // crosses maxGroupFreq should drop the hint and let the anti-join
        // shuffle (AQE still broadcasts it whenever it is actually small)
        ex.join(broadcast(hot), Seq("h"), "left_anti")
      }
    val sizes = guarded.groupBy("grp").agg(count(lit(1)).as("sz"))
    val a = guarded.select(col("h"), col("grp").as("grp_a"))
    val b = guarded.select(col("h"), col("grp").as("grp_b"))
    a.join(b, Seq("h")).where(col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b").agg(count(lit(1)).as("shared"))
      .join(broadcast(sizes.select(col("grp").as("grp_a"), col("sz").as("sz_a"))), Seq("grp_a"))
      .join(broadcast(sizes.select(col("grp").as("grp_b"), col("sz").as("sz_b"))), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("shared"), col("sz_a"), col("sz_b"),
        expr("(shared * 10000) div least(sz_a, sz_b)").as("overlap_bp"))
  }

  /** Per-group [[exactQuantiles]] — the same two-bounded-passes scheme
    * (fixed-width histogram → boundary-bucket refinement) with every key
    * extended by the group: per-group bucket tables stay range/width-
    * bounded, every window partitions by (group[, q]), and the boundary
    * descriptor table is groups × quantiles rows (broadcast). The
    * per-slice length/score quantile dashboard at corpus scale — no
    * group ever meets a single-reducer sort, no matter how large.
    *
    * @return (groupCol, q_bp, k, value): the k-th smallest value of the
    *         group, k = ceil(q·n_g)
    */
  def exactQuantilesGrouped(df: DataFrame, groupCol: String, valueCol: String,
                            qs: Seq[Double], bucketWidth: Long = 1L << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles $qs")
    require(bucketWidth >= 1, s"bad bucketWidth $bucketWidth")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val buckets = v.groupBy(col("g"), expr(s"v div $bucketWidth").as("b"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets
      .withColumn("cumc", sum("c").over(wb))
      .withColumn("n", max(sum("c").over(wb)).over(Window.partitionBy("g")))
    val qdf = spark.createDataFrame(
      qs.map(q => Tuple1(math.round(q * 10000).toInt))).toDF("q_bp")
    val ks = cum.crossJoin(broadcast(qdf))
      .withColumn("k", expr("(CAST(q_bp AS BIGINT) * n + 9999) div 10000"))
      .where(col("cumc") >= col("k") && col("cumc") - col("c") < col("k"))
      .select(col("g"), col("q_bp"), col("k"), col("b"),
        (col("k") - (col("cumc") - col("c"))).as("kin"))
    val wv = Window.partitionBy("g", "q_bp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.join(broadcast(ks),
        v("g") === ks("g") && expr(s"v div $bucketWidth") === ks("b"))
      .drop(ks("g"))
      .groupBy("g", "q_bp", "k", "kin", "v").agg(count(lit(1)).as("vc"))
      .withColumn("cumv", sum("vc").over(wv))
      .where(col("cumv") >= col("kin") && col("cumv") - col("vc") < col("kin"))
      .select(col("g").as(groupCol), col("q_bp"), col("k"), col("v").as("value"))
  }

  /** POPULATION STABILITY INDEX between two corpus slices — the standard
    * drift monitor (credit-scoring lineage, adopted for training-data
    * ops): histogram both slices on a shared bucketing, then
    *
    *   PSI = Σ_b (p_new(b) − p_old(b)) · ln(p_new(b) / p_old(b))
    *
    * PSI < 0.1 ≈ stable, 0.1–0.25 ≈ drifting, > 0.25 ≈ shifted — run per
    * crawl snapshot over length/quality/lang-share features to catch a
    * source changing under the pipeline before it trains into a model.
    *
    * Scale shape: two bucket-keyed count aggregates (map-side partials
    * absorb both corpora; the bucket table is `range/width`-sized, i.e.
    * model state), one full-outer join of the two tiny histograms, totals
    * as a broadcast 1-row cross join. Empty buckets take Laplace
    * smoothing (+1 per bucket) so ln never sees zero — deterministic and
    * engine-replicable, unlike an epsilon clamp. Contributions are
    * emitted per bucket (micro-rounded; the ulp-level libm difference
    * between engines sits ~10⁻¹⁰ below the rounding boundary) so the
    * drift is attributable, not just a scalar.
    *
    * @return per bucket: (b, cnt_old, cnt_new, contrib_micro)
    */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    def hist(df: DataFrame, n: String) =
      df.select(call_function("div", col(valueCol), lit(bucketWidth)).as("b"))
        .groupBy("b").agg(count(lit(1)).as(n))
    val j = hist(oldDf, "cnt_old").join(hist(newDf, "cnt_new"), Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
        coalesce(col("cnt_new"), lit(0L)).as("cnt_new"))
      .localCheckpoint(false) // bucket-table-sized; feeds totals AND contributions
    val tot = j.agg(sum("cnt_old").cast("long").as("t_old"),
      sum("cnt_new").cast("long").as("t_new"), count(lit(1)).as("nb"))
    val pOld = (col("cnt_old") + lit(1)).cast("double") /
      (col("t_old") + col("nb")).cast("double")
    val pNew = (col("cnt_new") + lit(1)).cast("double") /
      (col("t_new") + col("nb")).cast("double")
    j.crossJoin(broadcast(tot))
      .select(col("b"), col("cnt_old"), col("cnt_new"),
        round((pNew - pOld) * log(pNew / pOld) * lit(1e6)).cast("long")
          .as("contrib_micro"))
  }

  /** SKEW PROFILE of a prospective shuffle key — the pre-flight check
    * before keying a corpus-scale join or aggregate: per-key counts, the
    * heavy hitters, each key's corpus share, its multiple of the mean,
    * and the SALT FACTOR (`ceil(cnt / targetRows)`) that would split the
    * key into target-sized sub-partitions. A key with salt > 1 is one
    * that a plain hash-partitioned shuffle would turn into a straggler
    * task; the remedies, in preference order: AQE skew-join splitting
    * (free, reads these same sizes at runtime), explicit salting
    * (`pmod(hash, salt)` appended to the key on the build side ×
    * replicated probe side — [[graft.operators.SkewJoin]]), or a
    * broadcast hot-key bypass (the DedupOps guard pattern).
    *
    * Scale shape: ONE key-keyed count aggregate (map-side partials absorb
    * the corpus) → `TakeOrdered(topN)` for the heavy hitters (per-
    * partition heaps + driver merge of heads, never a full sort) → the
    * global totals enter as a broadcast 1-row cross join, NOT driver
    * scalars. All metrics are integer basis points — engine-exact.
    *
    * @return topN rows: (rank, key, cnt, share_bp, pct_of_mean_x100, salt)
    */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int,
                  targetRows: Long): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val kc = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = kc.agg(sum("cnt").cast("long").as("total"),
      count(lit(1)).as("n_keys"))
    val top = kc.orderBy(col("cnt").desc, col("key")).limit(topN)
      .crossJoin(broadcast(tot))
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))).as("rank"),
        col("key"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"),
        expr("cnt * n_keys * 100 div total").as("pct_of_mean_x100"),
        expr(s"(cnt + ${targetRows - 1}L) div ${targetRows}L").as("salt"))
      .localCheckpoint(true) // materialize before releasing the count cache
    kc.unpersist(blocking = false)
    top
  }

  /** Pearson CORRELATION MATRIX over integer-quantized columns in ONE
    * pass — the feature-redundancy profile before a mixture/weighting
    * design treats two signals as independent. All moment sums (Σx,
    * Σxy, Σx², n) are INTEGER aggregates — exact and addition-order-
    * independent, so the sums are engine-identical — and the k(k+1)/2+k
    * sums come out of a single map-side-partial aggregate over the
    * corpus (one reduce of ONE row, no per-pair passes). The correlation
    * itself is one closed-form double expression per pair over those
    * exact sums (identical IEEE op order on any engine), emitted as
    * micro units; pair rows are k²-sized model state built over the
    * 1-row aggregate.
    *
    * Caller contract (ANSI): columns must be integer-quantized and
    * bounded so Σ|x·y| fits int64 — quantize units DOWN (dollars, pct)
    * rather than up when the corpus is large.
    *
    * @return one row per unordered pair i < j:
    *         (col_a, col_b, corr_micro)
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns, got ${cols.size}")
    val k = cols.size
    val aggs =
      cols.map(c => sum(col(c).cast("long")).as(s"s_$c")) ++
        (for { i <- 0 until k; j <- i until k } yield
          sum(col(cols(i)).cast("long") * col(cols(j)).cast("long")).as(s"p_${i}_$j")) :+
        count(lit(1)).as("n")
    val m = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true) // 1 row
    val pairs = for { i <- 0 until k; j <- (i + 1) until k } yield {
      val (a, b) = (cols(i), cols(j))
      val n = col("n").cast("double")
      val sa = col(s"s_$a").cast("double")
      val sb = col(s"s_$b").cast("double")
      val num = n * col(s"p_${i}_$j").cast("double") - sa * sb
      val den = sqrt(n * col(s"p_${i}_$i").cast("double") - sa * sa) *
        sqrt(n * col(s"p_${j}_$j").cast("double") - sb * sb)
      // a zero-variance (constant) column makes den = 0 — correlation is
      // undefined there; guard the division so the pair reports an
      // explicit NULL under both ANSI settings instead of NaN/Inf
      // (silent null-on-cast non-ANSI, CAST_INVALID_INPUT under ANSI)
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        round(num / when(den =!= 0.0, den) * 1000000)
          .cast("long").as("corr_micro"))
    }
    pairs.reduce(_ unionByName _)
  }

  /** Per-group token SHANNON ENTROPY in milli-nats — the diversity
    * metric alongside [[skewProfile]]'s concentration one (a source
    * whose token distribution has collapsed is boilerplate; entropy is
    * the scalar that flags it). ENGINE-PORTABLE by the integer-term
    * discipline: each vocabulary row contributes the integer
    * c·round(1000·ln(c/N)) and the per-group reduction SUMS INTEGERS
    * (order-independent); the only float math is the per-row ln — the
    * q97 milli-nat pattern. Two aggregates: (group, token) counts (the
    * corpus pass, map-side partials) then a group-keyed vocabulary
    * reduction; group totals broadcast.
    *
    * @return (groupCol, n_tokens, n_vocab, entropy_milli) where
    *         entropy_milli = −(Σ_w c_w·round(1000·ln(c_w/N))) div N
    */
  def tokenEntropy(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val wc = df
      .where(length(trim(col(textCol))) > 0)
      .select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = wc.groupBy("g")
      .agg(sum("c").cast("long").as("nt"), count(lit(1)).as("nv"))
    wc.join(broadcast(totals), Seq("g"))
      .select(col("g"), col("nt"), col("nv"),
        (col("c") * round(log(col("c").cast("double") / col("nt").cast("double")) * 1000)
          .cast("long")).as("term"))
      .groupBy(col("g").as(groupCol), col("nt").as("n_tokens"), col("nv").as("n_vocab"))
      .agg((-sum(col("term"))).as("num"))
      .select(col(groupCol), col("n_tokens"), col("n_vocab"),
        expr("num div n_tokens").as("entropy_milli"))
  }

  /** PER-GROUP PERCENTILE-RANK NORMALIZATION — map every row's value to
    * its exact permille rank within its group: permille =
    * (rank−1)·1000 div (n−1) over the deterministic total order
    * (value, id). The cross-source calibration step quality pipelines
    * need before comparing scores from different sources (a "good"
    * length/score for src_web is not a good one for src_code — CCNet
    * makes the same move with per-language perplexity buckets); rank
    * arithmetic is pure integers, so the output is engine-exact.
    *
    * Scale shape: the rank is [[graft.operators.PrefixSum
    * .groupedRunningSum]] with an id tie-break — a corpus-sized group
    * never lands on one reducer (the 100 TB reason this isn't a naive
    * `Window.partitionBy(group)`); the per-group size table is
    * groups-sized and broadcast.
    *
    * @return input columns + (rank, permille 0..1000) */
  def percentileRank(df: DataFrame, groupCol: String, valueCol: String,
                     idCol: String): DataFrame = {
    // the rank machinery reads the input 4× (quantile probe, local
    // window, bucket offsets, group sizes) — pin the (usually computed:
    // tokenize/score) input once; the caller owns the cache lifetime
    // (the SimilarityOps batch-operator convention)
    val d = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = graft.operators.PrefixSum.groupedRunningSum(
      d.withColumn("__one", lit(1L)), Seq(groupCol), valueCol, "__one",
      "rank", tieCols = Seq(idCol))
    val sizes = d.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(sizes), Seq(groupCol))
      .withColumn("permille",
        when(col("__n") > 1, expr("(rank - 1) * 1000 div (__n - 1)"))
          .otherwise(lit(0L)))
      .drop("__one", "__n")
  }

  /** ROBUST Z-SCORES per group (median/MAD, the Iglewicz–Hoaglin
    * outlier family): z = (v − median) / MAD in milli-MAD units —
    * mean/stddev z-scores move with the outliers they are supposed to
    * flag (one 10⁹-token document inflates σ enough to hide itself);
    * the median and the median absolute deviation are breakdown-0.5
    * estimators, so the score survives heavy contamination. The robust
    * cousin of [[skewProfile]]'s moments, and the standard
    * quality-outlier gate before training-data admission.
    *
    * Engine-exact: both the median and the MAD are TYPE-1 rank
    * selections via [[exactQuantilesGrouped]] (integer order
    * statistics, never interpolated floats); the score floors ONE
    * closed-form double (a·1000/b on exact int64s < 2⁵³) — identical on
    * any engine. MAD = 0 (over half the group identical) clamps to 1 so
    * constant groups score 0/±large finitely, never divide-by-zero.
    *
    * Scale shape: two grouped exact-quantile passes (each one bucketed
    * count + one pruned in-bucket rank — the [[exactQuantilesGrouped]]
    * plan) + two broadcast joins of groups-sized frames; no
    * corpus-sized window.
    *
    * @return (groupCol, idCol, value, median, mad, z_milli) */
  def robustZ(df: DataFrame, groupCol: String, valueCol: String,
              idCol: String): DataFrame = {
    val med = exactQuantilesGrouped(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("value").as("median"))
    val dev = df
      .select(col(groupCol), col(idCol), col(valueCol).cast("long").as("value"))
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__ad", abs(col("value") - col("median")))
    val mad = exactQuantilesGrouped(dev, groupCol, "__ad", Seq(0.5))
      .select(col(groupCol), col("value").as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .select(col(groupCol), col(idCol), col("value"), col("median"), col("mad"),
        floor((col("value") - col("median")).cast("double") * lit(1000.0) /
          greatest(col("mad"), lit(1L)).cast("double")).cast("long").as("z_milli"))
  }

  /** POISSON BOOTSTRAP confidence intervals for per-group means (the
    * scalable bootstrap: Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google TR 2012) — classic resampling draws n
    * rows WITH replacement per replicate, which needs coordinated global
    * sampling; at scale each row instead receives an INDEPENDENT
    * Poisson(1) weight per replicate, giving each replicate a
    * multinomial-in-the-limit resample with zero coordination: one
    * map-side weight draw, one (group, replicate) aggregate.
    *
    * Deterministic and engine-exact: the weight for (row, replicate) is
    * an inverse-CDF lookup of hash60(seed:id:rep) against Poisson(1)
    * CDF thresholds precomputed as INTEGER literals in 2⁶⁰ units (capped
    * at 6 — P(X ≥ 7) < 10⁻⁴ — so the draw is a finite when-chain);
    * replicate means divide two exact integer sums ONCE, and the CI
    * bounds are exact rank selections (type-1 quantiles) over the B
    * replicate means, floored to micro — md5-reproducible anywhere, so
    * the q226 oracle replays every draw.
    *
    * Scale shape: the replicate explode is map-side (B×n rows straight
    * into a partial-aggregating (group, rep) sum — combiners keep the
    * shuffle at groups × B rows); the rank selection windows over
    * groups × B. No global sort, no driver state.
    *
    * @param reps bootstrap replicates B (the CI resolution)
    * @param loPerMille,hiPerMille CI bounds as permille ranks (25/975 =
    *        central 95%)
    * @return (groupCol, n_rows, mean_micro, ci_lo_micro, ci_hi_micro) */
  def bootstrapCI(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, reps: Int = 200, loPerMille: Int = 25,
                  hiPerMille: Int = 975, seed: String = "boot"): DataFrame = {
    require(reps >= 2, s"need reps >= 2, got $reps")
    require(loPerMille >= 0 && hiPerMille <= 1000 && loPerMille < hiPerMille,
      s"permille bounds out of order: $loPerMille/$hiPerMille")
    // Poisson(1) CDF in 2^60 units: floor(cdf_k * 2^60), k = 0..6
    val thresholds = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L)
    val u = graft.functions.DedupOps.hash60(concat(lit(seed + ":"),
      col(idCol).cast("string"), lit(":"), col("r").cast("string")))
    val w = thresholds.zipWithIndex.foldRight(lit(7L): Column) {
      case ((t, k), rest) => when(u < lit(t), lit(k.toLong)).otherwise(rest)
    }
    val weighted = df
      .select(col(groupCol), col(idCol), col(valueCol).cast("long").as("__x"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .withColumn("__w", w)
    val repMeans = weighted.groupBy(groupCol, "r")
      .agg(sum(col("__w") * col("__x")).as("__sx"), sum("__w").as("__sw"))
      .where(col("__sw") > 0) // an all-zero-weight replicate has no mean
      .withColumn("__m", col("__sx").cast("double") / col("__sw").cast("double"))
    // exact type-1 quantile ranks over the B replicate means, ties by r
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__m").asc, col("r").asc)
    val ranked = repMeans
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .withColumn("__b", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    def pick(perMille: Int) = greatest(lit(1L),
      ceil(col("__b") * perMille / lit(1000.0)).cast("long"))
    val lo = ranked.where(col("__rn") === pick(loPerMille))
      .select(col(groupCol), floor(col("__m") * 1e6).cast("long").as("ci_lo_micro"))
    val hi = ranked.where(col("__rn") === pick(hiPerMille))
      .select(col(groupCol), floor(col("__m") * 1e6).cast("long").as("ci_hi_micro"))
    val base = df.groupBy(groupCol).agg(count(lit(1)).as("n_rows"),
      floor(sum(col(valueCol).cast("long")).cast("double") /
        count(lit(1)).cast("double") * 1e6).cast("long").as("mean_micro"))
    base.join(lo, Seq(groupCol)).join(hi, Seq(groupCol))
  }
}
