package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory frequency sketches.
  *
  * [[ProfileOps]] already covers sketched cardinalities (HLL++ via
  * `approx_count_distinct`) and quantiles (`percentile_approx`); this
  * object adds the COUNT-MIN sketch (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary") for frequency estimation: d×w integer
  * cells summarize any key cardinality, estimates never under-count, and
  * over-counting is bounded by ‖f‖₁·e/w with probability 1−e^−d.
  *
  * 100 TB shape: the build is ONE aggregate whose key space is the d×w
  * CELLS, not the keys — map-side partials absorb the corpus, the final
  * table is a few thousand rows no matter how many distinct tokens exist
  * (where an exact `groupBy(token)` would shuffle the full vocabulary).
  * Estimation broadcasts the sketch. Hashes are md5-derived
  * ([[DedupOps.hash60]]) — engine-portable, so the whole sketch is
  * integer-exact and reproducible anywhere.
  */
object SketchOps {

  /** Row-j bucket of a key: md5-derived 60-bit hash of `"j:key"` mod w —
    * independent-enough rows without a second hash family, and exactly
    * replicable in SQL. */
  private def cmsBucket(key: Column, j: Int, width: Int): Column =
    pmod(DedupOps.hash60(concat(lit(j.toString), lit(":"), key)), lit(width.toLong))

  /** A key's d cells as an array of (j, bucket) structs — the shared
    * explode source for [[cmsBuild]], [[cmsEstimate]], and the streaming
    * sketch ([[graft.streaming.StreamingOps.cmsStream]]). */
  private[graft] def cmsCells(key: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 2, s"bad sketch shape d=$depth w=$width")
    array((0 until depth).map { j =>
      struct(lit(j).as("j"), cmsBucket(key, j, width).as("bucket"))
    }: _*)
  }

  /** Build the d×w count table from one pass over `df`.
    * @return (j, bucket, c) — at most depth·width rows */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 512): DataFrame =
    df.select(explode(cmsCells(col(keyCol), depth, width)).as("__c"))
      .groupBy(col("__c.j").as("j"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for candidate keys: min over the key's d cells.
    * CMS guarantees est ≥ true count. The sketch is broadcast; the
    * candidate table (typically the distinct keys of interest) stays
    * distributed.
    * @return one row per input key: (keyCol, est) */
  def cmsEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val cand = keys.select(col(keyCol), explode(cmsCells(col(keyCol), depth, width)).as("__c"))
      .select(col(keyCol), col("__c.j").as("j"), col("__c.bucket").as("bucket"))
    cand.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(keyCol).agg(min("c").as("est"))
  }

  /** Engine-portable HYPERLOGLOG registers (Flajolet, Fusy, Gandouet &
    * Meunier 2007): the mergeable distinct-count sketch. Spark's builtin
    * (`approx_count_distinct` / datasketches HLL) is a black box no SQL
    * oracle can replicate; this formulation is md5-derived and
    * integer-exact end to end, so sketches built by ANY engine merge and
    * estimate identically — the property that matters when 100 TB of
    * shards are profiled by heterogeneous writers.
    *
    * Layout: register index = low p bits of [[DedupOps.hash60]]; rank =
    * position of the leading 1 in the remaining 60−p bits (via the
    * integer `length(bin(w))` identity — no floats), capped at 44 so the
    * scaled harmonic sum below stays in int64 for any corpus ≤ ~2⁴⁴
    * distinct keys. Build = ONE aggregate keyed by register (≤ 2^p rows
    * out, any input cardinality); merge = `max` per register —
    * associative, so shard sketches combine without rescanning.
    *
    * @return (idx, mx): present registers only; an absent register means
    *         value 0 (no key hashed there)
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 10,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val m = 1L << p
    val h = DedupOps.hash60(col(keyCol))
    val idx = pmod(h, lit(m))
    val wBits = call_function("div", h, lit(m)) // top 60−p bits
    val width = 60 - p
    val rank = when(wBits === 0, lit(width + 1))
      .otherwise(lit(width) - (length(bin(wBits)) - lit(1)))
    val keyed = df.select(
      (groupCols.map(col) :+ idx.as("idx") :+ least(rank, lit(44)).as("rank")): _*)
    keyed.groupBy((groupCols :+ "idx").map(col): _*).agg(max("rank").as("mx"))
  }

  /** Cardinality estimate from [[hllRegisters]] output (possibly merged
    * across shards via `groupBy(idx).agg(max(mx))` first).
    *
    * The harmonic sum is computed as the INTEGER `Σ 2^(44−M_j)` (absent
    * registers contribute 2⁴⁴ each) — exact and addition-order-
    * independent, unlike a float `Σ 2^(−M_j)`, so the one float division
    * at the end is bit-identical on every engine. Small-range correction
    * (linear counting `m·ln(m/V)`) applies below 2.5m with empty
    * registers, per the paper.
    *
    * @return one row: (est)
    */
  def hllEstimate(regs: DataFrame, p: Int = 10): DataFrame =
    hllEstimateGrouped(regs, p, Nil)

  /** [[hllEstimate]] per group — the per-slice cardinality dashboard
    * (distinct terms per source, users per cohort, …) from per-group
    * registers ([[hllRegisters]] with `groupCols`). Same integer-exact
    * scaled harmonic sum and small-range correction, one row per group;
    * the aggregate's key space is groups × nothing (registers already
    * reduced), so this is model-sized work end to end. */
  def hllEstimateGrouped(regs: DataFrame, p: Int = 10,
                         groupCols: Seq[String] = Nil): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val m = 1L << p
    // Flajolet et al. 2007 Fig. 3: the bias correction is a FIXED
    // constant for small m (the asymptotic 0.7213/(1+1.079/m) formula is
    // only prescribed for m >= 128); using the asymptotic form at
    // p=4..6 biases estimates a few percent high.
    val alphaV = m match {
      case 16L => 0.673
      case 32L => 0.697
      case 64L => 0.709
      case _   => 0.7213 / (1.0 + 1.079 / m)
    }
    val alpha = s"($alphaV)"
    val agged = (if (groupCols.isEmpty) regs.groupBy()
                 else regs.groupBy(groupCols.map(col): _*))
      .agg(
        count(lit(1)).as("nz"),
        coalesce(sum(call_function("shiftleft", lit(1L),
          (lit(44) - col("mx")).cast("int"))), lit(0L)).as("snum"))
    agged
      .select((groupCols.map(col) :+
        (col("snum") + (lit(m) - col("nz")) *
          call_function("shiftleft", lit(1L), lit(44))).as("num") :+
        (lit(m) - col("nz")).as("v")): _*)
      .select((groupCols.map(col) :+ round(
        when(col("v") > 0 &&
            expr(s"$alpha * $m.0 * $m.0 * cast(shiftleft(1L, 44) as double) / cast(num as double)") <= lit(2.5 * m),
          expr(s"$m.0 * ln($m.0 / cast(v as double))"))
        .otherwise(
          expr(s"$alpha * $m.0 * $m.0 * cast(shiftleft(1L, 44) as double) / cast(num as double)")))
        .cast("long").as("est")): _*)
  }

  /** JOIN-CARDINALITY estimate from two sketches — the inner-product
    * estimator of Cormode & Muthukrishnan 2005 §4.2: for sketches of key
    * multisets A and B (built with the SAME depth/width/hashes),
    *
    *   |A ⋈ B|  =  Σ_k f_A(k)·f_B(k)  ≈  min_j Σ_w cA[j][w]·cB[j][w]
    *
    * Never under-estimates (colliding keys only add cross terms); the
    * over-count is bounded by ‖f_A‖₁·‖f_B‖₁·e/w with probability 1−e^−d.
    *
    * This is the query-planner primitive for sizing a join WITHOUT
    * scanning either side: at 100 TB the exact answer is itself a full
    * key-keyed aggregate of each table plus a vocabulary-sized join,
    * while this estimate joins two d×w tables — constant cost in the
    * data size, so a planner can sketch every candidate join key during
    * ingest (sketches are mergeable: cell-wise sums absorb new
    * partitions) and pick broadcast/shuffle/skew strategies from the
    * estimates.
    *
    * @param a,b [[cmsBuild]] outputs with identical depth and width
    * @return one row: (est) — the estimated join cardinality
    */
  /** KMV (k minimum values) distinct-value sketch per group — the
    * MERGEABLE cardinality synopsis that, unlike HLL registers
    * ([[hllRegisters]]), supports SET-OPERATION estimates: union,
    * Jaccard, and intersection between any two groups from their k-value
    * sketches alone (Beyer, Haas, Reinwald, Sismanis & Gemulla, SIGMOD
    * 2007, "On synopses for distinct value estimation under multiset
    * operations"; Bar-Yossef et al. 2002 for the original estimator).
    *
    * Keeps the k smallest DISTINCT [[DedupOps.hash60]] values per group.
    * With hashes uniform on [0, 2^60), the kth smallest value h_(k)
    * estimates the distinct count as (k−1)·2^60/h_(k) (the unbiased
    * form); a group with ≤ k distinct values keeps them ALL, so the
    * sketch degrades to the exact answer.
    *
    * 100 TB shape: one distinct-(group, hash) aggregate over the corpus,
    * then a per-group bottom-k window that WindowGroupLimit pre-reduces
    * map-side to ≤ k rows per group per partition — the output is
    * (groups × k) rows no matter the corpus size, and sketches merge by
    * re-taking the k smallest of a concatenation (exactly what
    * [[kmvPairStats]] does pairwise).
    *
    * @return (g, ks sorted ascending ≤ k hashes, nd exact distinct count
    *         — carried so estimators can apply the ≤ k exact rule) */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
                k: Int = 16): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val dh = df.select(col(groupCol).as("g"),
      DedupOps.hash60(col(keyCol)).as("__h")).distinct()
      .localCheckpoint(false) // bottom-k window + exact count share it
    val nd = dh.groupBy("g").agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy("g").orderBy(col("__h").asc)
    dh.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .groupBy("g").agg(sort_array(collect_list(col("__h"))).as("ks"))
      .join(nd, Seq("g"))
  }

  /** (k−1)·2^60/h_(k) when the sketch is truncated; exact `nd` when the
    * group had ≤ k distinct values. The double product 15·2^60 (k=16) is
    * exact and the single division + floor is engine-portable (one
    * closed-form float op — the [[DedupOps]] float discipline). */
  private def kmvEst(nd: Column, ks: Column, k: Int): Column =
    when(nd <= k, nd).otherwise(
      floor(lit((k - 1).toDouble * 1.152921504606846976e18) /
        element_at(ks, k).cast("double")).cast("long"))

  /** Pairwise set-operation estimates between every two groups of a
    * [[kmvSketch]] frame (g_a < g_b). The merged sketch of a pair is the
    * k smallest of the union of the two sketch value sets — identical to
    * the sketch OF the union (the KMV merge theorem), so:
    * est_union from the merged kth value (exact when BOTH groups were
    * below k — then the merge holds the entire union); sketch_overlap =
    * merged values present in both sketches, an unbiased Jaccard sample
    * (jaccard_milli = ⌊1000·overlap/k_merged⌋); est_intersection =
    * ⌊overlap·est_union/k_merged⌋ (J·|union|).
    *
    * The sketch frame is model-sized (groups × k longs), so the pair
    * join is a broadcast cross of two tiny frames at any corpus size —
    * estimating every pairwise source overlap of a 100 TB corpus costs
    * one corpus aggregate + O(groups²·k) driver-free array work. */
  def kmvPairStats(sketch: DataFrame, k: Int = 16): DataFrame = {
    val a = sketch.select(col("g").as("source_a"), col("ks").as("__ka"),
      col("nd").as("__nda"))
    val b = sketch.select(col("g").as("source_b"), col("ks").as("__kb"),
      col("nd").as("__ndb"))
    a.crossJoin(broadcast(b)).where(col("source_a") < col("source_b"))
      .withColumn("__m", array_sort(array_union(col("__ka"), col("__kb"))))
      .withColumn("k_merged", least(size(col("__m")), lit(k)).cast("long"))
      .withColumn("__mk", slice(col("__m"), 1, k))
      .withColumn("est_a", kmvEst(col("__nda"), col("__ka"), k))
      .withColumn("est_b", kmvEst(col("__ndb"), col("__kb"), k))
      .withColumn("sketch_overlap",
        size(array_intersect(array_intersect(col("__mk"), col("__ka")),
          col("__kb"))).cast("long"))
      .withColumn("est_union",
        when(col("__nda") <= k && col("__ndb") <= k, size(col("__m")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble * 1.152921504606846976e18) /
            element_at(col("__mk"), k).cast("double")).cast("long")))
      .withColumn("jaccard_milli",
        expr("(1000 * sketch_overlap) div k_merged"))
      .withColumn("est_intersection",
        expr("(sketch_overlap * est_union) div k_merged"))
      .select("source_a", "source_b", "est_a", "est_b", "k_merged",
        "sketch_overlap", "est_union", "jaccard_milli", "est_intersection")
  }

  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val ip = a.select(col("j"), col("bucket"), col("c").as("ca"))
      .join(b.select(col("j"), col("bucket"), col("c").as("cb")), Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
    // a depth row whose buckets don't intersect at all witnesses ip_j = 0
    // — the inner join DROPS it, so restore every j from sketch a (each
    // key populates all d rows) before taking the min, or a disjoint
    // join would read as the min of the remaining rows (or NULL)
    a.select("j").distinct()
      .join(ip, Seq("j"), "left")
      .agg(coalesce(min(coalesce(col("ip"), lit(0L))), lit(0L)).as("est"))
  }

  /** DDSketch-style log-binned histogram (Masson, Rim & Lee, VLDB 2019):
    * positive integer values bin to i = ⌈ln(v)/ln(γ)⌉, giving a
    * RELATIVE-error quantile guarantee of α where γ = (1+α)/(1−α) —
    * the distribution profile (token counts, durations, sizes) in
    * O(log_γ(max)) counters per group. Unlike `percentile_approx`
    * (order-dependent, engine-specific) the sketch is deterministic and
    * MERGEABLE BY PLAIN ADDITION, so any batch/shard/stream merge tree
    * lands on the identical histogram — the [[kmvSketch]]-grade parity
    * property the quantile family was missing.
    *
    * γ arrives in milli-units (1250 → γ=1.25, α≈11%); 1.25 is exactly
    * representable in binary, and ⌈ln(v)/ln(γ)⌉ on integer v is the
    * same double in any engine. Rows with value < 1 are dropped (log
    * bins are for positive support — count them separately if they
    * matter). Scale shape: ONE (group, bin) count aggregate with
    * map-side partials; output is groups × ~log_γ(max) rows.
    *
    * @return (g, bin, cnt) */
  def ddHistogram(df: DataFrame, groupCol: String, valCol: String,
                  gammaMilli: Long = 1250L): DataFrame = {
    require(gammaMilli > 1000L, s"gamma must exceed 1.0, got $gammaMilli milli")
    val g = gammaMilli.toDouble / 1000.0
    df.where(col(valCol) >= 1)
      .groupBy(col(groupCol).as("g"),
        ceil(log(col(valCol).cast("double")) / lit(math.log(g)))
          .cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[ddHistogram]]: per group, the q-th
    * quantile is the value x_i = 2γ^i/(γ+1) of the smallest bin whose
    * cumulative count reaches ⌈q·n⌉ — within relative α of the true
    * quantile by the bin guarantee. Bin selection is pure integer
    * cumulative arithmetic (one window over the group's ~log_γ(max)
    * bins); the single closed-form float per output row is the
    * engine-portable float discipline (measured: the floor boundary of
    * 2000·1.25^k/2.25 stays ≥ 1.2e−10 relative away from an integer
    * for all k ≤ 59 — six orders above any cross-engine pow ulp).
    *
    * @param quantilesMilli quantiles in milli-units (500 = median)
    * @return (g, q_milli, bin, est_milli = ⌊1000·2γ^bin/(γ+1)⌋) */
  def ddQuantiles(hist: DataFrame, quantilesMilli: Seq[Long],
                  gammaMilli: Long = 1250L): DataFrame = {
    require(quantilesMilli.nonEmpty &&
      quantilesMilli.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in [1, 1000] milli (q=0 has no crossing bin), got $quantilesMilli")
    val g = gammaMilli.toDouble / 1000.0
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Long.MinValue, 0L)
    val cum = hist
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(Window.partitionBy("g")))
    val sp = hist.sparkSession
    import sp.implicits._
    val qs = quantilesMilli.toDF("q_milli")
    cum.crossJoin(broadcast(qs))
      .where(col("__cum") * 1000 >= col("q_milli") * col("__n")
        && (col("__cum") - col("cnt")) * 1000 < col("q_milli") * col("__n"))
      .select(col("g"), col("q_milli"), col("bin"),
        floor(lit(1000.0 * 2.0) * pow(lit(g), col("bin").cast("double"))
          / lit(g + 1.0)).cast("long").as("est_milli"))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic per group against the
    * pooled/global distribution, computed EXACTLY over [[ddHistogram]]
    * bins: KS = max_bins |F_g(bin) − F_global(bin)|, with the max taken
    * by integer cross-multiplication (|cum_g·n_global − cum_global·n_g|)
    * so the winning bin is engine-exact — the drift monitor that says
    * WHICH source's length/score/size distribution walked away from the
    * corpus, where PSI (q129) gives a weighted aggregate and this gives
    * the worst-case CDF gap (the classic distribution-shift alarm).
    *
    * Operating on sketch bins rather than raw values is the 100 TB
    * design: the comparison is groups × bins rows (the persisted q197
    * store feeds it directly — no corpus rescan), and binned KS equals
    * raw KS evaluated at bin boundaries. Integer-overflow envelope:
    * cum·n products need n_g·n_global < 2^63 — at ~10^12-row corpora
    * rescale counts (divide both histograms by a common factor) before
    * calling; the statistic is ratio-invariant up to the dropped
    * remainder.
    *
    * @param hist (g, bin, cnt) — [[ddHistogram]] output (any integer
    *             binning works; bins are compared by their sort order)
    * @return (g, n_g, n_global, ks_bin, ks_num, ks_micro) where
    *         ks_micro = ⌊10⁶·ks_num/(n_g·n_global)⌋, one row per group */
  def ksDriftFromHistogram(hist: DataFrame): DataFrame = {
    val glob = hist.groupBy("bin").agg(sum("cnt").as("gcnt"))
    val groups = hist.groupBy("g").agg(sum("cnt").as("n_g"))
    val nGlobal = glob.agg(sum("gcnt").as("n_global"))
    // every group needs a row at every global bin (its own cnt may be 0
    // there, but the CDF gap at that bin still counts)
    val grid = groups.select(col("g"), col("n_g")).crossJoin(broadcast(glob))
      .join(hist, Seq("g", "bin"), "left").na.fill(0L, Seq("cnt"))
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Long.MinValue, 0L)
    // NB: Spark column resolution is case-insensitive — cumulative
    // column names must differ by more than case
    val cum = grid
      .withColumn("__cum_g", sum("cnt").over(wc))
      .withColumn("__cum_glob", sum("gcnt").over(wc))
      .crossJoin(broadcast(nGlobal))
      .withColumn("__d",
        abs(col("__cum_g") * col("n_global") - col("__cum_glob") * col("n_g")))
    // deterministic argmax: highest gap, earliest bin
    val wr = Window.partitionBy("g").orderBy(col("__d").desc, col("bin").asc)
    cum.withColumn("__rn", row_number().over(wr)).where(col("__rn") === 1)
      .select(col("g"), col("n_g"), col("n_global"),
        col("bin").as("ks_bin"), col("__d").as("ks_num"),
        floor(lit(1000000.0) * (col("__d").cast("double")
          / (col("n_g").cast("double") * col("n_global").cast("double"))))
          .cast("long").as("ks_micro"))
  }

  /** MG compression of an exactly-counted (key, cnt) frame: subtract the
    * (k+1)-th largest count from every counter and keep the positive
    * remainder — at most k survivors. The threshold is a multiset
    * statistic (min of the top-(k+1) VALUES), so it is deterministic
    * under any tie-break; computed as TakeOrdered(k+1) + 1-row agg
    * broadcast back, never a global sort. Returns (survivors, 1-row t). */
  private def mgCompress(counts: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val thr = counts.orderBy(col("cnt").desc).limit(k + 1)
      .agg(coalesce(when(count(lit(1)) === k + 1, min("cnt")), lit(0L)).as("__t"))
    val kept = counts.crossJoin(broadcast(thr))
      .where(col("cnt") > col("__t"))
      .select(col("key"), (col("cnt") - col("__t")).as("cnt_lo"))
    (kept, thr)
  }

  /** MISRA–GRIES heavy-hitters summary (Misra & Gries 1982) of one
    * frame: exact per-key counts compressed to ≤ k counters by
    * [[mgCompress]]. Each surviving `cnt_lo` is a LOWER bound on the true
    * count with error ≤ `dec` (the cumulative subtracted threshold), and
    * the classic guarantee dec ≤ n_tot/(k+1) means every key with true
    * count > n/(k+1) is GUARANTEED to survive — the frequent-elements
    * contract. Unlike [[cmsBuild]] (over-counts, fixed d×w cells,
    * needs the key to query) MG under-counts and carries its keys, so
    * the summary IS the top-k candidate list: stopword discovery,
    * boilerplate n-grams, hot-key detection for skew salting.
    *
    * Scale shape: ONE exact count aggregate (vocabulary-keyed, map-side
    * partials) + a TakeOrdered(k+1) threshold broadcast back — no global
    * sort, summary is k rows. The scalars (dec, n_tot) ride every row —
    * CAVEAT: a near-uniform input with > k distinct keys can compress to
    * ZERO rows (every counter hits the threshold), and an empty summary
    * carries no (dec, n_tot) back into a later merge, weakening the
    * error bound silently; heavy-hitter use cases (Zipf-shaped corpora)
    * never hit this, but don't feed MG a uniform stream and read `dec`
    * as exact.
    *
    * @return (key, cnt_lo, dec, n_tot), ≤ k rows */
  def mgSummary(df: DataFrame, keyCol: String, k: Int = 16): DataFrame =
    mgAbsorb(None, df, keyCol, k)

  /** Absorb a batch of raw rows into an optional existing [[mgSummary]]
    * frame with ONE compression: exact batch counts are summed into the
    * store's counters uncompressed, then the merged counters compress
    * once — dec grows by a single threshold per batch (strictly tighter
    * than compress-then-merge, same one-aggregate batch cost). This is
    * the per-micro-batch body of the streaming heavy-hitter store. */
  def mgAbsorb(store: Option[DataFrame], df: DataFrame, keyCol: String,
               k: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bCounts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val summed = store match {
      case None => bCounts
      case Some(st) => st.select(col("key"), col("cnt_lo").as("cnt"))
        .union(bCounts).groupBy("key").agg(sum("cnt").as("cnt"))
    }
    val (kept, thr) = mgCompress(summed, k)
    val bN = bCounts.agg(coalesce(sum("cnt"), lit(0L)).as("__nb"))
    val prior = store.getOrElse(bCounts.limit(0)
        .select(col("key"), col("cnt").as("cnt_lo"),
          lit(0L).as("dec"), lit(0L).as("n_tot")))
      .agg(coalesce(max("dec"), lit(0L)).as("__dp"),
        coalesce(max("n_tot"), lit(0L)).as("__np"))
    kept.crossJoin(broadcast(thr)).crossJoin(broadcast(bN))
      .crossJoin(broadcast(prior))
      .select(col("key"), col("cnt_lo"),
        (col("__dp") + col("__t")).as("dec"),
        (col("__np") + col("__nb")).as("n_tot"))
  }

  /** Merge two [[mgSummary]] frames (Agarwal et al. 2012, "Mergeable
    * summaries"): sum counters keyed by `key`, re-compress, accumulate
    * the error budget — dec_out = dec_a + dec_b + t_merge, still
    * ≤ (n_a + n_b)/(k+1), so ANY merge tree over corpus shards keeps the
    * frequent-elements guarantee. NOTE the merged counters are a valid
    * summary but not bit-identical to the one-shot corpus summary (MG is
    * merge-shape-dependent, unlike [[kmvSketch]]) — parity gates must
    * replay the same merge sequence. All frames are k-row; every join
    * here broadcasts. */
  def mgMergeSummaries(a: DataFrame, b: DataFrame, k: Int = 16): DataFrame = {
    val summed = a.select("key", "cnt_lo").union(b.select("key", "cnt_lo"))
      .groupBy("key").agg(sum("cnt_lo").as("cnt"))
    val (kept, thr) = mgCompress(summed, k)
    def scalars(s: DataFrame, dc: String, nc: String) =
      s.agg(coalesce(max("dec"), lit(0L)).as(dc),
        coalesce(max("n_tot"), lit(0L)).as(nc))
    kept.crossJoin(broadcast(thr))
      .crossJoin(broadcast(scalars(a, "__da", "__na")))
      .crossJoin(broadcast(scalars(b, "__db", "__nb")))
      .select(col("key"), col("cnt_lo"),
        (col("__da") + col("__db") + col("__t")).as("dec"),
        (col("__na") + col("__nb")).as("n_tot"))
  }
}
