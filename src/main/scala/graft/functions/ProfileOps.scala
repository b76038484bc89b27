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
}
