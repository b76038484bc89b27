package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter SEMI-JOIN pruning — the runtime-filter pattern made
  * explicit: build a Bloom filter over the (already filtered) dimension
  * keys, drop fact rows that cannot match BEFORE the fact side shuffles,
  * then run the exact join on the survivors. The result is IDENTICAL to
  * the plain join (the filter admits false positives, never false
  * negatives; the exact join removes them), which is what makes the
  * operator safely composable — and lets its correctness gate use the
  * plain join as the oracle, independent of fpp or key count.
  *
  * When it pays: a selective dimension predicate joined to a huge fact
  * table. The fact side's shuffle volume drops by the predicate's
  * selectivity for ~1.2 bytes/key of broadcast state at 1% fpp — at
  * 100 TB, pruning 95% of a fact scan before the exchange is the
  * difference between a job and a non-job. Spark's own
  * `runtime.bloomFilter` optimization does this opportunistically for
  * shuffle joins; the explicit operator guarantees it (and documents
  * the intent) for pipelines built on it.
  *
  * Mechanics: `DataFrameStatFunctions.bloomFilter` aggregates the dim
  * keys distributed and returns the bits to the driver (model-sized:
  * the dimension KEY SET, not the fact table); the probe then ships as
  * an explicit `SparkContext.broadcast` — once per EXECUTOR, not once
  * per task. A multi-MB filter captured directly in a UDF closure would
  * instead be serialized into every one of the thousands of fact-side
  * tasks; the broadcast keeps the per-task payload at a handle.
  */
object BloomJoin {

  /** Exact equi-join of `fact` ⋈ `dim`, with the fact side Bloom-pruned
    * before the shuffle. Long join keys.
    *
    * @param fpp target false-positive rate for the prefilter (cost knob
    *            only — never affects results)
    */
  def bloomPrunedJoin(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp in (0,1), got $fpp")
    val keys = dim.select(col(dimKey).cast("long").as("__k")).distinct()
      .localCheckpoint(true) // feeds the count and the filter build once
    val n = keys.count()
    val pruned =
      if (n == 0) fact.where(lit(false))
      else {
        val bf = keys.stat.bloomFilter("__k", n, fpp)
        val bfB = fact.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
        fact.where(mightContain(col(factKey)))
      }
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
