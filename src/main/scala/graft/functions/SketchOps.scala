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
}
