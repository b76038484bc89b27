package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle + shard manifest — the last
  * step of a training-data pipeline: give every example a pseudo-random
  * but REPRODUCIBLE position, grouped into fixed shards (webdataset /
  * tfrecord style), so two runs of the pipeline emit byte-identical epochs
  * and a resumed run can seek to (shard, pos).
  *
  * The permutation is an LCG over the id: `(id * 1103515245 + seed) mod
  * 2^31`. With an odd multiplier this map is bijective mod 2^31, so ids
  * that are distinct mod 2^31 get distinct priorities — a true shuffle,
  * no tie-handling, and any SQL engine can replay it (unlike xxhash64,
  * whose seed-mixing is Spark-internal). Shard = priority mod nShards
  * (uniform, independent of id locality); position within a shard is a
  * distributed prefix rank over the priority ([[PrefixSum]]), NOT a
  * per-shard single-reducer window — with few shards a shard is
  * corpus-sized, and the rank still spreads across the cluster.
  */
object TrainShuffle {

  /** `(id * 1103515245 + seed) mod 2^31`, overflow-free: the id is reduced
    * mod 2^31 BEFORE the multiply, which is bit-identical for the final
    * mod-2^31 result (a·(id − id mod 2^31) is a multiple of 2^31) but keeps
    * the product ≤ (2^31−1)·1103515245 ≈ 2.4e18 < Long.MaxValue — ids past
    * ~8.4e9 would otherwise wrap negative and land outside [0, 2^31). */
  def lcgPrio(id: Column, seed: Long): Column =
    (pmod(id, lit(2147483648L)) * lit(1103515245L) + lit(seed)) % lit(2147483648L)

  /** @param df      rows to shuffle; `idCol` must be a non-negative long,
    *                distinct mod 2^31 (the LCG is bijective mod 2^31)
    * @param nShards number of output shards
    * @param seed    permutation seed (different seed → different epoch
    *                order)
    * @return df's rows plus (`shard`, `pos`): shard in [0, nShards),
    *         pos = 1-based rank within the shard in shuffled order
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int, seed: Long = 12345L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val prio = df
      .withColumn("__prio", lcgPrio(col(idCol), seed))
      .withColumn("shard", (col("__prio") % nShards).cast("long"))
      .withColumn("__one", lit(1L))
    PrefixSum.groupedRunningSum(prio, Seq("shard"), "__prio", "__one", "pos")
      .drop("__prio", "__one")
  }
}
