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

  /** MATERIALIZE the training set: shuffle into shards, pack each
    * shard's token stream into fixed-length sequences, and write one
    * parquet directory per shard ([[graft.sources.TableStore]]
    * hive-partitioning on `shard` — the webdataset/tfrecord layout,
    * where a trainer opens its shard directory and seeks to `pos`).
    * Returns the frame READ BACK from the written files, so callers gate
    * on what is actually on disk, not on the pre-write plan.
    *
    * Packing is per shard: `start_tok`/`first_seq`/`last_seq`/
    * `seq_offset` follow the q83 convention over the shard's token
    * stream in shuffled order (the second distributed prefix sum — no
    * per-shard single-reducer window even when a shard is corpus-sized).
    *
    * @param df     rows to materialize; idCol as [[shuffleShards]],
    *               ntokCol a non-negative long token count
    * @param path   output directory (one `shard=k/` subdirectory each)
    */
  def writeShards(df: DataFrame, idCol: String, ntokCol: String,
                  nShards: Int, seqLen: Long, seed: Long, path: String): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val manifest = shuffleShards(df, idCol, nShards, seed)
    // pos is unique within a shard and order-equivalent to the LCG
    // priority, so it is the packing order column
    val packed = PrefixSum.groupedRunningSum(manifest, Seq("shard"), "pos", ntokCol, "cum_tok")
      .withColumn("start_tok", col("cum_tok") - col(ntokCol))
      .withColumn("first_seq", expr(s"start_tok div $seqLen"))
      .withColumn("last_seq",
        expr(s"CASE WHEN $ntokCol = 0 THEN start_tok div $seqLen ELSE (cum_tok - 1) div $seqLen END"))
      .withColumn("seq_offset", col("start_tok") % seqLen)
    graft.sources.TableStore.save(packed, path, partitionBy = Seq("shard"))
    graft.sources.TableStore.load(df.sparkSession, path)
  }

  /** PADDING-WASTE profile for length-bucketed batching: assign every
    * sequence to the next power-of-two width (floored at `minWidth`) and
    * report per-bucket padding waste, plus the single-bucket baseline
    * (pad everything to the max width — what a naive collator does).
    * The gap between `waste_bp` and `naive_waste_bp` is the FLOPs you
    * buy by bucketing the dataloader; the bucket histogram is also the
    * input for choosing packing vs padding (compare with the q83
    * sequence-packing path, which eliminates padding entirely at the
    * cost of document-boundary attention masks).
    *
    * Scale shape: one bucket-keyed count/sum aggregate (≤ 64 buckets for
    * any length ≤ 2⁶³ — log-bounded key space, map-side partials absorb
    * the corpus); the baseline enters as a broadcast 1-row cross join.
    * The next-pow2 is the integer `bin()` length identity — no floats.
    *
    * @return per bucket: (bucket_w, n_docs, sum_tok, waste_bp,
    *         naive_waste_bp) — naive_* constant across rows
    */
  /** RENDEZVOUS (highest-random-weight) SHARDING — Thaler & Ravishankar,
    * IEEE/ACM ToN 1998: key k lands on argmax_s hash(salt, k, s). The
    * property [[shuffleShards]]' mod-assignment lacks: when the shard
    * count changes, ONLY the keys whose new argmax is the added shard
    * move (≈ 1/(n+1) of them, provably to the new shard and nowhere
    * else) — mod-n reassigns nearly everything. The placement primitive
    * for incremental re-sharding of a growing persisted corpus (resize
    * a 256-shard store to 257 and re-copy 0.4% of the bytes, not 99%).
    *
    * Map-only: the candidate list is `nShards` md5 integers per key,
    * constant-folded; the argmax is an array_max over (hash, shard)
    * structs — ties (astronomically unlikely 60-bit collisions) break
    * to the higher shard id, deterministically. For shard counts large
    * enough that n literals per row hurt (thousands), switch to the
    * explode + per-key max form; the semantics are identical. */
  def rendezvousShard(key: Column, nShards: Int, salt: String = "hrw"): Column = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val cands = (0 until nShards).map { s =>
      struct(graft.functions.DedupOps.hash60(
        concat_ws(",", lit(salt), key, lit(s))).as("h"), lit(s.toLong).as("s"))
    }
    array_max(array(cands: _*)).getField("s")
  }

  def paddingWaste(df: DataFrame, tokCol: String, minWidth: Int = 16): DataFrame = {
    require(minWidth >= 1, s"minWidth must be >= 1, got $minWidth")
    val nt = col(tokCol)
    val np2 = when(nt <= 1, lit(1L))
      .otherwise(call_function("shiftleft", lit(1L), length(bin(nt - 1)).cast("int")))
    val buckets = df.where(nt > 0)
      .select(greatest(lit(minWidth.toLong), np2).as("bucket_w"), nt.as("__nt"))
      .groupBy("bucket_w")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").cast("long").as("sum_tok"))
    val base = buckets.agg(max("bucket_w").as("__maxw"),
      sum("n_docs").cast("long").as("__nd"), sum("sum_tok").cast("long").as("__st"))
    buckets.crossJoin(broadcast(base))
      .select(col("bucket_w"), col("n_docs"), col("sum_tok"),
        expr("(n_docs * bucket_w - sum_tok) * 10000 div (n_docs * bucket_w)").as("waste_bp"),
        expr("(__nd * __maxw - __st) * 10000 div (__nd * __maxw)").as("naive_waste_bp"))
  }

  /** CURRICULUM INTERLEAVE — a deterministic training order that is
    * simultaneously (a) a curriculum (each source's rows appear in
    * `ordCol` order: classic short/easy-first — Bengio et al. 2009) and
    * (b) source-balanced (consecutive positions rotate across sources, so
    * no training window is dominated by one source while sources last):
    *
    *   curriculum_idx = (rank_in_source − 1) · n_sources + source_idx
    *
    * Sources exhausting early leave index gaps — harmless, since training
    * reads in idx order, and the formula needs no global coordination.
    *
    * Scale shape: rank-in-source is a [[PrefixSum]] distributed running
    * count (quantile-bucketed — no per-source single-reducer window even
    * when one source is half the corpus); the source-index table is
    * group-count-sized and broadcast. Everything else is a projection.
    *
    * @param ordCol numeric, non-null, unique within each group
    *               (PrefixSum's requirement — fold the tiebreak id into
    *               the low bits)
    * @return input plus (rank, curriculum_idx); rank is 1-based
    */
  def curriculumInterleave(df: DataFrame, groupCol: String,
                           ordCol: String): DataFrame = {
    val ranked = graft.operators.PrefixSum
      .groupedRunningSum(df.withColumn("__one", lit(1L)), Seq(groupCol),
        ordCol, "__one", "rank")
      .drop("__one")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(groupCol)) // group-count-sized table: safe global window
    val srcIdx = df.select(col(groupCol)).distinct()
      .withColumn("__src_idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("__n_groups", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()).cast("long"))
    ranked.join(broadcast(srcIdx), Seq(groupCol))
      .withColumn("curriculum_idx",
        (col("rank") - 1) * col("__n_groups") + col("__src_idx"))
      .drop("__src_idx", "__n_groups")
  }
}
