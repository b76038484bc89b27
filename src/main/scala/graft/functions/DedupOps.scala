package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design: every variant is shuffle-minimal —
  *   - exact dedup is one hash aggregate on the fingerprint;
  *   - MinHash-LSH shuffles once on (band, bandHash) buckets, never
  *     all-pairs; candidate verification happens inside buckets only;
  *   - SimHash blocks on 16-bit chunks (pigeonhole: hamming ≤ 3 over 64
  *     bits ⇒ some 16-bit chunk matches exactly);
  *   - n-gram Jaccard joins on rare shingles only.
  * All hashing derives from md5 (deterministic, engine-portable — see
  * [[graft.expr.Hash60]]) so results are stable across runs, cluster
  * sizes, AND verifiable bit-for-bit against an independent SQL engine.
  *
  * Literature: MinHash resemblance estimation is Broder, "On the
  * resemblance and containment of documents" (1997); the banding scheme
  * is the standard LSH amplification (Leskovec/Rajaraman/Ullman, Mining
  * of Massive Datasets §3.4); SimHash is Charikar, "Similarity estimation
  * techniques from rounding algorithms" (STOC 2002), with the chunked
  * hamming blocking from Manku/Jain/Das Sarma, "Detecting near-duplicates
  * for web crawling" (WWW 2007).
  *
  * Cache ownership: operators whose RESULT is bounded (span frames, the
  * cleaned corpus, incremental-absorb outputs) eager-checkpoint it and
  * release every cache they pinned before returning — a long-lived
  * session accumulates nothing from them. Operators returning LAZY
  * corpus-scale frames (candidate pairs, dedup survivors) keep internal
  * MEMORY_AND_DISK persists alive because the result still reads from
  * them; the CALLER owns their lifetime — drop them with
  * `spark.sharedState.cacheManager.clearCache()` (or unpersist after
  * materializing downstream) once the result is consumed.
  */
object DedupOps {
  import TextFunctions.tokens

  /** Largest prime < 2^30 — the MinHash permutation modulus. Small enough
    * that `(h % P) * (2k+1) + b` never overflows a signed 64-bit int for
    * k ≤ ~2^32, so the identical arithmetic runs on engines that check
    * overflow (DuckDB) and engines that wrap (JVM). */
  val MinhashP = 1073741789L

  /** 60-bit md5-derived hash of a string column (top 60 bits of the
    * digest). Engine-portable: same value as
    * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` in DuckDB and
    * [[graft.expr.Hash60.hash]] on the JVM. Pure built-ins → codegen'd. */
  def hash60(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 15), 16, 10).cast("long")

  /** The i-th MinHash permutation applied to a base hash `m` (already
    * reduced mod [[MinhashP]]): classic affine `(a·m + b) mod P` with
    * per-permutation odd multiplier. One md5 per shingle + k affine
    * transforms — cheaper than k independent string hashes. */
  private def perm(m: Column, i: Int): Column =
    pmod(m * lit(2L * i + 1) + lit(i * 7919L + 1), lit(MinhashP))

  /** Exact dedup: keep the smallest id per canonical-text fingerprint.
    * One hash aggregate; at 100 TB this is the cheapest possible pass. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles (distinct set; lowercased). Backed by the native
    * [[graft.expr.WordNGrams]] expression — call sites must ensure
    * [[graft.expr.GraftFunctions.register]] ran for the session (every
    * DataFrame-level operator here does it automatically). */
  def shingles(text: Column, n: Int = 3): Column =
    call_function("word_ngrams", text, lit(n))

  /** Distinct shingles as 60-bit [[hash60]] values — one native pass from
    * text to join-ready keys ([[graft.expr.WordNGramHashes]]); identical
    * values to `transform(shingles(t, n), s -> hash60(s))`. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    call_function("word_ngram_hashes", text, lit(n))

  /** MinHash signature as an array column (lambda formulation — same math
    * as [[minhashSignatures]]; higher-order array functions evaluate
    * interpreted, so prefer the DataFrame-level path for scale). Documents
    * with no shingles yield null (no signature). */
  def minhashSignature(text: Column, k: Int = 64, ngram: Int = 3): Column = {
    val sh = shingles(text, ngram)
    when(size(sh) > 0,
      transform(sequence(lit(0), lit(k - 1), lit(1)), i =>
        array_min(transform(sh, s =>
          pmod(pmod(hash60(s), lit(MinhashP)) * (i * 2 + 1) + i * 7919 + 1, lit(MinhashP))))))
  }

  /** MinHash signatures via explode + hash aggregate: one row per
    * (id, shingle) hashed ONCE with md5, then k codegen'd
    * `min((a_i·m + b_i) mod P)` aggregates with map-side partial
    * aggregation — the shape that scales (and is ~20× faster than the
    * interpreted array-lambda variant). Documents with no shingles are
    * excluded entirely (they'd otherwise share a degenerate signature and
    * become mutual "duplicates" — every short doc would collapse to one). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 64, ngram: Int = 3): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val exploded = df.select(col(idCol).as("id"),
      explode(shingleHashes(col(textCol), ngram)).as("h"))
      .select(col("id"), pmod(col("h"), lit(MinhashP)).as("m"))
    val mins = (0 until k).map(i => min(perm(col("m"), i)).as(s"m$i"))
    exploded.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(s => col(s"m$s")): _*).as("sig"))
  }

  /** LSH banding of a signature table (id, sig) → (band, band_key, id,
    * sig): one row per band, keyed by the band's joined values. */
  private def bandSignatures(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1), lit(1)),
        b => array_join(slice(col("sig"), b * r + 1, lit(r)).cast("array<string>"), ","))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Rename a banded table to one side of a pair join (suffix "a"/"b"). */
  private def bandSide(banded: DataFrame, side: String): DataFrame =
    banded.select(col("band"), col("band_key"),
      col("id").as(s"id_$side"), col("sig").as(s"sig_$side"))

  /** Join two banded sides on their bucket and keep pairs whose
    * full-signature agreement ≥ `threshold` (the MinHash Jaccard
    * estimate, counted by the native [[graft.expr.VecEqCount]] kernel).
    * Output: (id_a, id_b, est_jaccard), NOT yet deduped across bands. */
  private def scoreBandedPairs(a: DataFrame, b: DataFrame,
                               k: Int, threshold: Double): DataFrame =
    a.join(b, Seq("band", "band_key"))
      .select(col("id_a"), col("id_b"),
        (call_function("vec_eq_count", col("sig_a"), col("sig_b"))
          .cast("double") / lit(k)).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)

  /** LSH candidate pairs from MinHash signatures: band the signature,
    * shuffle once on (band, bandKey), emit intra-bucket pairs, then keep
    * pairs whose full-signature agreement ≥ `threshold`.
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    */
  def minhashCandidatePairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, bands: Int = 16, ngram: Int = 3, threshold: Double = 0.7): DataFrame = {
    // signatures are ~100× more expensive than the join — materialize once
    // so the self-join's two sides don't each recompute k×|shingles| hashes.
    // Fan the batch corpus out first: the k per-shingle perm-mins run in
    // the scan stage's partial aggregate, which is one task on a one-row-
    // group toy scan (guide §2.6; pass-through at real scan parallelism).
    // Deliberately NOT inside minhashSignatures itself — the incremental/
    // stream paths call it per delta-sized batch, where an extra exchange
    // is pure per-batch stage cost.
    val sigs = minhashSignatures(
        SimilarityOps.fanOutSmall(df.select(col(idCol), col(textCol))),
        textCol, idCol, k, ngram)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = bandSignatures(sigs, k, bands)
    scoreBandedPairs(bandSide(banded, "a"), bandSide(banded, "b"), k, threshold)
      .where(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Incremental MinHash-LSH dedup: dedup a NEW batch of documents against
    * an existing signature store (and against itself) WITHOUT recomputing
    * or rescanning the corpus text. Returns
    * `(survivors of newDocs, updated signature store)` — feed the updated
    * store to the next increment.
    *
    * Cost is O(increment): only the increment's signatures are computed
    * (one text pass); the store side is a map-only banding of stored
    * signatures semi-joined down to the increment's buckets before any
    * pair scoring. At 100 TB this replaces a full-corpus dedup per
    * ingestion batch with work proportional to the batch — persist the
    * store bucketed on (band, band_key) ([[graft.sources.TableStore
    * .saveBucketed]]) and the semi-join prunes at the scan.
    *
    * Drop rule: a new doc matching ANY stored doc (est_jaccard ≥
    * threshold) is dropped; within the increment, min-id-wins (same as
    * [[minhashDedup]]). Stored docs are never dropped — the store only
    * grows, keeping increments idempotent-safe to re-run for every doc
    * that HAS a signature. Docs with fewer than `ngram` tokens have no
    * shingles, hence no signature: they always survive and are never
    * added to the store (route short docs through [[exactDedup]] if they
    * need dedup — MinHash is undefined on an empty shingle set).
    *
    * Both outputs are locally checkpointed before return (bounded by the
    * increment size), so the per-increment caches are released here — a
    * long ingestion loop accumulates no cached blocks. */
  def incrementalMinhashDedup(
      newDocs: DataFrame, textCol: String, idCol: String, existingSigs: DataFrame,
      k: Int = 64, bands: Int = 16, ngram: Int = 3, threshold: Double = 0.7)
      : (DataFrame, DataFrame) = {
    val (survivors, keptNewBanded) = incrementalMinhashDedupBanded(
      newDocs, textCol, idCol, bandSignatures(existingSigs, k, bands),
      k, bands, ngram, threshold)
    // every signed id carries its full sig on each of its band rows —
    // the band-0 slice is exactly the increment's surviving (id, sig) set
    val keptNewSigs = keptNewBanded.where(col("band") === 0).select("id", "sig")
    (survivors, existingSigs.unionByName(keptNewSigs))
  }

  /** The banded-STORE layout for a corpus: one row per (band, band_key,
    * id, sig) — k-minhash signatures LSH-banded into their bucket keys.
    * This is the shape the incremental path joins against, hence the
    * shape to PERSIST between ingestion batches
    * ([[graft.sources.TableStore.saveBucketed]] on (band, band_key)):
    * absorption then reads the store from parquet with no banding
    * recompute and no store-side shuffle. */
  def minhashStore(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 64, bands: Int = 16, ngram: Int = 3): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    bandSignatures(minhashSignatures(df, textCol, idCol, k, ngram), k, bands)
  }

  /** The LIVE view of an epoch-stamped signature store under TOMBSTONE
    * deletion — how a parquet-persisted store (append-only by nature)
    * supports the `removed`/`changed` half of a [[graft.functions
    * .TextFunctions.snapshotDiff]] without rewriting data files:
    * deletions land as (id, before_epoch) tombstone rows in a side
    * table; replacements/additions append with a higher epoch; a read is
    * the anti-join below. Periodic compaction = `save(liveStore(...))`
    * fresh + truncate tombstones — the same merge-on-read → compact
    * cycle every table format with deletion vectors runs, expressed in
    * plain DataFrames.
    *
    * Scale shape: tombstones are delta-sized (broadcast in practice; the
    * hint is left to AQE since a mass-deletion epoch can exceed the
    * threshold), and the anti-join keys on the 8-byte id — no signature
    * payload moves for dropped rows.
    *
    * @param store signature rows with an `epoch` column
    * @param tombstones (id, before_epoch): hide store rows of `id` with
    *                   epoch < before_epoch
    */
  def liveStore(store: DataFrame, tombstones: DataFrame): DataFrame =
    graft.sources.TableStore.liveView(store, tombstones, "id", "epoch")

  /** COMPACTION of an epoch-appended signature store under tombstones —
    * the second half of [[liveStore]]'s merge-on-read cycle (the
    * signature-store twin of [[graft.functions.GraphOps.compactLabels]]):
    * rewrite the live view at epoch 0, then truncate the tombstone
    * table. Semantics-preserving by definition —
    * `liveStore(compactStore(s, t), ∅) ≡ liveStore(s, t)` (the q169
    * gate) — and restores read cost to a bare bucketed scan once the
    * delta+tombstone mass makes the per-read anti-join material. One
    * anti-join over the store; persist the result with the SAME
    * (band, band_key) bucketing so absorbs keep their no-shuffle scan.
    * The rewritten epoch keeps the INPUT's epoch type (int or long
    * stores both exist) — a bare `lit(0)` would silently narrow a
    * long-epoch store and make the next Append schema-conflict. */
  def compactStore(store: DataFrame, tombstones: DataFrame): DataFrame =
    liveStore(store, tombstones)
      .withColumn("epoch", lit(0L).cast(store.schema("epoch").dataType))

  /** [[incrementalMinhashDedup]] against an ALREADY-BANDED store (the
    * [[minhashStore]] layout, typically reloaded from its bucketed
    * parquet table) — the true persisted-store lifecycle: nothing about
    * the store is recomputed; its scan is map-only, semi-joined down to
    * the increment's buckets via an explicit broadcast (an
    * unmaterialized increment has no reliable size estimate — left to
    * the planner, a sort-merge semi-join would shuffle the ENTIRE
    * store, exactly the full-corpus cost this function avoids).
    *
    * Returns `(survivors of newDocs, kept increment rows in store
    * layout)` — append the second frame to the store table
    * (`SaveMode.Append`, same bucketing) to make the store current. */
  def incrementalMinhashDedupBanded(
      newDocs: DataFrame, textCol: String, idCol: String, bandedStore: DataFrame,
      k: Int = 64, bands: Int = 16, ngram: Int = 3, threshold: Double = 0.7)
      : (DataFrame, DataFrame) = {
    graft.expr.GraftFunctions.register(newDocs.sparkSession)
    val newSigs = minhashSignatures(newDocs, textCol, idCol, k, ngram)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBanded = bandSignatures(newSigs, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // checkpoint the (increment-bounded) results, then drop the caches —
    // the returned frames must not depend on blocks this call pinned
    val dropIds = absorbDropIds(newBanded, bandedStore, k, threshold).localCheckpoint(true)
    val keptNewBanded = newBanded
      .join(dropIds, newBanded("id") === dropIds("drop_id"), "left_anti")
      .localCheckpoint(true)
    newSigs.unpersist(blocking = false)
    newBanded.unpersist(blocking = false)
    val survivors = newDocs.join(dropIds, newDocs(idCol) === dropIds("drop_id"), "left_anti")
    (survivors, keptNewBanded)
  }

  /** The LAZY absorb-stage plan — drop ids of a banded increment vs the
    * banded store (any match ≥ threshold drops the new doc) and vs
    * itself (min-id-wins). Factored out so PlanAudit can explain the
    * pre-checkpoint shape that [[incrementalMinhashDedupBanded]]'s
    * eager lineage truncation hides from the gate query's plan: the
    * store branch must read its parquet scan map-only behind the
    * broadcast semi-join, with no store-side Exchange. */
  private[graft] def absorbDropIds(newBanded: DataFrame, bandedStore: DataFrame,
                                   k: Int, threshold: Double): DataFrame = {
    val storePruned = bandedStore
      .join(broadcast(newBanded.select("band", "band_key").distinct()),
        Seq("band", "band_key"), "left_semi")
    val newA = bandSide(newBanded, "a")
    // vs store: ANY match drops the new doc; within batch: min-id-wins
    val dropVsStore = scoreBandedPairs(newA, bandSide(storePruned, "b"), k, threshold)
      .select(col("id_a").as("drop_id"))
    val dropInBatch = scoreBandedPairs(newA, bandSide(newBanded, "b"), k, threshold)
      .where(col("id_a") < col("id_b"))
      .select(col("id_b").as("drop_id"))
    dropVsStore.union(dropInBatch).distinct()
  }

  /** MinHash-LSH dedup: rows whose id appears as the larger member of a
    * near-dup pair are dropped; returns the surviving rows. (Greedy
    * min-id-wins; a full connected-components pass is [[dedupClusters]].) */
  def minhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, bands: Int = 16, ngram: Int = 3, threshold: Double = 0.7): DataFrame = {
    val dupIds = minhashCandidatePairs(df, textCol, idCol, k, bands, ngram, threshold)
      .select(col("id_b").as("drop_id")).distinct()
    df.join(dupIds, df(idCol) === dupIds("drop_id"), "left_anti")
  }

  /** Connected components over candidate pairs via iterated label
    * propagation (min-id label, converges in ≤ diameter rounds; near-dup
    * clusters are tiny so 5 rounds is plenty at any scale). */
  def dedupClusters(pairs: DataFrame, rounds: Int = 5): DataFrame = {
    // persist the DIRECTED pairs before mirroring them — the union's two
    // branches would otherwise each re-execute the (expensive) upstream
    // candidate-pair pipeline; post-shuffle stages are not deduplicated by
    // exchange reuse. (`pairs` rows are unique per (id_a, id_b) with
    // id_a < id_b — every candidate-pair operator here guarantees that —
    // so the two directions can't collide and no dedup shuffle is needed.)
    val p = pairs.select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p.union(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    if (rounds <= 0) { // node set with untouched identity labels
      val nodes = edges.select(col("id_a").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true) // materialize so the cache can be released
      p.unpersist(blocking = false)
      return nodes
    }
    // Fused init+first round: labels start as each node's own id, so round
    // 1's propagated label is simply min(self, min(neighbor)) — ONE hash
    // aggregate, no join against an identity label table.
    // Lazy localCheckpoints: the convergence-sum action below materializes
    // the round's labels AND reads the sum in ONE Spark job (an eager
    // checkpoint would spend a separate job per round on materialization).
    var labels = edges.groupBy(col("id_a").as("id"))
      .agg(least(min(col("id_b")), first(col("id_a"))).as("label"))
      .localCheckpoint(false)
    // min-label propagation strictly decreases the label sum until the
    // fixpoint — early-exit on convergence (near-dup components are tiny,
    // so this usually stops after 1-2 rounds regardless of corpus size).
    // An EMPTY pair set sums to NULL (sum over zero rows) — read it as 0
    // rather than crashing: a guard/threshold regime that admits no
    // pairs is a valid outcome (every doc its own singleton downstream)
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum("label")).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var prevSum = labelSum(labels)
    var r = 1
    var converged = false
    while (r < rounds && !converged) {
      // self-loops carry each node's own label through the aggregate, so
      // one join + one min-aggregate replaces the join + aggregate +
      // label-merge left-join shape (fewer exchanges per round; identical
      // fixpoint — min(own, neighbors) either way)
      val withSelf = edges.union(labels.select(col("id").as("id_a"), col("id").as("id_b")))
      labels = withSelf.join(labels, withSelf("id_b") === labels("id"))
        .groupBy(withSelf("id_a").as("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val curSum = labelSum(labels)
      converged = curSum == prevSum
      prevSum = curSum
      r += 1
    }
    p.unpersist(blocking = false)
    labels
  }

  /** Quality-aware near-dup dedup: one REPRESENTATIVE per cluster instead
    * of keep-first (the FineWeb/RefinedWeb practice — when a page exists in
    * several crawl snapshots, keep the most complete capture, not the one
    * with the smallest id). Clusters come from [[dedupClusters]] over the
    * caller's candidate pairs; the representative is the member maximizing
    * `(lenCol, -id)` — "longest, ties to the smallest id". The tie-break
    * chain is ALL-INTEGER by design: a float quality score would make the
    * argmax FP-rounding-sensitive across engines, while "most complete =
    * longest" is both the standard heuristic and exactly reproducible.
    *
    * Scale shape: label propagation as [[dedupClusters]] (tiny components,
    * early-exit rounds); then ONE aggregate + ONE join, both keyed by
    * cluster id — cluster sizes are near-dup component sizes (bounded), so
    * no skewed reducer. Docs untouched by any pair are their own singleton
    * cluster via `coalesce(label, id)` — map-side, never shuffled into the
    * label table.
    *
    * @return (id, cluster, kept) for every input row; `kept` marks the
    *         cluster representative (exactly one per cluster)
    */
  def clusterRepresentatives(df: DataFrame, pairs: DataFrame,
                             idCol: String, lenCol: String): DataFrame = {
    val labels = dedupClusters(pairs)
    val lab = df.select(col(idCol).as("id"), col(lenCol).cast("long").as("__len"))
      .join(labels, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("label"), col("id")))
    val rep = lab.groupBy("cluster")
      .agg(max(struct(col("__len"), (-col("id")).as("nid"))).as("m"))
      .select(col("cluster"), (-col("m.nid")).as("__rep"))
    lab.join(rep, Seq("cluster"))
      .select(col("id"), col("cluster"), (col("id") === col("__rep")).as("kept"))
  }

  /** 60-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes ([[hash60]], md5-derived → engine-portable). Lambda
    * formulation — same math as the native [[graft.expr.SimHash64]]. */
  def simhash(text: Column): Column = {
    val hashes = transform(tokens(lower(text)), t => hash60(t))
    val sig = aggregate(
      sequence(lit(0), lit(59), lit(1)),
      lit(0L),
      (acc, bit) => {
        val vote = aggregate(hashes, lit(0L),
          (v, h) => v + when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        acc.bitwiseOR(when(vote > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L)))
      })
    // whitespace-only text has no tokens (`tokens` yields [""] there)
    when(length(trim(text)) === 0, lit(0L)).otherwise(sig)
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming`, blocked
    * on 15-bit chunks of the 60-bit signature (pigeonhole guarantees full
    * recall for maxHamming ≤ 3; larger bounds trade recall for the same
    * single shuffle). Signatures come from the native
    * [[graft.expr.SimHash64]] expression and are materialized once so the
    * self-join doesn't recompute them. */
  def simhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            maxHamming: Int = 3): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val sigs = df.select(col(idCol).as("id"),
      call_function("simhash64", col(textCol)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3), lit(1)),
        c => call_function("shiftright", col("sig"), c * 15).bitwiseAND(0x7FFFL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("sig").as("sig_b"))
    val hamming = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    a.join(b, Seq("chunk", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** GENERIC Hamming near-dup pairs over ANY precomputed 64-bit
    * signature column (image perceptual hashes — q222, audio
    * fingerprints, any bit-signature), via MULTI-INDEX pigeonhole
    * blocking (Manku, Jain & Das Sarma, WWW 2007 §3): the word splits
    * into 6 disjoint chunks (4×11 + 2×10 bits); ≤ 3 bit errors touch
    * ≤ 3 chunks, so ≥ 3 chunks survive untouched and the pair agrees
    * EXACTLY on at least one of the C(6,3) = 20 chunk TRIPLES — the
    * candidate join keys on (triple id, 3 chunk values) packed into one
    * long, and the result is exactly the ≤ maxHamming pair set
    * (recall-lossless for maxHamming ≤ 3).
    *
    * WHY triples, not single chunks: single-chunk keys are only 10–16
    * bits, so RANDOM cross-corpus collisions contribute ~n²/2^bits
    * candidates — quadratic with a small constant, measured 116 s at
    * n = 500k (the first q222 cut with 4×16-bit chunks). Triple keys
    * are ~33 bits: collisions ~20·n²/2³³ stay negligible past 10⁷
    * rows, at the cost of a 20× (still LINEAR) key expansion.
    *
    * Scale shape: one shuffle of 20n 16-byte rows keyed by the packed
    * long; verify is one xor+popcount per candidate. A corpus of
    * near-identical signatures (one giant true dup cluster) still
    * degrades to its quadratic TRUE pair set — that is output size,
    * not blocking waste. */
  def hammingNearDupPairs(sigs: DataFrame, idCol: String, sigCol: String,
                          maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"6 chunks / C(6,3) triples are recall-lossless only for maxHamming <= 3, got $maxHamming")
    val shifts = Seq(0, 11, 22, 33, 44, 54)
    val widths = Seq(11, 11, 11, 11, 10, 10)
    def chunk(c: Column, i: Int): Column =
      shiftright(c, shifts(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val triples = (0 until 6).combinations(3).toSeq.zipWithIndex
    def keys(c: Column): Column = array(triples.map { case (t, id) =>
      lit(id.toLong) * lit(1L << 33) + chunk(c, t(0)) * lit(1L << 22) +
        chunk(c, t(1)) * lit(1L << 11) + chunk(c, t(2))
    }: _*)
    // pin the signatures: both join sides read them, and the upstream
    // chain (for q222/q225, a full media decode per row) must run ONCE —
    // the simhashCandidatePairs discipline
    val s = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = s.select(col("id"), col("sig"), explode(keys(col("sig"))).as("k"))
    val a = keyed.select(col("k"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = keyed.select(col("k"), col("id").as("id_b"), col("sig").as("sig_b"))
    val hamming = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    val res = a.join(b, Seq("k"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .localCheckpoint(true)
    s.unpersist(blocking = false)
    res
  }

  /** DEDUP QUALITY AUDIT — precision/recall/F1 of a Hamming-annotated
    * candidate pair set against a LABELED truth pair set, swept over
    * distance thresholds: the measurement that turns "we deduped" into
    * "at threshold t we keep X‰ precision at Y‰ recall", i.e. the
    * operating-point curve every production dedup tunes on (labeled
    * audit samples, planted duplicates, or a golden subset).
    *
    * Integer milli metrics throughout (n·1000 div d with zero-guards —
    * ANSI-safe), so the curve is engine-exact. Truth pairs canonicalize
    * to (min, max) and dedup; thresholds fan out over the ALREADY
    * computed pair set, so the sweep costs one broadcast cross-join of
    * a |thresholds|-row frame — the expensive pair generation is paid
    * once upstream.
    *
    * @param pairs (idACol, idBCol, hammingCol) — e.g.
    *              [[hammingNearDupPairs]] output at the loosest cut
    * @param truth (idACol, idBCol) labeled duplicate pairs
    * @return (threshold, n_pred, n_tp, n_truth, precision_milli,
    *         recall_milli, f1_milli), one row per threshold */
  def pairQualityAudit(pairs: DataFrame, truth: DataFrame,
                       idACol: String, idBCol: String, hammingCol: String,
                       thresholds: Seq[Int]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = pairs.sparkSession
    import spark.implicits._
    val t = truth.select(
        least(col(idACol), col(idBCol)).as("id_a"),
        greatest(col(idACol), col(idBCol)).as("id_b"))
      .where(col("id_a") =!= col("id_b")).distinct()
    val p = pairs.select(
      least(col(idACol), col(idBCol)).as("id_a"),
      greatest(col(idACol), col(idBCol)).as("id_b"),
      col(hammingCol).as("__h"))
    val flagged = p.join(t.withColumn("__tp", lit(1L)), Seq("id_a", "id_b"), "left")
      .localCheckpoint(true) // pair generation upstream is paid once
    val th = thresholds.toDF("threshold")
    val nTruth = t.agg(count(lit(1)).as("n_truth"))
    broadcast(th)
      .join(flagged, col("__h") <= col("threshold"), "left")
      .groupBy("threshold")
      .agg(count(col("__h")).as("n_pred"),
        coalesce(sum("__tp"), lit(0L)).as("n_tp"))
      .crossJoin(broadcast(nTruth))
      .withColumn("precision_milli",
        when(col("n_pred") > 0, expr("n_tp * 1000 div n_pred")).otherwise(lit(0L)))
      .withColumn("recall_milli",
        when(col("n_truth") > 0, expr("n_tp * 1000 div n_truth")).otherwise(lit(0L)))
      .withColumn("f1_milli",
        when(col("precision_milli") + col("recall_milli") > 0,
          expr("2 * precision_milli * recall_milli div (precision_milli + recall_milli)"))
          .otherwise(lit(0L)))
  }

  /** Passage-level (sub-document) dedup: split each document into
    * fixed-size token chunks, keep only the corpus-wide FIRST occurrence of
    * each distinct chunk (ordered by (doc_id, chunk_idx)), and reassemble
    * the surviving passages per document. The standard defense against
    * boilerplate (headers, licenses, navigation) that exact whole-doc dedup
    * misses. Output: (doc_id, n_chunks, n_kept, kept_fp) where kept_fp
    * fingerprints the surviving text in chunk order.
    *
    * Scale design: chunks shuffle once on their 60-bit hash for the
    * first-occurrence aggregate (map-side min-combine), then once on doc_id
    * for reassembly — no all-pairs, no driver state. The chunk hash (not
    * the text) is the join key: 8-byte shuffle keys.
    */
  def passageDedup(df: DataFrame, textCol: String, idCol: String,
                   chunkTokens: Int = 32): DataFrame = {
    // persist: chunking (tokenize + explode + md5) feeds both the
    // first-occurrence aggregate and the probe side of the join — without
    // the cache the whole chunk pipeline executes twice (post-shuffle
    // stages are not deduplicated by exchange reuse)
    val chunks = TextFunctions.chunkByTokens(df, textCol, idCol, chunkTokens, overlap = 0)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"),
        hash60(col("chunk_text")).as("h"),
        // lexicographic (doc, idx) occurrence key — struct min, so the
        // keep-first ordering holds for any id sign or document length
        struct(col(idCol), col("chunk_idx")).as("okey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstOcc = chunks.groupBy("h").agg(min(col("okey")).as("first_key"))
    chunks.join(firstOcc, Seq("h"))
      .withColumn("keep", col("okey") === col("first_key"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        md5(to_binary(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("chunk_idx"), col("chunk_text"))))),
          s => s("chunk_text")), " "), lit("utf-8"))).as("kept_fp"))
  }

  /** The ONE sliding-window content-hash frame shared by span detection
    * and span removal — any change to the windowing convention
    * (tokenizer, hash, alignment) lands in both or neither. Input must
    * carry the tokenized corpus as an array column `t`; emits one row
    * per window start: (idCol, pos, h). */
  private def windowHashFrame(td: DataFrame, idCol: String, W: Int): DataFrame =
    td.where(size(col("t")) >= W)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("t")) - W),
        i => hash60(array_join(slice(col("t"), i + 1, lit(W)), " ")))).as(Seq("pos", "h")))

  /** Exact duplicated-substring SPANS (the token-level rendition of the
    * suffix-array exact-substring dedup of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * every run of ≥ `windowTokens` consecutive tokens that appears at
    * least `minOccurrences` times anywhere in the corpus (other docs OR
    * the same doc) is reported as a maximal merged span per document —
    * the spans a span-removal pass would cut, where [[passageDedup]]
    * (non-overlapping fixed chunks, keep-first) would miss any duplicate
    * not aligned to a chunk boundary.
    *
    * Shape: one sliding-window hash pass (`transform` over the token
    * array — narrow, O(tokens·W) hashing, rows = token count), one
    * (h)-keyed count aggregate with 8-byte keys, one join back, and a
    * PER-DOC window (partitionBy doc — bounded by document length, never
    * corpus-wide) for the gaps-and-islands merge. Flagged windows merge
    * when they overlap or abut (gap ≤ W). Nothing is corpus-sized on the
    * driver and no window runs unpartitioned.
    *
    * @return (idCol, span_start, span_end, n_windows) per maximal span,
    *         token positions 0-based inclusive
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     windowTokens: Int = 8, minOccurrences: Long = 2): DataFrame = {
    val W = windowTokens
    require(W > 0, s"windowTokens must be positive, got $W")
    require(minOccurrences >= 2, s"minOccurrences must be >= 2, got $minOccurrences")
    // same pre-tokenization fan-out as removeDuplicateSpans (guide §2.6)
    val td = SimilarityOps.fanOutSmall(df.where(length(trim(col(textCol))) > 0)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("t"))
    val wins = windowHashFrame(td, idCol, W)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("c"))
      .where(col("c") >= minOccurrences).select("h")
    val flagged = wins.join(dup, Seq("h")).select(col(idCol), col("pos"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(idCol).orderBy("pos")
    val run = org.apache.spark.sql.expressions.Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // checkpoint-then-unpersist: span rows are tiny (one per maximal
    // span) — materialize them and release this call's window-frame
    // cache instead of leaking it into the caller's session
    val out = flagged
      .withColumn("brk", when(lag("pos", 1).over(byDoc).isNull ||
        col("pos") - lag("pos", 1).over(byDoc) > W, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(run))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + (W - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
      .localCheckpoint(true)
    wins.unpersist(blocking = false)
    out
  }

  /** Exact substring-dedup REMOVAL with the keep-first guarantee — the
    * action [[duplicateSpans]]'s detection feeds (Lee et al.
    * arXiv:2107.06499 removes all but one occurrence of every duplicated
    * span; "first" here is corpus order, i.e. the lexicographically
    * minimal `(doc_id, pos)` occurrence key — a struct min, so the
    * ordering is exact for any id sign or document length, the
    * [[passageDedup]] convention). Every token covered by a
    * NON-canonical occurrence of a duplicated window is removed UNLESS
    * it also lies inside a canonical occurrence of some duplicated
    * window — canonical coverage is protected, so each duplicated
    * string keeps at least one intact copy corpus-wide even under
    * chained overlaps (where naive non-canonical removal can destroy
    * every copy). The cost is conservative under-removal where
    * redundant and canonical windows overlap — the safe direction for
    * training data. A doc can still end up empty when all its content
    * is canonical elsewhere.
    *
    * Shape: the [[duplicateSpans]] window frame with a min-key aggregate
    * instead of a count; removed positions explode W rows per redundant
    * window (bounded by W × flagged windows), the kept-token anti-join is
    * (doc, pos)-keyed, and the fingerprint re-aggregation is per-doc.
    *
    * @return one row per non-empty doc: (idCol, n_tokens, n_removed,
    *         kept_text = the space-joined surviving tokens — the cleaned
    *         corpus a real pipeline feeds downstream — and kept_fp = its
    *         md5)
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           windowTokens: Int = 8, minOccurrences: Long = 2): DataFrame = {
    val W = windowTokens
    require(W > 0, s"windowTokens must be positive, got $W")
    require(minOccurrences >= 2, s"minOccurrences must be >= 2, got $minOccurrences")
    // fan the pre-tokenization rows out to the session parallelism: the
    // documents scan is one row group at toy scale, so tokenization, the
    // O(tokens·W) window hashing and every map-side partial otherwise
    // run in a single task (guide §2.6; the fanOutSmall ≥-parallelism
    // guard makes this a no-op on a real corpus scan). All downstream
    // aggregates/joins are keyed, so results are unchanged.
    val td = SimilarityOps.fanOutSmall(df.where(length(trim(col(textCol))) > 0)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wins = windowHashFrame(td, idCol, W)
      .withColumn("okey", struct(col(idCol), col("pos")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = wins.groupBy("h")
      .agg(count(lit(1)).as("c"), min("okey").as("fk"))
      .where(col("c") >= minOccurrences)
    val marked = wins.join(dup, Seq("h"))
    def cover(cond: Column) = marked.where(cond)
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (W - 1))).as("tp"))
      .distinct()
    // canonical coverage is PROTECTED: a token inside the first occurrence
    // of any duplicated window survives even when an overlapping window's
    // non-canonical occurrence also covers it — without this, chained
    // overlaps can destroy every copy of a duplicated string (conservative
    // under-removal is the safe direction for training data)
    val removed = cover(col("okey") =!= col("fk"))
      .join(cover(col("okey") === col("fk")), Seq(idCol, "tp"), "left_anti")
    val tok = td.select(col(idCol), posexplode(col("t")).as(Seq("tp", "word")))
    val kept = tok.join(removed, Seq(idCol, "tp"), "left_anti")
    val perDoc = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("word")))),
          s => s("word")), " ").as("kt"))
    // checkpoint-then-unpersist: the result IS the cleaned corpus — the
    // natural stage boundary a real pipeline materializes before feeding
    // downstream (and exactly what q98 consumes) — so eager-checkpoint
    // it, truncating lineage for every consumer, and release the
    // token/window caches this call pinned
    val out = td.select(col(idCol), size(col("t")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("kt"), lit("")).as("kept_text"),
        md5(to_binary(coalesce(col("kt"), lit("")), lit("utf-8"))).as("kept_fp"))
      .localCheckpoint(true)
    wins.unpersist(blocking = false)
    td.unpersist(blocking = false)
    out
  }

  /** Exact n-gram Jaccard near-dup pairs via a PREFIX-FILTERED
    * set-similarity join (SSJoin/PPJoin family — Chaudhuri/Ganti/Kaushik
    * ICDE 2006, Xiao et al. WWW 2008):
    *
    * Under a global rarest-first token order (doc frequency asc, hash
    * asc), any pair with jaccard ≥ t shares its smallest common token
    * inside BOTH docs' first (|s| - ⌈t·|s|⌉ + 1) tokens — proof: J ≥ t
    * implies |a∩b| ≥ t·|a|, so if every token before the smallest common
    * one were non-shared the intersection couldn't reach t·|a|. Candidate
    * generation therefore joins ONLY on prefix tokens — the hottest
    * (most frequent) tokens never enter the join, which removes the df²
    * blowup that makes a naive shingle self-join quadratic on skewed
    * corpora. Verification computes the exact intersection from each
    * doc's full (deduped) hash set, so results are IDENTICAL to the
    * naive join at any threshold.
    *
    * Join keys are 60-bit [[hash60]] values, not strings: 8-byte
    * fixed-width shuffle keys (and the oracle joins on the identical
    * hash, so even a collision — P ≈ n²/2^61 — can't diverge the two
    * engines).
    *
    * Skew guard: shingles appearing in > `maxDocFreq` docs are dropped
    * via a BROADCAST anti-join (the hot set is tiny by definition);
    * recall then drops only for pairs whose every shared shingle is
    * ubiquitous. `maxDocFreq <= 0` disables the guard — with prefix
    * filtering the guard is no longer needed for performance, it remains
    * only as an explicit recall/cost knob.
    *
    * EAGER: the returned (pair-bounded) frame is materialized via
    * `localCheckpoint(true)` before the call returns — the internal
    * caches release deterministically, but the caller pays the full
    * computation AT CALL TIME, downstream filters no longer push into
    * the pair scan, and checkpoint blocks are unrecoverable on executor
    * loss (re-call the operator in long production jobs rather than
    * relying on recompute). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDocFreq: Long = 1000): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val ex = explodedShingles(df, textCol, idCol, n)
    // checkpoint the (threshold-bounded) pair output, then release the
    // corpus-sized exploded cache — a long-lived session running many
    // dedup calls must not accumulate pinned shingle blocks (the
    // pageRank cleanup discipline)
    val pairs = jaccardPairsFromExploded(ex, threshold, maxDocFreq)
      .localCheckpoint(true)
    ex.unpersist(blocking = false)
    pairs
  }

  /** [[ngramJaccardPairs]] with the hot-shingle guard DERIVED from a
    * candidate-pair budget instead of fixed: the guard `g` is the largest
    * doc-frequency such that the candidate pairs the kept shingles can
    * generate — Σ over shingles with df ≤ g of df·(df−1)/2 — stays within
    * `candidateBudget`. This is the scale contract a fixed absolute guard
    * cannot give: as the corpus grows, per-shingle df grows toward a fixed
    * cap and pair work grows superlinearly per decade (measured 6.7× for
    * the sf1→sf10 decade at maxDocFreq=1000), while a budget expressed in
    * PAIRS pins the join's work directly — grow the budget linearly with
    * the corpus and the candidate stage scales linearly by construction,
    * with recall loss confined to the hottest (least informative)
    * shingles, exactly the ones the fixed guard dropped late.
    *
    * Derivation cost: the doc-frequency aggregate the operator needs
    * anyway, folded to a HISTOGRAM keyed by df value (distinct-df-sized,
    * model data: tens of rows even at corpus scale because pair work
    * explodes long before many distinct df values accumulate under any
    * sane budget), then one ordered cumulative sum over it. The work sums
    * are DOUBLES on both engines (a long Σ df² overflows at corpus scale
    * under ANSI; sub-ulp rounding at the budget boundary moves a cost
    * knob, never a result, and the ordered window sums are IEEE-identical
    * across engines so the DERIVED GUARD itself is engine-exact). The
    * chosen guard returns to the driver as one scalar — a planning
    * parameter folded into the plan as a literal, the same role as a
    * broadcast bloom filter's bit count.
    *
    * Guard floor is 1 (df=1 shingles generate zero pairs, so a budget too
    * small for any df level still yields a valid — empty — candidate
    * set rather than an unguarded explosion).
    *
    * EAGER — materializes at call time; see [[ngramJaccardPairs]]. */
  def ngramJaccardPairsBudget(df: DataFrame, textCol: String, idCol: String,
                              n: Int = 3, threshold: Double = 0.8,
                              candidateBudget: Long = 10000000L): DataFrame = {
    require(candidateBudget >= 1, s"candidateBudget must be >= 1, got $candidateBudget")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val ex = explodedShingles(df, textCol, idCol, n)
    val pairs = jaccardPairsFromExploded(ex, threshold,
      budgetGuard(ex, candidateBudget))
      .localCheckpoint(true) // see ngramJaccardPairs: release ex below
    ex.unpersist(blocking = false)
    pairs
  }

  /** The largest doc-frequency guard whose kept-shingle candidate-pair
    * work Σ_{df≤g} df·(df−1)/2 fits `candidateBudget` (≥ 1 — see
    * [[ngramJaccardPairsBudget]]). `ex` is the exploded (id, sz, h)
    * frame; the histogram window is global but histogram-sized. */
  private def budgetGuard(ex: DataFrame, candidateBudget: Long): Long = {
    val wk = ex.groupBy("h").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("nh"))
      .withColumn("work",
        sum(col("nh").cast("double") * col("df").cast("double") *
          (col("df") - 1).cast("double") / lit(2.0))
          .over(org.apache.spark.sql.expressions.Window.orderBy("df")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
    val r = wk.where(col("work") <= lit(candidateBudget.toDouble))
      .agg(max("df")).head()
    if (r.isNullAt(0)) 1L else math.max(1L, r.getLong(0))
  }

  /** One row per (id, distinct shingle hash), with the doc's shingle-set
    * size alongside — the shared input frame of the Jaccard family,
    * persisted because every consumer reads it at least twice. */
  private def explodedShingles(df: DataFrame, textCol: String,
                               idCol: String, n: Int): DataFrame =
    // fan the pre-shingling rows out to the session parallelism: the
    // corpus scan is one row group at toy scale, so the O(tokens·n)
    // shingle hashing + explode otherwise runs in one task (guide §2.6;
    // the ≥-parallelism guard passes a real corpus scan through). Every
    // consumer keys on (h) or (id) — results unchanged.
    SimilarityOps.fanOutSmall(
        df.select(col(idCol).as("id"), col(textCol).as("__sht")))
      .select(col("id"), shingleHashes(col("__sht"), n).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def jaccardPairsFromExploded(ex: DataFrame, threshold: Double,
                                       maxDocFreq: Long): DataFrame = {
    if (threshold >= PrefixFilterThreshold) {
      // prefix-filtered path: join cost scales with (1-t)² of the naive
      // join AND skips the hottest tokens — the win grows with t. The
      // doc-frequency join powers BOTH the guard filter and the prefix
      // order, so the df aggregate runs exactly once.
      val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
      val withDf = ex.join(dfreq, Seq("h"))
      val filtered =
        if (maxDocFreq <= 0) withDf else withDf.where(col("df") <= maxDocFreq)
      // prefix length |s| - ceil(t·|s|) + 1; the 1e-9 nudge keeps an IEEE
      // product like 0.55·100 = 55.000000000000006 from ceiling one too
      // high and silently SHORTENING the prefix (dropping true pairs) —
      // nudging down can only lengthen the prefix, which stays exact
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("df", "h")
      val prefix = filtered
        .withColumn("pos", row_number().over(w))
        .where(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
        .select("h", "id", "sz")
      // candidates: pairs sharing ≥1 prefix token (complete by the prefix
      // lemma above); distinct — two prefixes may share several tokens
      val cand = prefix.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
        .join(prefix.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sz_a", "sz_b").distinct()
      // exact verification: intersection of the full (post-guard) hash
      // sets — built ONLY for docs that appear in a candidate pair (the
      // array payloads of non-candidates never cross a shuffle); |a| and
      // |b| stay the ORIGINAL set sizes (guard semantics: dropped hot
      // shingles can't count as shared, but still count toward size)
      val candIds = cand.select(col("id_a").as("id"))
        .union(cand.select(col("id_b").as("id"))).distinct()
      val sets = filtered.join(candIds, Seq("id"), "left_semi")
        .groupBy("id").agg(collect_list(col("h")).as("hs"))
      cand
        .join(sets.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).as("c"),
          col("sz_a"), col("sz_b"))
        .select(col("id_a"), col("id_b"),
          (col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c"))).as("jaccard"))
        .where(col("jaccard") >= threshold)
    } else {
      // low thresholds: the prefix keeps > half of every doc, so its
      // extra shuffles (df join, per-doc window, verification joins) cost
      // more than they prune — the direct count join is cheaper, and the
      // broadcast-anti hot-shingle guard covers skew without re-shuffling
      // the exploded table
      val filtered =
        if (maxDocFreq <= 0) ex
        else {
          val hot = ex.groupBy("h").agg(count(lit(1)).as("df"))
            .where(col("df") > maxDocFreq).select("h")
          ex.join(broadcast(hot), Seq("h"), "left_anti")
        }
      val common = filtered
        .select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
        .join(filtered.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")),
          Seq("h"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b").agg(count(lit(1)).as("c"))
      common
        .select(col("id_a"), col("id_b"),
          (col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c"))).as("jaccard"))
        .where(col("jaccard") >= threshold)
    }
  }

  /** CROSS-CORPUS n-gram Jaccard join (R ⋈ S, not a self-join): exact
    * Jaccard pairs between a probe corpus and a reference corpus — the
    * exact-side companion of [[incrementalMinhashDedupBanded]] for
    * auditing a new crawl against an existing corpus (or an eval set
    * against training data) without forming the union's self-pairs.
    * Shared-shingle candidates only, one hash-keyed join between the
    * two exploded sides; the hot-shingle guard drops shingles whose
    * COMBINED document frequency across both corpora exceeds
    * `maxDocFreq` (hot in either side explodes the join the same way),
    * with the [[ngramJaccardPairs]] size-preservation semantics —
    * dropped shingles still count toward |R| and |S|, so the guard can
    * only lower a score. Pair work is Σ_h dfR_h·dfS_h over kept
    * shingles. `maxDocFreq <= 0` disables the guard.
    *
    * EAGER — materializes at call time; see [[ngramJaccardPairs]].
    *
    * @return (id_r, id_s, jaccard) with jaccard ≥ threshold
    */
  def ngramJaccardJoin(r: DataFrame, s: DataFrame,
                       textCol: String, idCol: String,
                       n: Int = 3, threshold: Double = 0.8,
                       maxDocFreq: Long = 1000): DataFrame = {
    graft.expr.GraftFunctions.register(r.sparkSession)
    val exR = explodedShingles(r, textCol, idCol, n)
    val exS = explodedShingles(s, textCol, idCol, n)
    val (fR, fS) =
      if (maxDocFreq <= 0) (exR, exS)
      else {
        val hot = exR.select("h").union(exS.select("h"))
          .groupBy("h").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDocFreq).select("h")
        (exR.join(broadcast(hot), Seq("h"), "left_anti"),
          exS.join(broadcast(hot), Seq("h"), "left_anti"))
      }
    val pairs = fR.select(col("h"), col("id").as("id_r"), col("sz").as("sz_r"))
      .join(fS.select(col("h"), col("id").as("id_s"), col("sz").as("sz_s")), Seq("h"))
      .groupBy("id_r", "id_s", "sz_r", "sz_s").agg(count(lit(1)).as("c"))
      .select(col("id_r"), col("id_s"),
        (col("c").cast("double") / (col("sz_r") + col("sz_s") - col("c"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .localCheckpoint(true) // see ngramJaccardPairs: release both sides
    exR.unpersist(blocking = false)
    exS.unpersist(blocking = false)
    pairs
  }

  /** GOLDEN RECORD (survivorship) — the step after record linkage
    * decides WHICH rows co-refer ([[editDistancePairs]] /
    * [[sortedNeighborhoodPairs]] → [[dedupClusters]]): fuse each
    * cluster into one record by MAJORITY VOTE per attribute (most
    * frequent non-null value; ties break to the smallest value, so the
    * winner is engine-exact). [[clusterRepresentatives]] keeps one
    * MEMBER; this synthesizes the consensus — the standard
    * Hernández–Stolfo merge/purge completion.
    *
    * Scale shape: ONE `stack` scan melts the k attributes (no k-pass
    * re-read), one (cluster, attr, value)-keyed count (map-side
    * partials), and a (cluster, attr)-partitioned top-1 window —
    * groups are cluster-sized × k, bounded by linkage cluster sizes,
    * and Spark's WindowGroupLimit pre-reduces the rank filter map-side.
    * Values vote as strings (one uniform melt schema); cast back at
    * the consumer.
    *
    * @param clusters (idCol, cluster); rows of `df` absent from it form
    *                 their own singleton cluster
    * @return long form: (cluster, attr, value, votes)
    */
  def goldenRecord(df: DataFrame, clusters: DataFrame, idCol: String,
                   attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "goldenRecord needs at least one attribute")
    val lab = df.join(clusters.select(col(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
    val stackArgs = attrCols
      .map(a => s"'$a', cast(`$a` as string)").mkString(", ")
    val melted = lab.selectExpr("cluster",
        s"stack(${attrCols.size}, $stackArgs) as (attr, val)")
      .where(col("val").isNotNull)
    val votes = melted.groupBy("cluster", "attr", "val")
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster", "attr")
      .orderBy(col("votes").desc, col("val").asc)
    votes.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("cluster"), col("attr"), col("val").as("value"), col("votes"))
  }

  /** Per-group shingle NOVELTY RATE of a new corpus snapshot against a
    * reference snapshot: of each group's distinct n-gram shingles in
    * `newDf`, the fraction absent from `oldDf`'s GLOBAL shingle set —
    * the "how much genuinely new content did this crawl/source add"
    * curation metric ([[graft.functions.TextFunctions.snapshotDiff]]
    * tells you which DOCS changed; this tells you whether the changed
    * text is new material or reshuffled boilerplate). Two exploded
    * distinct sets, ONE hash-keyed anti-join (8-byte keys), two
    * group-keyed counts; the old side never carries payload.
    *
    * @return (group, n_shingles, n_novel, novelty_bp)
    */
  def noveltyRate(oldDf: DataFrame, newDf: DataFrame,
                  textCol: String, groupCol: String, n: Int = 3): DataFrame = {
    graft.expr.GraftFunctions.register(newDf.sparkSession)
    val newSh = newDf
      .select(col(groupCol).as("g"), explode(shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oldSh = oldDf
      .select(explode(shingleHashes(col(textCol), n)).as("h")).distinct()
    val novel = newSh.join(oldSh, Seq("h"), "left_anti")
      .groupBy("g").agg(count(lit(1)).as("n_novel"))
    val out = newSh.groupBy("g").agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000 div n_shingles"))
      .localCheckpoint(true) // group-sized; release the shingle cache
    newSh.unpersist(blocking = false)
    out
  }

  /** Threshold at or above which [[ngramJaccardPairs]] switches from the
    * direct count join to the prefix-filtered join (prefix length is
    * (1-t)·|s|+1, so below ~0.5 the prefix stops pruning half the doc and
    * the filter's extra shuffles outweigh the savings). */
  val PrefixFilterThreshold = 0.5

  /** Asymmetric CONTAINMENT pairs: the fraction of the smaller doc's
    * shingle set found in the larger — catches quoted, embedded, and
    * truncated duplicates that Jaccard structurally misses (a doc fully
    * contained in one 3× its size has Jaccard ≤ 1/3 but containment 1.0).
    * Pairs are oriented: `id_a` is the contained side (smaller shingle
    * set; equal sizes break toward the lower id), score = |A∩B| / |A|.
    *
    * Shape: the [[ngramJaccardPairs]] count join with the same
    * broadcast-anti hot-shingle guard (the PPJoin prefix bound assumes
    * symmetric overlap and does not transfer to containment); sizes stay
    * the ORIGINAL set sizes under the guard, so dropped hot shingles
    * cannot count as shared but still count toward |A|.
    *
    * EAGER — materializes at call time; see [[ngramJaccardPairs]]. */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxDocFreq: Long = 1000): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val ex = df
      .select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filtered =
      if (maxDocFreq <= 0) ex
      else {
        val hot = ex.groupBy("h").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDocFreq).select("h")
        ex.join(broadcast(hot), Seq("h"), "left_anti")
      }
    val pairs = filtered
      .select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(filtered.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
      .where(col("sz_a") < col("sz_b") ||
        (col("sz_a") === col("sz_b") && col("id_a") < col("id_b")))
      .groupBy("id_a", "id_b", "sz_a", "sz_b").agg(count(lit(1)).as("c"))
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / col("sz_a")).as("containment"))
      .where(col("containment") >= threshold)
      .localCheckpoint(true) // see ngramJaccardPairs: release ex below
    ex.unpersist(blocking = false)
    pairs
  }

  /** Blocked EDIT-DISTANCE pairs — classic record linkage (Fellegi &
    * Sunter 1969 blocking + Levenshtein comparison): candidate pairs are
    * generated only WITHIN blocks, then scored by edit distance with a
    * maximum threshold. Shingle/minhash families catch token-level
    * near-dups; edit distance catches character-level corruption (OCR
    * noise, mojibake, typo farms, template fills) that token hashing
    * fragments past recognition.
    *
    * Scale shape: the self-join is keyed by the BLOCK — pair count is
    * Σ_b |b|²/2, so the blocking key choice (domain knowledge: phonetic
    * code, prefix, sorted-neighborhood window, LSH bucket) is what keeps
    * the quadratic term bounded; the operator adds the two universal
    * guards on top: (a) a length-band prefilter (|len_a − len_b| is a
    * free lower bound on the distance — pairs outside the band never run
    * the DP), and (b) the THRESHOLD-ABORT Levenshtein (Spark's 3-arg
    * `levenshtein` stops the O(n·m) DP as soon as the running minimum
    * exceeds the bound — O(maxDist·n) per surviving pair). Hot blocks at
    * cluster scale are AQE skew-split since the join is a plain
    * shuffle-hash on the block key.
    *
    * @param blockCol blocking key expression evaluated over `df`'s rows
    * @return (id_a, id_b, dist), id_a < id_b, dist ≤ maxDist; pairs in
    *         several shared blocks dedup to their minimum distance (the
    *         DP is deterministic, so any shared block yields the same
    *         dist — distinct would equal min; min is shuffle-free here
    *         because the aggregate reuses the join's partitioning only
    *         when keys align, so we keep the explicit min-aggregate)
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        blockCol: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val t = df.select(col(idCol).as("id"), col(strCol).as("s"), blockCol.as("blk"))
    val a = t.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0)
      .groupBy("id_a", "id_b").agg(min("dist").as("dist"))
  }

  /** [[editDistancePairs]] with the block-size cap DERIVED from a
    * candidate-pair budget — the [[ngramJaccardPairsBudget]] contract
    * applied to blocked linkage: the cap `g` is the largest block size
    * such that the pairs the kept blocks generate — Σ over blocks with
    * |b| ≤ g of |b|·(|b|−1)/2 — stays within `pairBudget`; HOTTER blocks
    * are dropped entirely. This is the enforcement the bare operator
    * leaves to the caller's key choice: on a power-law key (first word
    * of web text: "The…") one hot block makes the per-block quadratic
    * term a silent 100× wall, while a budget expressed in PAIRS pins the
    * join's work by construction — grow the budget linearly with the
    * corpus and the stage scales linearly, with recall loss confined to
    * the least informative (hottest) blocking keys.
    *
    * Derivation cost: the per-block count the join needs anyway, folded
    * to a size-keyed HISTOGRAM (model data) + one ordered cumulative
    * sum; the cap returns as one planning scalar (the budgetGuard
    * role). Work sums are doubles (Σ|b|² overflows int64 at corpus
    * scale under ANSI); the ordered window sums are IEEE-identical
    * across engines, so the derived cap itself is engine-exact. Cap
    * floor is 1 — a budget too small for any block still yields a valid
    * (empty) pair set, never an unguarded explosion.
    *
    * EAGER — materializes at call time; see [[ngramJaccardPairs]]. */
  def editDistancePairsBudget(df: DataFrame, idCol: String, strCol: String,
                              blockCol: Column, maxDist: Int,
                              pairBudget: Long): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(pairBudget >= 1, s"pairBudget must be >= 1, got $pairBudget")
    val t = df.select(col(idCol).as("id"), col(strCol).as("s"), blockCol.as("blk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = t.groupBy("blk").agg(count(lit(1)).as("bn"))
    val wk = sizes.groupBy("bn").agg(count(lit(1)).as("nb"))
      .withColumn("work",
        sum(col("nb").cast("double") * col("bn").cast("double") *
          (col("bn") - 1).cast("double") / lit(2.0))
          .over(org.apache.spark.sql.expressions.Window.orderBy("bn")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
    val r = wk.where(col("work") <= lit(pairBudget.toDouble))
      .agg(max("bn")).head()
    val g = if (r.isNullAt(0)) 1L else math.max(1L, r.getLong(0))
    val keep = t.join(sizes.where(col("bn") <= g).select("blk"), Seq("blk"), "left_semi")
    val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    val pairs = a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0)
      .groupBy("id_a", "id_b").agg(min("dist").as("dist"))
      .localCheckpoint(true) // budget-bounded; release t below
    t.unpersist(blocking = false)
    pairs
  }

  /** SORTED-NEIGHBORHOOD record linkage (Hernández & Stolfo 1995): rank
    * the corpus by a sort key, compare each row only to the `windowSize−1`
    * rows after it, score survivors by threshold-abort Levenshtein.
    * The complement to [[editDistancePairs]]' blocking: pair count is
    * EXACTLY n·(w−1) — no quadratic block-size term, no hot-block skew —
    * at the cost of only catching near-dups the sort key places close.
    *
    * The global rank is computed WITHOUT a single-reducer window, by the
    * [[graft.operators.PrefixSum]] discipline: (1) a monotone numeric
    * proxy of the sort key (first 7 bytes base-256 — ≤ 2⁵⁶, overflow-safe
    * for arbitrary bytes; proxy ties are fine, they only have to agree on
    * the bucket) buckets rows through a deterministic quantile sketch;
    * (2) `row_number` ordered by the FULL (key, id) inside each bounded
    * bucket; (3) bucket sizes — a B-row table — cumulate into offsets and
    * broadcast back. Neighborhood pairing then registers each row into
    * rank-blocks ⌊r/w⌋ and ⌊r/w⌋+1, so every pair with rank gap < w
    * shares a block and the pair join is block-keyed — one shuffle, load
    * w rows per block.
    *
    * @return (id_a, id_b, gap, dist): rank(a) < rank(b), gap = rank
    *         difference < windowSize, dist ≤ maxDist
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
                              windowSize: Int, maxDist: Int): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val spark = df.sparkSession
    val t = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // 7 BYTES of the UTF-8 encoding, not 7 characters — a multi-byte
    // character would push the hex past 16 digits and overflow conv()
    // under ANSI (hit on the sf1 scale corpus, whose tokens carry ⊕
    // suffixes). Right-padding the hex with '0' keeps prefix order:
    // a shorter byte prefix sorts before any extension, exactly like
    // the underlying binary comparison Spark uses for strings.
    val nkey = conv(rpad(hex(substring(encode(col("s"), "utf-8"), 1, 7)), 14, "0"), 16, 10)
      .cast("long")
    val withN = t.withColumn("__nk", nkey)
    val b = spark.sessionState.conf.numShufflePartitions
    val bounds =
      if (b < 2) Array.empty[Double]
      else withN.stat
        .approxQuantile("__nk", (1 until b).map(_.toDouble / b).toArray, 1.0 / (10.0 * b))
        .distinct.sorted
    val bucket =
      if (bounds.isEmpty) lit(0)
      else aggregate(array(bounds.toIndexedSeq.map(lit): _*), lit(0),
        (acc, bd) => acc + when(col("__nk").cast("double") >= bd, 1).otherwise(0))
    // local ranks are window'd inside quantile-bounded buckets only; the
    // bucket-size table is B rows, so ITS cumulative window is safe
    val withB = withN.withColumn("__b", bucket)
      .localCheckpoint(false) // feeds local ranks AND bucket sizes once
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col("s"), col("id"))
    val local = withB.withColumn("__lr", row_number().over(localW).cast("long"))
    val offW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b")).rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = withB.groupBy("__b").agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum("__bn").over(offW), lit(0L)))
      .drop("__bn")
    val ranked = local.join(broadcast(offs), Seq("__b"))
      .select(col("id"), col("s"), (col("__lr") + col("__off")).as("rank"))
    val w = windowSize.toLong
    val reg = ranked.select(col("id"), col("s"), col("rank"),
      explode(array(expr(s"(rank - 1) div $w"), expr(s"(rank - 1) div $w + 1"))).as("nb"))
    val a = reg.select(col("nb"), col("id").as("id_a"), col("s").as("s_a"), col("rank").as("rank_a"))
    val bb = reg.select(col("nb"), col("id").as("id_b"), col("s").as("s_b"), col("rank").as("rank_b"))
    a.join(bb, Seq("nb"))
      .where(col("rank_b") > col("rank_a") && col("rank_b") - col("rank_a") < w)
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0)
      .groupBy("id_a", "id_b")
      .agg(min(col("rank_b") - col("rank_a")).as("gap"), min("dist").as("dist"))
  }
}
