package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `Column` expression composition (built-in
  * functions + higher-order lambdas) so the whole pipeline stays inside
  * whole-stage codegen and distributes trivially — no UDFs, no state.
  */
object TextFunctions {

  /** Whitespace tokenizer (the baseline tokenization everywhere here). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation,
    * approximating a learned tokenizer's granularity with a fixed regex. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Canonical-form document fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Deterministic across engines. */
  def fingerprint(text: Column): Column =
    md5(to_binary(regexp_replace(lower(trim(text)), "\\s+", " "), lit("utf-8")))

  /** CORPUS SNAPSHOT DIFF — the crawl-to-crawl delta that decides what a
    * pipeline re-processes: classify every id across two corpus versions
    * as added / removed / changed / unchanged by comparing content
    * fingerprints ([[fingerprint]]: canonical-form md5, so
    * whitespace-only churn does not read as change).
    *
    * Scale shape: ONE full-outer join co-partitioned on the id — both
    * sides shuffle once on an 8-byte key, fingerprints are computed
    * map-side before the exchange (16-byte payload per row crosses the
    * wire, not documents), and the classification is a projection over
    * the join. Downstream, `changed ∪ added` is the re-process set and
    * `removed` the retraction set — O(delta) work for incremental
    * pipelines instead of a full re-run.
    *
    * @return (idCol, status, fp_old, fp_new), status ∈
    *         {added, removed, changed, unchanged}
    */
  def snapshotDiff(oldDf: org.apache.spark.sql.DataFrame,
                   newDf: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"), fingerprint(col(textCol)).as("fp_old"))
    val n = newDf.select(col(idCol).as("__id"), fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("fp_old"), col("fp_new"))
  }

  /** Canonical corpus text normalization: Unicode NFC (the codegen'd
    * [[graft.expr.NfcNormalize]] kernel — precomposed and decomposed
    * encodings of the same visible text become byte-identical) →
    * lowercase → whitespace collapse → trim. Run FIRST in a pipeline:
    * every downstream exact-match operator (hash dedup, decontamination,
    * vocab counts, fingerprints) silently misses cross-encoding
    * duplicates on an un-normalized corpus. Map-only; callers must have
    * [[graft.expr.GraftFunctions.register]]ed the session. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(call_function("nfc_normalize", text)), "\\s+", " "))

  /** Rolling polynomial hash (base 31, mod 1e9+7) over tokens — an
    * order-sensitive content fingerprint cheap enough for 100 TB scans.
    * Token hashes are md5-derived ([[graft.functions.DedupOps.hash60]]).
    * Intermediate bound: acc < 1e9+7 so acc*31 < 2^35, plus the UNREDUCED
    * 60-bit hash60 term → every intermediate < 2^35 + 2^60 < 2^61, safely
    * inside int64, so the identical fold runs on overflow-checking engines
    * — see the q44 DuckDB oracle. (If the base or modulus ever grows,
    * reduce hash60 mod 1e9+7 BEFORE adding, on both engine and oracle.) */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + DedupOps.hash60(t), lit(1000000007L)))

  private val englishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "that", "this", "be")

  def stopwordCount(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwords: _*)))

  /** Quality-score feature struct: the standard cheap heuristics used to
    * filter web-scale corpora (length, word shape, symbol/stopword ratios).
    * Empty/whitespace-only text reports n_tokens = 0 (consistent with
    * [[tokenCount]] — `split("")` would otherwise claim one empty token)
    * and 0.0 for every ratio. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text)
    val toks = tokens(text)
    val empty = length(trim(text)) === 0
    val nTokens = when(empty, lit(0)).otherwise(size(toks))
    val meanWordLen = when(nTokens === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTokens)
    // count of [A-Za-z0-9] chars. regexp_count on the POSITIVE class ==
    // length(regexp_replace(text, "[^A-Za-z0-9]", "")) value-for-value
    // (single-char pattern ⇒ one match per alnum char), but measured 7×
    // faster at sf1 — the replace builds a full result string per row,
    // and this expression sits under corpus-sized aggregates (q102's
    // histogram) where it runs once per scan branch
    val alnum = regexp_count(text, lit("[A-Za-z0-9]"))
    val stop = stopwordCount(text)
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      meanWordLen.as("mean_word_len"),
      when(nChars === 0, lit(0.0))
        .otherwise(alnum.cast("double") / nChars).as("alnum_ratio"),
      when(nTokens === 0, lit(0.0))
        .otherwise(stop.cast("double") / nTokens).as("stopword_ratio"))
  }

  /** Composite 0..1 quality score from [[qualityFeatures]]. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenOk = when(f("n_chars").between(20, 100000), lit(1.0)).otherwise(lit(0.0))
    val wordOk = when(f("mean_word_len").between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val alnumOk = when(f("alnum_ratio") > 0.6, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(f("stopword_ratio") > 0.01, lit(1.0)).otherwise(lit(0.0))
    (lenOk + wordOk + alnumOk + stopOk) / lit(4.0)
  }

  /** Deterministic, engine-portable sampling bucket: first FOUR md5 hex
    * chars (16 bits) of the key, mod `buckets`. Unlike `rand()`/`sample`,
    * the same row lands in the same bucket on every engine and every run —
    * the reproducible train/eval-split primitive for corpus pipelines.
    * 16 source bits keep modulo bias ≤ buckets/65536 (a 1-byte source
    * would leave buckets ≥ 256 permanently empty). */
  def hashBucket(key: Column, buckets: Int = 256): Column = {
    require(buckets > 0 && buckets <= 65536, s"buckets must be in 1..65536, got $buckets")
    conv(substring(md5(to_binary(key, lit("utf-8"))), 1, 4), 16, 10).cast("int") % buckets
  }

  /** Fixed-size token-window chunking with overlap: one output row per
    * chunk, carrying (idCol, chunk_idx, n_chunk_tokens, chunk_text).
    * Narrow op — posexplode of per-row computed windows, no shuffle. */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
                    chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val starts = sequence(lit(0), greatest(n - overlap - 1, lit(0)), lit(stride))
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"), posexplode(starts).as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Intra-document repetition: fraction of duplicate whitespace tokens
    * (1 - distinct/total). High values flag boilerplate/spam — the
    * Gopher-style repetition quality signal. */
  def tokenRepetitionRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"

  /** PII redaction: emails and phone-like sequences replaced with
    * sentinels; returns (redacted text, n_emails, n_phones). */
  def redactPii(text: Column): Column = struct(
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>").as("clean_text"),
    size(regexp_extract_all(text, lit(emailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(regexp_replace(text, emailRe, "<EMAIL>"), lit(phoneRe), lit(0))).as("n_phones"))

  /** ENCODING-ANOMALY profile — the corpus-hygiene pass that catches
    * text mangled in transit before it poisons training: counts of
    * (a) U+FFFD replacement characters (decoder already gave up),
    * (b) C1 control characters U+0080–U+009F (Windows-1252 bytes read
    * as Latin-1/UTF-8 debris), and (c) the double-encoded-UTF-8
    * signature Ã followed by a continuation-range character (U+00C3 is
    * the first byte of every UTF-8-encoded U+00C0–U+00FF Latin-1 char;
    * seeing it followed by U+0080–U+00BF in DECODED text means UTF-8
    * bytes were decoded as Latin-1 and re-encoded). Map-only regexp
    * counts — three codegen'd scans of each string, no shuffle. */
  def encodingAnomalies(text: Column): Column = struct(
    regexp_count(text, lit("\\uFFFD")).cast("long").as("n_repl"),
    regexp_count(text, lit("[\\u0080-\\u009F]")).cast("long").as("n_c1"),
    regexp_count(text, lit("\\u00C3[\\u0080-\\u00BF]")).cast("long").as("n_double"))

  /** Benchmark decontamination: count how many of a document's n-gram
    * shingles appear in a probe set (e.g. eval-set n-grams). Join on the
    * shingle — the probe side is tiny and broadcast; the corpus explodes
    * narrow. Returns (idCol, n_hits) for contaminated docs only. */
  def contaminationHits(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
                        probes: org.apache.spark.sql.DataFrame, probeCol: String,
                        n: Int = 3): org.apache.spark.sql.DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val ex = df.select(col(idCol),
      explode(DedupOps.shingles(col(textCol), n)).as("__shingle"))
    ex.join(broadcast(probes.select(col(probeCol).as("__shingle")).distinct()), Seq("__shingle"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** [[contaminationHits]] at the scale where the probe set no longer fits
    * an exact broadcast set: a Bloom filter over the probe shingle hashes
    * prunes the exploded corpus MAP-SIDE (n-gram explosion is the dominant
    * volume — one benchmark suite's n-grams are millions of keys, a crawl
    * corpus's are trillions), and only the pruned candidates reach the
    * exact verify join. The Bloom is a prefilter, not the semantics: false
    * positives are removed by the verify join, and Bloom filters have no
    * false negatives, so the result is bit-identical to the exact path —
    * same oracle. The lookup UDF is non-codegen but filter-only; the
    * exactness-bearing operators stay native.
    *
    * @param fpp target false-positive rate (drives Bloom size: ~1.2 GB per
    *            10⁹ probes at 0.001 — broadcastable model state)
    */
  def bloomContaminationHits(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
                             probes: org.apache.spark.sql.DataFrame, probeCol: String,
                             n: Int = 3, fpp: Double = 0.001): org.apache.spark.sql.DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    // materialized once (localCheckpoint): feeds the count, the Bloom
    // build, and the verify join without re-tokenizing the probe corpus
    val probeH = probes.select(DedupOps.hash60(col(probeCol)).as("__h")).distinct()
      .localCheckpoint(true)
    val nProbes = probeH.count()
    val exploded = df.select(col(idCol),
      explode(DedupOps.shingleHashes(col(textCol), n)).as("__h"))
    // stat.bloomFilter NPEs on an empty input; an empty probe set prunes
    // everything anyway
    val pruned =
      if (nProbes == 0) exploded.where(lit(false))
      else {
        val bf = probeH.stat.bloomFilter("__h", nProbes, fpp)
        val mightContain = udf((h: Long) => bf.mightContainLong(h))
        exploded.where(mightContain(col("__h")))
      }
    pruned
      .join(probeH, Seq("__h")) // exact verify: planner picks the join for the pruned size
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** Benchmark-overlap FRACTION per document (the Llama-style document
    * contamination metric: Touvron et al. 2023 threshold on how much of a
    * doc is benchmark text, not on raw hit counts): for EVERY corpus
    * document, the share of its distinct n-gram shingles that appear in
    * the probe set. [[contaminationHits]] reports absolute counts for
    * contaminated docs only; policy decisions ("drop if >80% overlapped,
    * flag if >20%") need the normalized fraction with clean docs present
    * at 0.0.
    *
    * Scale shape: the probe side (distinct eval-suite n-grams) is model
    * state — broadcast; the corpus side explodes narrow (shingle sets are
    * already distinct per doc) and the ONE shuffle is the per-doc count
    * aggregate, partially aggregated map-side. Docs with fewer than n
    * tokens keep a row via `explode_outer` (n_ngrams = 0, fraction 0.0).
    * At eval suites too large to broadcast exactly, prefilter with the
    * [[bloomContaminationHits]] Bloom pattern — fractions are unchanged
    * (Bloom has no false negatives and the exact join removes false
    * positives). */
  def contaminationFraction(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
                            probes: org.apache.spark.sql.DataFrame, probeCol: String,
                            n: Int = 3): org.apache.spark.sql.DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val probeSet = probes.select(col(probeCol).as("__shingle")).distinct()
      .withColumn("__hit", lit(1))
    df.select(col(idCol), DedupOps.shingles(col(textCol), n).as("__sh"))
      .select(col(idCol), size(col("__sh")).as("__n"), explode_outer(col("__sh")).as("__shingle"))
      .join(broadcast(probeSet), Seq("__shingle"), "left")
      .groupBy(idCol)
      .agg(max(col("__n")).as("n_ngrams"), count(col("__hit")).as("n_hit"))
      .withColumn("contamination",
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_ngrams")))
  }

  /** Per-source adaptive quality threshold (the CCNet shape, Wenzek et
    * al. arXiv:1911.00359: each source/language slice keeps its own top
    * quantile, so a uniform global cutoff doesn't gut low-resource
    * slices). Each group keeps its top `keepFrac` docs by `scoreCol`
    * (score in [0,1]), with the cutoff quantized to `buckets` fixed score
    * buckets.
    *
    * Deliberately NOT a per-group sort or window over the corpus — at
    * 100 TB a source is trillions of tokens and `Window.partitionBy
    * (source)` serializes each source through one task. Instead: (1) one
    * aggregate builds the (group × bucket) histogram — model state,
    * ≤ |groups|·buckets rows; (2) a cumulative scan over the MODEL (tiny
    * window) picks each group's threshold bucket — the largest bucket b
    * with |{score-bucket ≥ b}| ≥ ⌈keepFrac·n_group⌉; (3) one broadcast
    * join filters the corpus. Keeps at least the target count per group
    * (the whole boundary bucket is included — bucket width is the
    * documented resolution of the cutoff, exactly how CCNet's
    * perplexity-tercile buckets behave).
    *
    * @return kept rows: df's columns + `score_bucket` + the group's
    *         `threshold_bucket` (certifies the learned model alongside
    *         the selection) */
  def adaptiveKeepByScore(df: org.apache.spark.sql.DataFrame, groupCol: String,
                          score: Column, keepFrac: Double,
                          buckets: Int = 20): org.apache.spark.sql.DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, s"keepFrac must be in (0,1], got $keepFrac")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bucket = least(floor(score * buckets).cast("int"), lit(buckets - 1))
    val scored = df.withColumn("score_bucket", bucket)
    val hist = scored.groupBy(col(groupCol), col("score_bucket"))
      .agg(count(lit(1)).as("__c"))
    // windows over the histogram only: ≤ `buckets` rows per group
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("score_bucket").desc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val thr = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__target", ceil(sum(col("__c")).over(wAll) * lit(keepFrac)))
      .where(col("__cum") >= col("__target"))
      .groupBy(groupCol).agg(max(col("score_bucket")).as("threshold_bucket"))
    scored.join(broadcast(thr), Seq(groupCol))
      .where(col("score_bucket") >= col("threshold_bucket"))
  }

  private val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "para", "con"))

  /** Word n-grams WITH multiplicity, in document order. Repetition
    * analysis needs occurrence counts; [[DedupOps.shingles]] is the
    * distinct-set variant used by dedup (sets are what MinHash/SSJoin
    * consume). Tokenization matches [[tokens]] (trim + whitespace
    * collapse, no case folding). Docs with fewer than `n` tokens (or
    * blank text) yield an empty array. Narrow per-row expression —
    * distributes with zero state. */
  def ngramsAll(text: Column, n: Int): Column =
    bindOnce(tokens(text)) { toks =>
      when(length(trim(text)) === 0 || size(toks) < n,
        array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
    }

  /** Evaluate `c` ONCE per row and let `body` reference the bound value.
    *
    * Higher-order array functions run interpreted (no whole-stage
    * codegen, no common-subexpression elimination), so a lambda that
    * textually embeds an expensive child — `transform(seq, i =>
    * slice(tokens(text), …))` — re-evaluates that child on EVERY lambda
    * invocation: ngramsAll re-split the text once per gram, turning an
    * O(tokens) projection into O(tokens²) chars (q106's winnowing read
    * minutes per input split before this). Binding through a 1-element
    * `transform` makes the child a lambda VARIABLE: evaluated once,
    * referenced for free.
    */
  private def bindOnce(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), v => body(v)), 1)

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS algorithm): hash every k-token shingle of the
    * lower-cased text, slide a w-hash window, select each window's
    * MINIMUM hash (rightmost on ties), and dedupe the selections.
    * Unlike q44's bare rolling-hash stream, winnowing carries the
    * detection GUARANTEE: any shared run of k+w−1 tokens between two
    * docs produces at least one shared selected fingerprint, at an
    * expected density of 2/(w+1) of the shingle stream — a principled,
    * tunable sub-sample for plagiarism/near-dup indexes. Docs with
    * fewer than w shingles shrink the window to the whole hash list
    * (≥ 1 fingerprint for every doc with ≥ k tokens).
    *
    * Hashes are [[DedupOps.hash60]] of the shingle text (md5-prefix,
    * engine-portable), so selection replays bit-exactly anywhere.
    * Entirely narrow per-row array expressions (transform/slice over
    * the in-row hash list): map-only, zero shuffles at any corpus size.
    *
    * @return one row per selected fingerprint: (idCol, `pos` 0-based
    *         shingle position, `fp` the 60-bit hash)
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, textCol: String,
                         idCol: String, k: Int = 4, w: Int = 4)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    // the hash list MUST be lambda-bound ([[bindOnce]]): referenced from
    // every window's slice, a projection-column formulation gets inlined
    // by CollapseProject and re-tokenizes + re-hashes the doc once PER
    // WINDOW (measured: minutes per input split at sf0.1)
    val pairs = bindOnce(
      transform(ngramsAll(lower(col(textCol)), k), g => DedupOps.hash60(g))) { hs =>
      when(size(hs) === 0, array().cast("array<struct<pos:bigint,fp:bigint>>"))
        .otherwise(bindOnce(least(lit(w), size(hs))) { we =>
          // rightmost-min per window via reverse + first-position: global
          // 0-based pos for window start i = i + we − pos_in_reversed
          transform(
            array_distinct(transform(sequence(lit(0), size(hs) - we), i => {
              val win = slice(hs, i + 1, we)
              (i + we - array_position(reverse(win), array_min(win))).cast("long")
            })),
            p => struct(p.as("pos"),
              element_at(hs, (p + 1).cast("int")).as("fp")))
        })
    }
    df.select(col(idCol), explode(pairs).as("__pf"))
      .select(col(idCol), col("__pf.pos").as("pos"), col("__pf.fp").as("fp"))
  }

  private val gopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style word-level quality rules (Rae et al. arXiv:2112.11446
    * appendix A1.1): word-count bounds, mean-word-length band,
    * symbol-to-word ratio ('#' and '...'), alphabetic-word fraction, and
    * required stop-word presence. Line-based Gopher rules (bullet /
    * ellipsis line fractions) are omitted — they need line structure,
    * which this corpus lacks; [[ngramRepetitionStats]] carries the
    * repetition rules. Thresholds are parameters (paper defaults) so a
    * pipeline can calibrate per corpus.
    *
    * Returns a struct of the measurements plus `keep` (1 = passes all
    * rules, as int for engine-portable hashing). Pure narrow expressions
    * — map-only at any scale.
    *
    * Bit-exactness notes for oracle parity: every fraction is a single
    * IEEE division of exact integer counts (the symbol ratio multiplies
    * through by 3 so the '...' occurrence count stays integral). */
  def gopherQuality(text: Column,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                    maxSymbolWordRatio: Double = 0.1,
                    minAlphaWordFrac: Double = 0.8,
                    minStopwords: Int = 2,
                    stopwords: Seq[String] = gopherStopwords): Column = {
    val toks = tokens(text)
    val empty = length(trim(text)) === 0
    val nWords = when(empty, lit(0)).otherwise(size(toks))
    val meanWordLen = when(nWords === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nWords)
    val alphaFrac = when(nWords === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nWords)
    val nStop = size(filter(array(stopwords.map(lit): _*),
      s => array_contains(toks, s)))
    // 3·(#'#') + chars-in-'...' over 3·words: one exact-int division
    val nHashChars = length(text) - length(regexp_replace(text, "#", ""))
    val nEllChars = length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))
    val symbolRatio = when(nWords === 0, lit(0.0)).otherwise(
      (nHashChars * lit(3) + nEllChars).cast("double") / (nWords * lit(3)))
    val keep = nWords.between(minWords, maxWords) &&
      meanWordLen.between(minMeanWordLen, maxMeanWordLen) &&
      symbolRatio <= maxSymbolWordRatio &&
      alphaFrac >= minAlphaWordFrac &&
      nStop >= minStopwords
    struct(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      nStop.as("n_stop_present"),
      symbolRatio.as("symbol_word_ratio"),
      keep.cast("int").as("keep"))
  }

  /** Gopher-style repetition measurements (Rae et al. arXiv:2112.11446
    * appendix A1.2) per document, for each n in `ns`:
    *   - `top{n}_frac`: characters covered by the MOST frequent word
    *     n-gram — occurrences × gram length over normalized doc length
    *     (ties broken by lexicographically smallest gram; overlapping
    *     occurrences may push the value past 1.0, as in the published
    *     formulation)
    *   - `dup{n}_frac`: character mass of n-grams occurring more than
    *     once, with multiplicity, over total n-gram character mass
    * Docs shorter than n tokens report 0.0 for both.
    *
    * Scale shape: explode → count keyed by (doc, n, gram) with map-side
    * partial aggregation, a per-(doc, n) window (bounded by one doc's
    * gram count — never corpus-wide), and a final per-doc aggregate.
    * Every shuffle key includes doc_id, so parallelism grows with the
    * corpus and no state is global: the 100 TB cost is three doc-keyed
    * shuffles of narrow rows. */
  def ngramRepetitionStats(df: org.apache.spark.sql.DataFrame, textCol: String,
                           idCol: String, ns: Seq[Int] = Seq(2, 3, 4)): org.apache.spark.sql.DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be positive, got $ns")
    val base = df.select(col(idCol),
      length(array_join(tokens(col(textCol)), " ")).as("__n_chars"),
      col(textCol))
    val grams = ns.map { n =>
      base.select(col(idCol), col("__n_chars"), lit(n).as("__n"),
        explode(ngramsAll(col(textCol), n)).as("__g"))
    }.reduce(_ unionByName _)
    val cnt = grams.groupBy(col(idCol), col("__n"), col("__g"))
      .agg(max(col("__n_chars")).as("__n_chars"), count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("__n"))
      .orderBy(col("__c").desc, col("__g").asc)
    val perN = cnt
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol), col("__n"))
      .agg(
        max(col("__n_chars")).as("__nc"),
        sum(col("__c") * length(col("__g"))).as("__tot"),
        sum(when(col("__c") > 1, col("__c") * length(col("__g")))
          .otherwise(lit(0L))).as("__dup"),
        max(when(col("__rn") === 1, col("__c") * length(col("__g"))))
          .as("__topchars"))
    val aggs = ns.flatMap(n => Seq(
      max(when(col("__n") === n,
        col("__topchars").cast("double") / col("__nc"))).as(s"top${n}_frac"),
      max(when(col("__n") === n,
        col("__dup").cast("double") / col("__tot"))).as(s"dup${n}_frac")))
    val wide = perN.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val fills = ns.flatMap(n => Seq(s"top${n}_frac", s"dup${n}_frac"))
    base.select(col(idCol)).join(wide, Seq(idCol), "left")
      .na.fill(0.0, fills)
  }

  /** PHRASE DETECTION via bigram association scoring — the word2phrase
    * collocation pass (Mikolov et al., "Distributed Representations of
    * Words and Phrases", NeurIPS 2013 §4): adjacent token pairs whose
    * joint count beats chance get merged into phrase tokens before
    * tokenizer/vocab training. Score = (c(ab) − δ)·N / (c(a)·c(b)) with
    * discount δ = `minCount` killing rare-pair noise — the PMI
    * numerator/denominator shape with an absolute-count prior.
    *
    * Scale shape: bigrams are formed MAP-SIDE by zipping each token
    * array against its own tail (no window, no per-doc shuffle); then
    * two count aggregates (unigram, bigram) with map-side partials, two
    * vocab-sized equi-joins to attach c(a)/c(b), a broadcast 1-row total,
    * and a global `topK` via TakeOrdered — nothing corpus-sized ever
    * sorts. The score is ONE closed-form float per surviving bigram from
    * exact integer counts (identical IEEE ops in any engine), floored to
    * micro units for hash-stable output.
    *
    * @return (w1, w2, cab, ca, cb, score_micro), top `topK` by score */
  def pmiPhrases(df: org.apache.spark.sql.DataFrame, textCol: String,
                 minCount: Long = 5L, topK: Int = 100): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1 && topK >= 1, s"minCount/topK must be positive")
    val t = df.where(trim(col(textCol)) =!= "")
      .select(tokens(lower(col(textCol))).as("toks"))
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    val bg = t.select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"))
        .as("z"))
      .select(col("z.w1"), col("z.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minCount)
    bg.join(uni.select(col("w").as("w1"), col("c").as("ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("cb")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cab"), col("ca"), col("cb"),
        floor((lit(1000000.0) * ((col("cab").cast("double") - lit(minCount.toDouble))
            * col("n").cast("double")))
          / (col("ca").cast("double") * col("cb").cast("double")))
          .cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** FEATURE HASHING (the hashing trick — Weinberger et al., ICML 2009):
    * every document becomes a fixed-`dim` integer vector, token t adding
    * sign(t) ∈ {−1, +1} at bucket h(t) mod dim. Signed hashing makes the
    * bucket-collision noise zero-mean (ICML 2009 Thm 2), so hashed dot
    * products estimate bag-of-words dot products without any vocabulary
    * — the stateless featurizer for linear classifiers / cheap cosine at
    * corpus scale where a fitted vocabulary is itself a big-data object.
    * Both hashes are md5-derived ([[DedupOps.hash60]]), so the vectors
    * are bit-identical on any engine or partitioning.
    *
    * Scale shape: one token explode into a (doc, bucket) sum aggregate
    * (map-side partials, ≤ dim rows per doc out), then a per-doc
    * map_from_entries fold to the dense array — no join, no vocabulary
    * state, nothing model-sized anywhere.
    *
    * @return (idCol, features: array<long> of length dim) */
  /** Deterministic per-TOKEN hash embedding: component i of token t is
    * `hash60("tv,i,t") mod 2001 − 1000` — integer components, so dot
    * products are exact and every engine computes identical cosines (the
    * [[graft.functions.SimilarityOps.srpBits]] hyperplane convention
    * applied to token identity). Random hash vectors are ≈ orthogonal
    * across distinct tokens, so MaxSim over them degenerates to a soft
    * token-overlap score — an encoder-free, fully deterministic stand-in
    * that exercises the late-interaction PLUMBING from raw text (the
    * multimodal ops' deterministic-fake discipline; swap in real token
    * embeddings by replacing this one column). */
  def tokenHashVector(tok: Column, dim: Int = 16): Column = {
    // ONE md5 per token; components are affine permutations of the base
    // hash (the MinHash perm trick) — 16× cheaper than per-component
    // hashing, which matters because the construction runs inside the
    // corpus scan of every consumer. The base reduces mod 1000003 first
    // so the odd-multiplier product stays far from Long overflow (ANSI).
    val base = pmod(graft.functions.DedupOps.hash60(
      concat_ws(",", lit("tv"), tok)), lit(1000003L))
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(base * (i.cast("long") * 2L + 1L) + i.cast("long") * 7919L + 1L,
        lit(2001L)) - 1000L).cast("double"))
  }

  def hashedFeatures(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val toks = df.where(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("__t"))
    toks.select(col(idCol),
        pmod(DedupOps.hash60(concat(lit("fhb,"), col("__t"))), lit(dim.toLong)).as("__b"),
        (pmod(DedupOps.hash60(concat(lit("fhs,"), col("__t"))), lit(2L)) * 2L - 1L).as("__s"))
      .groupBy(col(idCol), col("__b")).agg(sum(col("__s")).as("__v"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__v")))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("features"))
  }

  /** TF-IDF KEYWORD EXTRACTION — top-k characteristic terms per document
    * (Salton & Buckley 1988; the smoothed idf is scikit-learn's
    * ln((1+N)/(1+df)) + 1, never negative, never divides by zero):
    * score(t, d) = tf(t, d) · idf(t), the standard keyword/tag extraction
    * and sparse-retrieval featurization step.
    *
    * Engine-portable: the score is ONE closed-form double expression
    * (integer tf/df/N through a single ln and multiply) floored to micro
    * units — no float accumulation, so ranks reproduce on any engine
    * (the [[graft.functions.RetrievalOps.bm25TopK]] discipline).
    *
    * Scale shape: one token explode + (doc, term) count; document
    * frequencies are one (term) aggregate over the distinct postings,
    * joined back ON TERM (vocab-scale, shuffle-joined — at corpus scale
    * the vocabulary outgrows a broadcast; AQE broadcasts it when small);
    * N is a 1-row aggregate cross-joined back; per-doc top-k is a rank
    * window WindowGroupLimit pre-reduces.
    *
    * @return (idCol, rank, term, score_micro), rank 1..k per doc */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    val toks = df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = df.where(length(trim(col(textCol))) > 0)
      .agg(count(lit(1)).as("n_docs"))
    tfidfTail(tf, nDocs, idCol, k)
  }

  /** The shared TF-IDF scoring tail over a (idCol, term, tf) postings
    * frame: df derives from the postings, the score is one closed-form
    * double floored to micro, rank window per doc. */
  private def tfidfTail(tf: org.apache.spark.sql.DataFrame,
                        nDocs: org.apache.spark.sql.DataFrame,
                        idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score_micro").desc, col("term").asc)
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score_micro",
        floor(col("tf") * (log((lit(1L) + col("n_docs")).cast("double") /
          (lit(1L) + col("df")).cast("double")) + lit(1.0)) * lit(1e6)).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score_micro"))
  }

  /** TF-IDF keyword extraction served FROM the persisted BM25 inverted
    * index ([[graft.functions.RetrievalOps.bm25IndexAbsorb]]'s layout):
    * the (term, doc_id, tf) postings and the integer stats rows already
    * hold everything the score needs, so keyword extraction costs ZERO
    * corpus rescans — the index pays the tokenize + (term, doc)
    * aggregate once and serves retrieval (q213), streaming ingestion
    * (q217), and feature extraction (this) from the same bytes. Exact
    * parity: the store recomposes the one-shot tf/df/N under any batch
    * split, so the output is hash-identical to [[tfidfTopTerms]] over
    * the same corpus (the q233 gate — its oracle IS q218's SQL). */
  def tfidfTopTermsFromStore(spark: org.apache.spark.sql.SparkSession,
                             table: String, k: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val tf = spark.table(table).select(col("doc_id"), col("term"), col("tf"))
    val nDocs = spark.table(table + "_stats")
      .agg(sum("n_docs").as("n_docs"))
    tfidfTail(tf, nDocs, "doc_id", k)
  }

  /** WINDOWED CO-OCCURRENCE + PPMI (Levy & Goldberg, NeurIPS 2014: the
    * count-based twin of skip-gram — SGNS implicitly factorizes this
    * matrix): count (center, context) pairs within ±`window` token
    * positions, then score each pair by positive pointwise mutual
    * information ppmi = max(0, ln(c_ab·T / (c_a·c_b))) — the classic
    * distributional-semantics matrix and feature-association measure.
    * Distinct from [[pmiPhrases]], which scores ADJACENT bigrams for
    * phrase detection; this is the ±w context matrix embeddings train
    * on.
    *
    * Scale shape: pair generation is MAP-SIDE — for each offset d ≤ w,
    * the token array zips with itself shifted by d (the [[pmiPhrases]]
    * tail-zip generalized), so no position self-join and no shuffle
    * until the (w1, w2) count; marginals are one aggregate over the
    * pair counts (pair-vocabulary-sized, not corpus-sized); T is a
    * 1-row broadcast. PPMI is ONE closed-form double (counts promoted
    * to double BEFORE multiplying — c·T overflows int64 at web scale)
    * floored to micro and clamped at 0, identically on any engine.
    *
    * @return (w1, w2, n_pairs, ppmi_micro), canonical w1 < w2 (the
    *         matrix is symmetric; counts are ordered-pair counts, so a
    *         co-occurrence contributes to both directions' marginals) */
  def cooccurrencePpmi(df: org.apache.spark.sql.DataFrame, textCol: String,
                       window: Int = 2, minCount: Long = 5)
      : org.apache.spark.sql.DataFrame =
    ppmiFromCounts(orderedPairCounts(df, textCol, window), minCount)

  /** The ORDERED (center, context) pair-count table of a document set —
    * the unit the persisted co-occurrence store ingests: counts are
    * plain sums, so any batch partition of the corpus recomposes the
    * one-shot table EXACTLY by per-(w1, w2) addition (the q229 parity
    * contract). Map-side offset-zip pair generation, one (w1, w2)
    * aggregate. */
  private def orderedPairCounts(df: org.apache.spark.sql.DataFrame,
                                textCol: String, window: Int)
      : org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val t = tokens(lower(col(textCol)))
    val zipped = flatten(transform(sequence(lit(1), lit(window)), d =>
      zip_with(
        slice(t, lit(1), greatest(size(t) - d, lit(0))),
        slice(t, d + lit(1), greatest(size(t) - d, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))))
    val up = df.where(length(trim(col(textCol))) > 0)
      .select(explode(zipped).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    // aggregate the corpus-sized explode ONCE, then mirror the
    // pair-vocabulary-sized count table — a union of the raw pair
    // stream with its swap would run the tokenize+zip+explode twice
    // (measured 2x the q223 scan cost at sf10)
    val gen = up.groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
    gen.unionByName(gen.select(col("w2").as("w1"), col("w1").as("w2"),
        col("n_pairs")))
      .groupBy("w1", "w2").agg(sum("n_pairs").as("n_pairs"))
  }

  /** The PPMI scoring tail over an ordered pair-count table: marginals
    * and T re-derive from the counts (pair-vocabulary-sized aggregates),
    * so it serves both the one-shot [[cooccurrencePpmi]] and the
    * store-merged [[ppmiFromStore]] read identically. */
  private def ppmiFromCounts(counts: org.apache.spark.sql.DataFrame,
                             minCount: Long): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val cab = counts
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = cab.groupBy("w1").agg(sum("n_pairs").as("__ca"))
    val cb = cab.groupBy("w2").agg(sum("n_pairs").as("__cb"))
    val tot = cab.agg(sum("n_pairs").as("__t"))
    val res = cab.where(col("w1") < col("w2"))
      .join(ca, "w1").join(cb, "w2").crossJoin(broadcast(tot))
      .withColumn("ppmi_micro", greatest(lit(0L),
        floor(log((col("n_pairs").cast("double") * col("__t").cast("double")) /
          (col("__ca").cast("double") * col("__cb").cast("double"))) * lit(1e6))
          .cast("long")))
      .where(col("n_pairs") >= minCount)
      .select(col("w1"), col("w2"), col("n_pairs"), col("ppmi_micro"))
      .localCheckpoint(true)
    cab.unpersist(blocking = false)
    res
  }

  /** PERSISTED CO-OCCURRENCE STORE — absorb one batch: the batch's
    * ordered pair counts append to a (w1, w2)-bucketed catalog table —
    * O(batch) per increment, never a corpus rescan. Counts are SUMS, the
    * simplest mergeable state in the store family (postings q213, cells
    * q168, sketches q187/q193): any ingestion order recomposes the
    * one-shot table exactly, which is what makes [[ppmiFromStore]]
    * hash-identical to [[cooccurrencePpmi]] over the union (the q229
    * gate). */
  def cooccurrenceAbsorb(batch: org.apache.spark.sql.DataFrame,
                         textCol: String, table: String, window: Int = 2,
                         buckets: Int = 8): Unit = {
    val spark = batch.sparkSession
    val mode = if (spark.catalog.tableExists(table))
      org.apache.spark.sql.SaveMode.Append
    else org.apache.spark.sql.SaveMode.Overwrite
    graft.sources.TableStore.saveBucketed(
      orderedPairCounts(batch, textCol, window), table, Seq("w1", "w2"),
      buckets, mode = mode)
    spark.catalog.refreshTable(table)
  }

  /** COMPACTION leg of the persisted co-occurrence store: per-batch
    * count increments fold to ONE row per (w1, w2) — exact integer
    * sums — and rewrite as a tidy bucketed table (destination-table
    * convention, q169/q221): the read-side merge aggregate disappears
    * and the small-files accumulation resets, with
    * [[ppmiFromStore]]-over-compacted hash-identical to the fragmented
    * read (the q232 parity gate). */
  def compactCooccurrence(spark: org.apache.spark.sql.SparkSession,
                          table: String, dst: String, buckets: Int = 8): Unit = {
    graft.sources.TableStore.dropTable(spark, dst)
    graft.sources.TableStore.saveBucketed(
      spark.table(table).groupBy("w1", "w2").agg(sum("n_pairs").as("n_pairs")),
      dst, Seq("w1", "w2"), buckets)
    spark.catalog.refreshTable(dst)
  }

  /** PPMI read over the persisted co-occurrence store: per-(w1, w2)
    * count increments SUM to the corpus table (a bucketed-scan
    * aggregate — no store-side Exchange on the (w1, w2) key), then the
    * shared scoring tail runs unchanged — absorb-order invisible. */
  def ppmiFromStore(spark: org.apache.spark.sql.SparkSession, table: String,
                    minCount: Long = 5): org.apache.spark.sql.DataFrame =
    ppmiFromCounts(
      spark.table(table).groupBy("w1", "w2").agg(sum("n_pairs").as("n_pairs")),
      minCount)

  /** n-gram/stopword-vote language ID heuristic: CJK script ratio decides
    * "zh"; otherwise the language whose stopword set matches the most
    * tokens wins; "und" (undetermined) when nothing matches. Pure
    * expressions → distributes with zero state. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val toks = tokens(lower(text))
    val scores = langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(cjk.cast("double") / length(text) > 0.2, lit("zh"))
      .when(best("score") > 0, best("lang"))
      .otherwise(lit("und"))
  }
}
