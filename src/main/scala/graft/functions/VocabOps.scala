package graft.functions

import graft.operators.PrefixSum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-vocabulary induction with a token-mass coverage target —
  * "the smallest vocabulary covering ≥ X% of all token occurrences", the
  * first step of any tokenizer/vocab build over a crawl corpus.
  *
  * Scale design. The naive plan — order the whole vocabulary by count and
  * take a running sum — puts a corpus-scale vocabulary under ONE window
  * reducer. This operator never does that:
  *
  *   1. word counts (one aggregate, vocab-sized output);
  *   2. roll up to COUNT CLASSES (cnt → n_words): distinct positive counts
  *      summing to T are at most √(2T), so this table is provably tiny
  *      (T = 10¹² tokens → ≤ 1.4M classes) and its cumulative-mass window
  *      is safe by construction;
  *   3. greedy coverage over classes, integer-exact: classes fully inside
  *      the target are taken whole; the single BOUNDARY class contributes
  *      `ceil((target - mass_before) / cnt)` words;
  *   4. inside the boundary class (which CAN be corpus-sized — the count=1
  *      tail), words are taken in deterministic hash order via
  *      [[PrefixSum.groupedRunningSum]] — a distributed prefix rank, not a
  *      single-reducer window. Hash order, not alphabetical, is the honest
  *      semantics: the tail cut is arbitrary, so it should also be
  *      unbiased.
  *
  * The hash is the first 60 bits of md5 — engine-portable (any SQL oracle
  * can reproduce it) and collision-free in practice (P[any collision] ≈
  * n²/2⁶¹; a 10M-word class → 2·10⁻⁵). All arithmetic is integer (ceil
  * divisions, basis-point target), so results are bit-exact across
  * engines.
  */
object VocabOps {

  /** @param tokens     one row per token occurrence
    * @param wordCol    the token column
    * @param coverageBp coverage target in basis points (9500 = 95%)
    * @return (word, cnt, selected): the full vocabulary with its count and
    *         whether it is in the coverage vocabulary
    */
  def coverageVocab(tokens: DataFrame, wordCol: String, coverageBp: Int): DataFrame = {
    require(coverageBp >= 0 && coverageBp <= 10000, s"coverageBp in [0,10000], got $coverageBp")
    val wc = tokens.groupBy(col(wordCol).as("word")).agg(count(lit(1)).as("cnt"))
    val cc = wc.groupBy("cnt").agg(count(lit(1)).as("n_words"))
      .withColumn("mass", col("cnt") * col("n_words"))
    // count-class table: ≤ √(2T) rows, so the global window is bounded
    val w = Window.orderBy(col("cnt").desc).rowsBetween(Window.unboundedPreceding, -1)
    val verdict = cc
      .withColumn("before", coalesce(sum("mass").over(w), lit(0L)))
      .crossJoin(broadcast(cc.agg(sum("mass").cast("long").as("total"))))
      .withColumn("target", expr(s"(total * $coverageBp + 9999) div 10000"))
      .withColumn("full", col("before") + col("mass") <= col("target"))
      .withColumn("needed", when(col("full"), col("n_words"))
        .otherwise(when(col("before") < col("target"),
          expr("(target - before + cnt - 1) div cnt")).otherwise(lit(0L))))
      .select("cnt", "full", "needed")
    val wv = wc.join(broadcast(verdict), Seq("cnt"))
    val boundary = wv.where(!col("full") && col("needed") > 0)
      .withColumn("__one", lit(1L))
      .withColumn("__h", conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val bsel = PrefixSum.groupedRunningSum(boundary, Seq("cnt"), "__h", "__one", "__rnk")
      .withColumn("selected", col("__rnk") <= col("needed"))
      .select("word", "cnt", "selected")
    wv.where(col("full") || col("needed") === 0)
      .select(col("word"), col("cnt"), col("full").as("selected"))
      .unionByName(bsel)
  }

  /** Apply a vocabulary to a corpus: every token occurrence becomes a
    * dense id — the selected vocab ranked by (count desc, word), ids from
    * 0 — or a hashed out-of-vocabulary bucket, encoded NEGATIVE
    * (`-1 - hash60(word) mod oovBuckets`) so in-vocab and OOV ids can
    * never collide and no global vocab-size scalar is needed.
    *
    * Scale shape: the id table is the coverage vocabulary — MODEL state,
    * not corpus data: natural-language vocabularies saturate in the 10⁶–10⁷
    * range regardless of corpus size, so the one global ranking window
    * (deliberate: dense ids require a total order) processes tens of MB on
    * one reducer ONCE, amortized over the corpus-sized tokenization it
    * feeds. Tokenization itself is posexplode + a broadcast join —
    * map-only over the corpus, no corpus-sized shuffle.
    *
    * @param vocab [[coverageVocab]] output (word, cnt, selected)
    * @return one row per token occurrence: (idCol, pos, token_id)
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame, oovBuckets: Int = 1000): DataFrame =
    tokenizeOccurrences(explodeTokens(docs, idCol, textCol), idCol, vocab, oovBuckets)

  /** The corpus token-explosion pass feeding [[tokenizeOccurrences]] —
    * exposed so a pipeline that ALSO builds the vocabulary from the same
    * corpus can persist this frame and scan the corpus once instead of
    * tokenizing it twice (the [[coverageVocab]] input is this frame too:
    * one row per occurrence, grouped on "word").
    *
    * @return one row per token occurrence: (idCol, "pos", "word")
    */
  def explodeTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol)))).as(Seq("pos", "word")))

  /** [[tokenize]] over a pre-exploded occurrence frame. */
  def tokenizeOccurrences(occ: DataFrame, idCol: String,
                          vocab: DataFrame, oovBuckets: Int = 1000): DataFrame = {
    require(oovBuckets > 0, s"oovBuckets must be positive, got $oovBuckets")
    val w = Window.orderBy(col("cnt").desc, col("word").asc)
    val ids = vocab.where(col("selected"))
      .withColumn("vid", (row_number().over(w) - 1).cast("long"))
      .select("word", "vid")
    occ.join(broadcast(ids), Seq("word"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("vid"),
          lit(-1L) - pmod(DedupOps.hash60(col("word")), lit(oovBuckets.toLong))).as("token_id"))
  }

  /** Zipf power-law fit of the corpus frequency spectrum: OLS regression
    * of ln(count) on ln(rank) over the top `topN` words. A natural-text
    * corpus yields a slope near −1 (Zipf's law); a synthetic or heavily
    * duplicated corpus flattens (slope → 0) or cliffs — so the slope is
    * a one-number corpus-health probe used to spot template/boilerplate
    * domination before training.
    *
    * Scale: word counts are one corpus-wide aggregate; the top-N cut is
    * a global TakeOrdered (orderBy + limit plans as a per-partition
    * top-N merge on the driver, NOT a single-reducer full sort), and the
    * regression runs over N ≤ a few hundred rows. Rank ties break by
    * word so the fit is deterministic.
    *
    * Returns one row: (n_terms, total_tokens, slope_milli,
    * intercept_milli, r2_milli).
    */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    val wc = explodeTokens(docs, idCol, textCol)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(topN)
    val ranked = wc.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("word"))).cast("double"))
    ranked.agg(
      count(lit(1)).as("n_terms"),
      sum("cnt").as("top_tokens"),
      round(regr_slope(log(col("cnt")), log(col("rank"))) * 1000).cast("long")
        .as("slope_milli"),
      round(regr_intercept(log(col("cnt")), log(col("rank"))) * 1000).cast("long")
        .as("intercept_milli"),
      round(regr_r2(log(col("cnt")), log(col("rank"))) * 1000).cast("long")
        .as("r2_milli"))
  }

  /** Byte-pair-encoding merge training (Sennrich/Haddow/Birch 2016,
    * arXiv:1508.07909) over a word-frequency table — the tokenizer-training
    * step of an LLM data pipeline. Each round counts adjacent symbol pairs
    * weighted by word frequency, picks the most frequent pair (ties →
    * lexicographic (lhs, rhs)), and rewrites every word's symbol sequence
    * with the pair fused.
    *
    * RESTRICTION, by design: self-pairs (lhs == rhs) are not merge
    * candidates. With unequal pairs, two matches can never overlap, so the
    * left-to-right non-overlapping rewrite of classic BPE reduces to an
    * order-free per-position expression — replicable symbol-for-symbol in
    * ANSI SQL (the q116 oracle) and embarrassingly parallel. (For natural
    * text the argmax pair is virtually never a self-pair; a production run
    * that wants them can pre-split runs.)
    *
    * Scale shape: the iteration state is the DISTINCT-WORD table (vocab-
    * sized — BPE training never touches the corpus again after the one
    * word-count pass), so every round is one vocab-sized pair aggregate +
    * a 1-row TakeOrdered + a map-only rewrite, with `localCheckpoint`
    * keeping plans constant across rounds. The selected pair is a 1-row
    * broadcast, not a driver scalar.
    *
    * @param words one row per distinct word: (wordCol, freqCol)
    * @return one row per merge step: (step, lhs, rhs, cnt), step 1-based
    */
  /** Apply a FROZEN merge table to words — the encode half of BPE, used
    * when a tokenizer trained on one corpus slice must tokenize another
    * (the standard deployment: train once, encode petabytes).
    *
    * The merge list is MODEL state (k rows, k = merge budget), so it is
    * collected once and folded into the expression as literals: the whole
    * encode is `aggregate(merges, chars, rewrite)` — one higher-order
    * fold per word applying the k merges in training order, each with the
    * same overlap-free per-position rewrite as [[bpeMerges]] (non-self
    * pairs only, so left-to-right and order-free rewrites coincide and
    * the SQL oracle can replicate symbol-for-symbol). MAP-ONLY: no join,
    * no shuffle, no per-step materialization — the classic alternative
    * (k chained broadcast joins) costs k plan stages for the same answer.
    *
    * Callers encode the DISTINCT-WORD table and join occurrences back by
    * word (vocabularies saturate in the 10⁶–10⁷ range — model-sized vs
    * the corpus), or apply this directly per occurrence when avoiding the
    * word-keyed shuffle matters more than redundant per-duplicate work.
    *
    * @param merges (step, lhs, rhs) — [[bpeMerges]] output; applied in
    *               ascending step order
    * @return input plus `pieces`: the word's subword symbol array
    */
  def bpeEncode(words: DataFrame, wordCol: String, merges: DataFrame): DataFrame = {
    // model-as-literals: k rows, bounded by the merge budget (same
    // deliberate driver fold as ClassifierOps.dsirScoreDocs)
    val ms = merges.select(col("step"), col("lhs"), col("rhs"))
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    require(ms.nonEmpty, "empty merge table")
    require(ms.forall { case (l, r) => l != r },
      "self-pair merge in table — bpeMerges never emits one")
    val mlit = array(ms.map { case (l, r) =>
      struct(lit(l).as("l"), lit(r).as("r")) }: _*)
    val chars = filter(split(col(wordCol), ""), x => length(x) > 0)
    val pieces = aggregate(mlit, chars, (acc, m) => {
      val (l, r) = (m.getField("l"), m.getField("r"))
      val n = size(acc)
      filter(
        transform(sequence(lit(1), n), i =>
          when(i < n && element_at(acc, i) === l
              && element_at(acc, i + 1) === r, concat(l, r))
          .when(i > 1 && element_at(acc, i - 1) === l
              && element_at(acc, i) === r, lit(null))
          .otherwise(element_at(acc, i))),
        x => x.isNotNull)
    })
    words.where(length(col(wordCol)) > 0).withColumn("pieces", pieces)
  }

  def bpeMerges(words: DataFrame, wordCol: String, freqCol: String,
                merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var ws = words
      .where(length(col(wordCol)) > 0)
      .select(col(freqCol).cast("long").as("f"),
        filter(split(col(wordCol), ""), x => length(x) > 0).as("syms"))
      .localCheckpoint(false)
    var acc: DataFrame = null
    var prevWs: DataFrame = null
    for (step <- 1 to merges) {
      val pairs = ws
        .select(col("f"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .where(col("p.l") =!= col("p.r"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum("f").as("cnt"))
      // eager 1-row checkpoint: consumed by both the merge table and the
      // rewrite — without it the pair aggregate would run twice
      val best = pairs.orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
        .localCheckpoint(true)
      acc = if (acc == null) best.withColumn("step", lit(step))
            else acc.unionByName(best.withColumn("step", lit(step)))
      val n = size(col("syms"))
      val rewritten = filter(
        transform(sequence(lit(1), n), i =>
          when(i < n && element_at(col("syms"), i) === col("lhs")
              && element_at(col("syms"), i + 1) === col("rhs"),
            concat(col("lhs"), col("rhs")))
          .when(i > 1 && element_at(col("syms"), i - 1) === col("lhs")
              && element_at(col("syms"), i) === col("rhs"),
            lit(null))
          .otherwise(element_at(col("syms"), i))),
        x => x.isNotNull)
      // The eager `best` above just materialized this round's ws blocks,
      // making the PREVIOUS round's frame dead weight — release it now,
      // not at exit (the pageRank/CC per-round discipline: a deep merge
      // budget would otherwise pin one word-table frame per round).
      if (prevWs != null) GraphOps.releaseLocalCheckpoint(prevWs)
      prevWs = ws
      if (step < merges) // the last rewrite has no consumer — skip it
        ws = ws.crossJoin(broadcast(best.select(col("lhs"), col("rhs"))))
          .select(col("f"), rewritten.as("syms"))
          .localCheckpoint(false)
    }
    GraphOps.releaseLocalCheckpoint(ws) // acc holds only 1-row eager frames
    acc.select(col("step"), col("lhs"), col("rhs"), col("cnt"))
  }

  /** WORDPIECE merge training (Schuster & Nakajima, ICASSP 2012; the BERT
    * tokenizer's trainer) — the third trainer next to [[bpeMerges]] and
    * the unigram-LM family. Identical greedy merge LOOP to BPE, but the
    * next merge maximizes the LIKELIHOOD gain of a unigram LM over the
    * current segmentation, score(l, r) = count(lr) / (count(l)·count(r)),
    * not the raw pair count — frequent-but-uninformative pairs (both
    * symbols already common) rank below cohesive ones, which is the whole
    * behavioral difference between WordPiece and BPE vocabularies.
    *
    * Determinism: the score is computed in INTEGER nano units with `div`
    * (floor division — identical in Spark and DuckDB), ties break (lhs,
    * rhs) ascending; self-pairs are excluded as in [[bpeMerges]] so the
    * overlap-free rewrite coincides with left-to-right.
    *
    * Scale shape: per round, one pair aggregate + one symbol-frequency
    * aggregate over the VOCABULARY-sized distinct-word table (never the
    * corpus), a 1-row eager checkpoint, and a broadcast rewrite — the
    * [[bpeMerges]] shape plus one model-sized join per round.
    *
    * @return (step, lhs, rhs, cnt, score_nano) in training order */
  def wordPieceMerges(words: DataFrame, wordCol: String, freqCol: String,
                      merges: Int, scale: Long = 1000000000L): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var ws = words
      .where(length(col(wordCol)) > 0)
      .select(col(freqCol).cast("long").as("f"),
        filter(split(col(wordCol), ""), x => length(x) > 0).as("syms"))
      .localCheckpoint(false)
    var acc: DataFrame = null
    var prevWs: DataFrame = null
    for (step <- 1 to merges) {
      val symFreq = ws.select(col("f"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("f").as("c"))
      val pairs = ws
        .select(col("f"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .where(col("p.l") =!= col("p.r"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum("f").as("cnt"))
      // eager 1-row checkpoint: consumed by both the merge table and the
      // rewrite (the bpeMerges discipline)
      // Score in DECIMAL(38,0): for ANY bigint inputs, cnt·scale ≤
      // ~9.2e27 and cl·cr ≤ ~8.5e37 both fit exactly, so the floor
      // division can never wrap (bigint `cnt * scale` overflows past
      // cnt ~9.2e9 and, under Spark's non-ANSI arithmetic, would pick a
      // WRONG merge silently while the DuckDB oracle errors loudly —
      // a silent gate divergence). The quotient itself is ≤ scale
      // (cl, cr ≥ cnt), so the bigint result cast is always exact.
      // The oracle computes the same in HUGEINT (int128) — both engines
      // exact over the full input domain, no magnitude guard needed.
      val best = pairs
        .join(symFreq.select(col("s").as("lhs"), col("c").as("cl")), Seq("lhs"))
        .join(symFreq.select(col("s").as("rhs"), col("c").as("cr")), Seq("rhs"))
        .select(col("lhs"), col("rhs"), col("cnt"),
          expr(s"cast((cast(cnt as decimal(38,0)) * ${scale}L) div " +
            "(cast(cl as decimal(38,0)) * cast(cr as decimal(38,0))) as bigint)")
            .as("score_nano"))
        .orderBy(col("score_nano").desc, col("lhs"), col("rhs")).limit(1)
        .localCheckpoint(true)
      acc = if (acc == null) best.withColumn("step", lit(step))
            else acc.unionByName(best.withColumn("step", lit(step)))
      val n = size(col("syms"))
      val rewritten = filter(
        transform(sequence(lit(1), n), i =>
          when(i < n && element_at(col("syms"), i) === col("lhs")
              && element_at(col("syms"), i + 1) === col("rhs"),
            concat(col("lhs"), col("rhs")))
          .when(i > 1 && element_at(col("syms"), i - 1) === col("lhs")
              && element_at(col("syms"), i) === col("rhs"),
            lit(null))
          .otherwise(element_at(col("syms"), i))),
        x => x.isNotNull)
      // Same per-round release as [[bpeMerges]]: the eager `best` just
      // materialized this round's ws, so the previous round's checkpoint
      // blocks are dead — drop them now rather than pinning one
      // vocabulary-sized frame per merge round for the whole call.
      if (prevWs != null) GraphOps.releaseLocalCheckpoint(prevWs)
      prevWs = ws
      if (step < merges) // the last rewrite has no consumer — skip it
        ws = ws.crossJoin(broadcast(best.select(col("lhs"), col("rhs"))))
          .select(col("f"), rewritten.as("syms"))
          .localCheckpoint(false)
    }
    GraphOps.releaseLocalCheckpoint(ws) // acc holds only 1-row eager frames
    acc.select(col("step"), col("lhs"), col("rhs"), col("cnt"), col("score_nano"))
  }

  /** WORDPIECE greedy longest-match-first encoding against a frozen
    * vocabulary (the BERT tokenizer's inference pass): scanning left to
    * right, each step consumes the LONGEST vocabulary piece matching at
    * the cursor, falling back to the single character when nothing
    * matches (the trainer's vocabulary always contains every corpus
    * character, so training-corpus words never need the fallback).
    * Pieces are position-free by default (no `##` continuation
    * marking) — the SentencePiece-style convention the rest of this
    * tokenizer family uses; the greedy-longest-match SEARCH is the
    * WordPiece-specific behavior under test. `continuationMarker =
    * Some("##")` renders non-initial pieces with the BERT continuation
    * prefix so emitted vocabularies/encodings interchange with
    * BERT-format tooling — a RENDERING of the same segmentation (the
    * match itself stays position-free; BERT's position-dependent
    * vocabulary lookup is a different trainer contract).
    *
    * The vocabulary is MODEL state (chars + merge outputs — bounded by
    * the merge budget), collected once and folded in as literals: the
    * whole encode is one higher-order fold per word (≤ len(word) steps ×
    * |vocab| literal probes), MAP-ONLY — no join, no shuffle (the
    * [[bpeEncode]] deployment shape: encode the distinct-word table,
    * join occurrences back by word).
    *
    * @return input plus `pieces`: the word's subword array */
  def wordPieceEncode(words: DataFrame, wordCol: String, vocab: DataFrame,
                      pieceCol: String = "piece",
                      continuationMarker: Option[String] = None): DataFrame = {
    val vs = vocab.select(col(pieceCol)).distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    require(vs.nonEmpty, "empty vocabulary")
    // The vocabulary is folded in as a LITERAL array probed once per
    // character per word — O(len·|vocab|) with a |vocab|-sized Catalyst
    // expression. That is the documented merge-budget contract (chars +
    // merge outputs, thousands at most); a caller passing a corpus-scale
    // table here should get a loud failure, not a pathological plan.
    require(vs.size <= 4096,
      s"wordPieceEncode vocabulary has ${vs.size} pieces — the literal-" +
        "probe encode is built for merge-budget vocabularies (≤4096); " +
        "encode the distinct-word table against a trained vocabulary")
    val vlit = array(vs.map(lit(_)): _*)
    val w = col(wordCol)
    val n = length(w)
    val init = struct(lit(1).as("pos"),
      array().cast("array<string>").as("pieces"))
    val folded = aggregate(sequence(lit(1), greatest(n, lit(1))), init,
      (st, _) => {
        val pos = st.getField("pos")
        val pieces = st.getField("pieces")
        val best = aggregate(vlit, lit(""), (b, v) =>
          when(length(v) > length(b) && pos + length(v) - lit(1) <= n &&
            w.substr(pos, length(v)) === v, v).otherwise(b))
        val piece = when(length(best) > 0, best).otherwise(w.substr(pos, lit(1)))
        when(pos > n, st).otherwise(
          struct((pos + length(piece)).as("pos"),
            concat(pieces, array(piece)).as("pieces")))
      })
    val pieces0 = folded.getField("pieces")
    val pieces = continuationMarker.fold(pieces0)(m =>
      transform(pieces0, (x, i) =>
        when(i === 0, x).otherwise(concat(lit(m), x))))
    words.where(length(w) > 0).withColumn("pieces", pieces)
  }

  // ── UNIGRAM-LM (SentencePiece-style) tokenizer family (Kudo, ACL 2018)
  //    — the second trainer next to BPE: a piece VOCABULARY with
  //    log-probabilities, Viterbi segmentation under additive integer
  //    costs, and a hard-EM round that re-estimates piece counts from
  //    the best segmentations. Engine-portable by construction: costs
  //    are micro-rounded −ln(p) BIGINTs (the BM25 idf discipline), the
  //    DP tie-break is total (cost asc, piece length desc), and every
  //    loop is a FIXED unroll (maxLen rounds) the SQL oracle replays
  //    verbatim. Scale shape: everything after the word-frequency
  //    aggregate is VOCABULARY-sized (distinct words × positions), never
  //    corpus-sized — the q122/BPE property.

  /** Seed vocabulary: all substrings of length 2..`maxPieceLen` with
    * occurrence mass ≥ `minCount` (counted per position, weighted by
    * word frequency), capped to the top `vocabSize` by (count desc,
    * piece asc) — UNIONed with every single character unconditionally,
    * so Viterbi segmentation is always feasible. Returns (piece, cnt). */
  def unigramSeed(words: DataFrame, wordCol: String, freqCol: String,
                  maxPieceLen: Int = 4, minCount: Long = 2L,
                  vocabSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 1 && vocabSize >= 1 && minCount >= 1,
      s"bad unigramSeed params ($maxPieceLen, $minCount, $vocabSize)")
    val occ = words.where(length(col(wordCol)) > 0)
      .select(col(freqCol).cast("long").as("f"), col(wordCol).as("__w"))
      .select(col("f"), col("__w"),
        explode(sequence(lit(1), length(col("__w")))).as("__i"))
      .select(col("f"), col("__w"), col("__i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .where(col("__i") + col("__l") - 1 <= length(col("__w")))
      .select(col("f"), expr("substring(__w, __i, __l)").as("piece"))
    val cnt = occ.groupBy("piece").agg(sum("f").as("cnt"))
    val multi = cnt.where(length(col("piece")) >= 2 && col("cnt") >= minCount)
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece").asc)))
      .where(col("__rn") <= vocabSize).drop("__rn")
    // the global rank window runs on the ≤√(2T)-ish candidate table (the
    // coverageVocab argument), not the corpus
    cnt.where(length(col("piece")) === 1).unionByName(multi)
  }

  /** (piece, cnt) → (piece, l, c): micro-rounded −ln(cnt / Σcnt) BIGINT
    * costs — a single closed-form float per piece, rounded ONCE. */
  def unigramCosts(seed: DataFrame): DataFrame = {
    val total = seed.agg(sum("cnt").as("__tot"))
    seed.crossJoin(broadcast(total))
      .select(col("piece"), length(col("piece")).cast("int").as("l"),
        round(-log(col("cnt").cast("double") / col("__tot")) * lit(1e6))
          .cast("long").as("c"))
  }

  /** Viterbi segmentation of `words` under piece costs: forward DP over
    * character positions (words longer than the cap, or containing
    * out-of-vocabulary characters, never reach their final position and
    * fall out; callers apply a char fallback), tie-break (total cost asc,
    * piece length desc) making the chosen segmentation UNIQUE, then a
    * backward pass that emits the used pieces. Returns (word, piece) —
    * one row per used piece occurrence.
    *
    * Scale: the cost table is MODEL-sized (a trained vocabulary — the
    * wordPieceEncode literal-vocab contract), so it broadcasts as one map
    * literal and the whole forward+backward DP runs INSIDE a single
    * projection over the distinct-word table (higher-order `aggregate`
    * over character positions) — one map-only pass, no per-round joins.
    * The previous formulation ran the DP as ~2·maxLen join+window+
    * checkpoint rounds; at vocabulary scale it was JOB-bound, not
    * data-bound (~50 scheduled jobs per call — q253 spent most of its
    * 13 s bench wall here across its four Viterbi calls). Semantics are
    * identical: same candidate set (positions × piece lengths that hit
    * the vocabulary), same (cost asc, length desc) winner per position —
    * duplicate cost rows for one piece collapse to their MIN cost, which
    * is exactly the row the old per-position window selected. */
  def unigramViterbi(words: DataFrame, wordCol: String, costs: DataFrame,
                     maxLen: Int = 8, maxPieceLen: Int = 4): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    // model-sized collect (the wordPieceEncode/bpeEncode convention):
    // a trained vocabulary, not a corpus — fail fast on misuse
    val costRows = costs.groupBy("piece").agg(min("c").as("c")).collect()
    require(costRows.length <= 65536,
      s"unigramViterbi cost table has ${costRows.length} pieces — " +
        "this operator broadcasts the vocabulary as a literal " +
        "(model-sized by contract); train/prune the vocabulary first")
    val costMap = typedlit(costRows.map(r =>
      r.getString(0) -> r.getLong(1)).toMap)
    val w = words.select(col(wordCol).as("word")).where(length(col("word")) > 0)
      .where(length(col("word")) <= maxLen).distinct()
    val inf = Long.MaxValue // infeasible-position sentinel (costs are ≥ 0)
    // forward: states[j+1] = best (cost, l) reaching position j; the fold
    // appends one struct per character position
    val statesExpr = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0L).as("cost"), lit(0).as("l"))),
      (acc, j) => concat(acc, array(aggregate(
        sequence(lit(1), least(lit(maxPieceLen), j)),
        struct(lit(inf).as("cost"), lit(0).as("l")),
        (b, l) => {
          val prevCost = element_at(acc, (j - l + lit(1)).cast("int"))
            .getField("cost")
          val pieceCost = element_at(costMap,
            col("word").substr(j - l + lit(1), l))
          val tot = prevCost + pieceCost
          val bCost = b.getField("cost")
          val better = prevCost < lit(inf) && pieceCost.isNotNull &&
            (tot < bCost || (tot === bCost && l > b.getField("l")))
          when(better, struct(tot.as("cost"), l.cast("int").as("l")))
            .otherwise(b)
        }))))
    // backward: walk p → p − l[p] collecting used pieces; the fold is
    // bound to the states array via a 1-element transform so the forward
    // DP is evaluated exactly ONCE per row no matter how the optimizer
    // rewrites projections
    val piecesExpr = element_at(transform(array(statesExpr), sts => {
      val feasible =
        element_at(sts, length(col("word")) + 1).getField("cost") < inf
      val walked = aggregate(
        sequence(lit(1), length(col("word"))),
        struct(length(col("word")).cast("int").as("p"),
          array().cast("array<string>").as("ps")),
        (st, _) => {
          val p = st.getField("p")
          val lCur = element_at(sts, p + 1).getField("l")
          when(p > 0, struct((p - lCur).cast("int").as("p"),
            concat(st.getField("ps"),
              array(col("word").substr(p - lCur + 1, lCur))).as("ps")))
            .otherwise(st)
        }).getField("ps")
      when(feasible, walked).otherwise(array().cast("array<string>"))
    }), 1)
    w.select(col("word"), explode(piecesExpr).as("piece"))
  }

  /** ONE hard-EM round: seed → Viterbi-segment the training words →
    * re-estimate piece counts from the used pieces (weighted by word
    * frequency). Returns (piece, seed_cnt, em_cnt) for every seed piece
    * that survived (em_cnt > 0). */
  def unigramEmCounts(words: DataFrame, wordCol: String, freqCol: String,
                      seed: DataFrame, maxLen: Int = 8,
                      maxPieceLen: Int = 4): DataFrame = {
    val seedM = seed.localCheckpoint(false) // costs AND the seed_cnt join
    val uses = unigramViterbi(words.select(col(wordCol), col(freqCol)),
      wordCol, unigramCosts(seedM), maxLen, maxPieceLen)
    val wf = words.select(col(wordCol).as("word"), col(freqCol).cast("long").as("__f"))
    val out = uses.join(wf, Seq("word"))
      .groupBy("piece").agg(sum("__f").as("em_cnt"))
      .join(seedM.select(col("piece"), col("cnt").as("seed_cnt")), Seq("piece"))
      .select(col("piece"), col("seed_cnt"), col("em_cnt"))
      .localCheckpoint(true) // vocabulary-sized; lets seedM go
    // NOTE: `uses` is a lazy map-only frame since the Viterbi rewrite —
    // releasing it would walk its full plan and unpersist the CALLER's
    // checkpointed inputs (q252's trainWf hit exactly this)
    GraphOps.releaseLocalCheckpoint(seedM)
    out
  }

  /** Post-EM vocabulary for ENCODING: EM-surviving pieces at their
    * re-estimated counts, plus every single character floored at count 1
    * (characters must never leave the vocabulary or segmentation
    * feasibility breaks — SentencePiece's required-character rule). */
  def unigramEncodeVocab(emCounts: DataFrame, seed: DataFrame): DataFrame = {
    val em = emCounts.select(col("piece"), col("em_cnt").as("cnt"))
    val chars = seed.where(length(col("piece")) === 1)
      .join(em.select("piece"), Seq("piece"), "left_anti")
      .select(col("piece"), lit(1L).as("cnt"))
    em.unionByName(chars)
  }

  /** FULL hard-EM training loop (Kudo, ACL 2018 §4.2's iterate step):
    * `rounds` E/M rounds, each re-segmenting the training words under
    * the previous round's vocabulary and re-estimating counts from the
    * used pieces, with the character floor re-applied per round so
    * segmentation stays feasible. Returns the round-`rounds` vocabulary
    * as (piece, cnt). Each round's state is one vocabulary-sized frame
    * (the eager checkpoint inside [[unigramEmCounts]]); the loop is a
    * fixed-round chain, never corpus-proportional in rounds. */
  def unigramTrainEm(words: DataFrame, wordCol: String, freqCol: String,
                     seed: DataFrame, rounds: Int, maxLen: Int = 8,
                     maxPieceLen: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val seedM = seed.localCheckpoint(false) // char floor, every round
    var vocab = seedM
    for (_ <- 1 to rounds) {
      val em = unigramEmCounts(words, wordCol, freqCol, vocab,
        maxLen, maxPieceLen)
      vocab = unigramEncodeVocab(em, seedM)
    }
    vocab
  }

  /** VOCABULARY PRUNING by likelihood loss (Kudo §4.2, with the
    * character-fallback bound): dropping piece p forces its em_cnt
    * occurrences onto an alternative segmentation; the always-feasible
    * alternative is p's characters (the floor guarantees them), so
    * loss(p) = cnt(p) · (Σ charCost − cost(p)) lower-bounds the true
    * likelihood drop in the SAME micro-integer cost units the Viterbi
    * DP already uses — closed-form, engine-exact, no per-piece re-
    * segmentation. Keeps the `targetMulti` multi-character pieces with
    * the LARGEST loss (ties by piece) plus every single character.
    * Everything is model-sized: costs, the per-character explode, and
    * the global rank run on the vocabulary, never the corpus. */
  def unigramPruneByLoss(vocab: DataFrame, targetMulti: Int): DataFrame = {
    require(targetMulti >= 0, s"targetMulti must be >= 0, got $targetMulti")
    val v = vocab.localCheckpoint(false) // costs + chars + multi
    val costs = unigramCosts(v)
    val chc = costs.where(col("l") === 1)
      .select(col("piece").as("ch"), col("c").as("cc"))
    val multi = v.join(costs.select("piece", "c"), Seq("piece"))
      .where(length(col("piece")) >= 2)
    val charCost = multi
      .select(col("piece"), col("cnt"), col("c"),
        explode(sequence(lit(1), length(col("piece")))).as("__i"))
      .select(col("piece"), col("cnt"), col("c"),
        expr("substring(piece, __i, 1)").as("ch"))
      .join(chc, Seq("ch"))
      .groupBy("piece", "cnt", "c").agg(sum("cc").as("__charcost"))
    val kept = charCost
      .select(col("piece"), col("cnt"),
        (col("cnt") * (col("__charcost") - col("c"))).as("__loss"))
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("__loss").desc, col("piece").asc)))
      .where(col("__rn") <= targetMulti)
      .select("piece", "cnt")
    val out = v.where(length(col("piece")) === 1).select("piece", "cnt")
      .unionByName(kept)
      .localCheckpoint(true) // vocabulary-sized; lets v + costs go
    GraphOps.releaseLocalCheckpoint(v)
    out
  }
}
