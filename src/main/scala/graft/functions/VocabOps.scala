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
}
