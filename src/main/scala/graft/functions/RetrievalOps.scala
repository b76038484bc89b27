package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009;
  * idf variant per Lucene's `BM25Similarity`: ln(1 + (N-df+0.5)/(df+0.5)),
  * always non-negative).
  *
  * Scale shape (the inverted-index plan, not the index): the query
  * workload is tiny relative to the corpus, so
  *  1. postings are built ONLY for terms that appear in some query —
  *     the `isin(queryTerms)` prune runs map-side inside the token
  *     explode, so corpus tokens outside the query vocabulary never
  *     reach a shuffle;
  *  2. corpus stats (N, avgdl) are a one-row aggregate cross-joined
  *     back (broadcast of a single row);
  *  3. per-term document frequencies are |queryVocab| rows — broadcast
  *     joined onto the postings;
  *  4. the query expansion table (query_id, term) is a literal local
  *     relation — broadcast joined onto the postings, so the only
  *     corpus-sized shuffle is the (doc_id, term) tf aggregate followed
  *     by the (query_id, doc_id) score aggregate.
  *  5. top-k per query is a rank window partitioned by query_id — with
  *     thousands of concurrent queries that parallelizes per query; a
  *     single query's candidate set is bounded by its postings.
  *
  * Cross-engine determinism contract: each term's BM25 contribution is
  * rounded to integer MICRO units before summation, so the per-(query,
  * doc) score is an exact BIGINT sum — float addition order (which
  * differs between engines and between shuffle layouts) can never flip
  * a rank. Ties on the integer score break by doc_id.
  */
object RetrievalOps {

  /** Score `queries` (id → bag of terms) against `docs` with BM25 and
    * return the top `k` docs per query:
    * (query_id, rank, doc_id, score_micro).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val queryVocab = queries.flatMap(_._2).distinct.sorted
    // postings: one row per (doc, query-vocab term) with term frequency.
    // The isin prune happens before the explode output leaves the map
    // side, so non-query terms cost only the split, never a shuffle row.
    val toks = docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(queryVocab: _*))
      .groupBy("doc_id", "term")
      .agg(first("dl").as("dl"), count(lit(1)).as("tf"))

    // one-row corpus stats; joined as a broadcast-able single row
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("toks")).cast("double")).as("avgdl"))
    // |queryVocab| rows of document frequency
    val dfreq = postings.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val queryTerms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "qterm")

    scoreAndRank(postings, dfreq, stats, queryTerms, k, k1, b)
  }

  /** The shared BM25 scoring tail: per-term micro-integer contributions
    * (Lucene idf), exact BIGINT per-(query, doc) sums, rank window.
    * `stats` is one row (n_docs, avgdl) — broadcast. */
  private def scoreAndRank(postings: DataFrame, dfreq: DataFrame,
                           stats: DataFrame, queryTerms: DataFrame,
                           k: Int, k1: Double, b: Double): DataFrame = {
    val termScore = postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(queryTerms), col("term") === col("qterm"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib_micro",
        round(col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          * lit(1e6)).cast("long"))

    val scored = termScore.groupBy("query_id", "doc_id")
      .agg(sum("contrib_micro").as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id").cast("long").as("query_id"),
        col("rank"), col("doc_id"), col("score_micro"))
  }

  /** Full postings + batch stats of a document set — the unit the
    * persisted inverted index ingests: one (term, doc_id, tf, dl) row
    * per distinct term per doc, plus a 1-row (n_docs, sum_dl) stats
    * increment (integer sums — the corpus averages recompose EXACTLY
    * from any batch partition at read time). */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
                         carryCols: Seq[String] = Nil)
      : (DataFrame, DataFrame) = {
    val toks = docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id") +: carryCols.map(col)
        :+ TextFunctions.tokens(lower(col(textCol))).as("toks"): _*)
    val post = toks
      .select(col("doc_id") +: carryCols.map(col)
        :+ size(col("toks")).cast("long").as("dl")
        :+ explode(col("toks")).as("term"): _*)
      .groupBy("term", "doc_id")
      .agg(first(col("dl")).as("dl"),
        count(lit(1)).as("tf") +: carryCols.map(c => first(c).as(c)): _*)
    // stats stay integer-sum mergeable, but are kept PER carried
    // attribute value: a filtered search then recomposes the filtered
    // subcorpus's exact (n_docs, avgdl) by summing matching stats rows —
    // the piece that makes pre-filter semantics EXACT for BM25 (unlike
    // vectors, BM25 scores depend on corpus-level stats, so filtering
    // postings alone would still score against whole-corpus df/avgdl)
    val stats = if (carryCols.isEmpty)
      toks.agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("sum_dl"))
    else
      toks.groupBy(carryCols.map(col): _*)
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks")).cast("long")).as("sum_dl"))
    (post, stats)
  }

  /** PERSISTED INVERTED-INDEX lifecycle — build/absorb one batch: the
    * batch's postings append to a term-bucketed catalog table and its
    * (n_docs, sum_dl) stats row appends to `<table>_stats` — O(batch)
    * per increment, never a corpus rescan (the [[graft.functions
    * .SimilarityOps.ivfStore]] discipline applied to text retrieval;
    * the store family's missing member next to signatures, labels,
    * vectors, and histograms). The per-(term, doc) tf aggregate is paid
    * ONCE here; searches read it pre-materialized.
    *
    * Scale shape: one (term, doc) aggregate over the BATCH, one
    * bucketed write clustered on term — searches for a q-term touch its
    * buckets without a store-side Exchange; corpus stats recompose from
    * integer stats rows (exact under any batch split). */
  /** @param carryCols attribute columns copied onto every posting row
    *                   AND onto the stats rows (grouped) — the
    *                   attribute-payload layout that lets
    *                   [[bm25SearchStoreFiltered]] pre-filter both the
    *                   postings scan and the corpus stats (the
    *                   [[SimilarityOps.ivfStore]] carryCols discipline
    *                   applied to text retrieval) */
  def bm25IndexAbsorb(batch: DataFrame, idCol: String, textCol: String,
                      table: String, buckets: Int = 8,
                      carryCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val (post, stats) = postingsOf(batch, idCol, textCol, carryCols)
    val mode = if (spark.catalog.tableExists(table))
      org.apache.spark.sql.SaveMode.Append else org.apache.spark.sql.SaveMode.Overwrite
    graft.sources.TableStore.saveBucketed(post, table, Seq("term"), buckets,
      mode = mode)
    val statsMode = if (spark.catalog.tableExists(table + "_stats"))
      org.apache.spark.sql.SaveMode.Append else org.apache.spark.sql.SaveMode.Overwrite
    stats.write.mode(statsMode).saveAsTable(table + "_stats")
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(table + "_stats")
  }

  /** Search the persisted index: [[bm25TopK]] semantics over the store —
    * postings pruned to the query vocabulary (predicate pushdown into
    * the term-bucketed scan), document frequencies counted from the
    * pruned postings only, corpus stats summed from the stats table
    * (integer sums → the same avgdl double any one-shot computation
    * gets). Absorb-order invisible: scores are hash-identical to a
    * one-shot [[bm25TopK]] over the same corpus — the q213 parity gate. */
  def bm25SearchStore(spark: org.apache.spark.sql.SparkSession, table: String,
                      queries: Seq[(Int, Seq[String])], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct.sorted
    val post = spark.table(table).where(col("term").isin(vocab: _*))
    val stats = spark.table(table + "_stats")
      .agg(sum("n_docs").cast("double").as("n_docs"),
        (sum("sum_dl").cast("double") / sum("n_docs").cast("double")).as("avgdl"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val queryTerms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "qterm")
    scoreAndRank(post, dfreq, stats, queryTerms, k, k1, b)
  }

  /** FILTERED search over the persisted inverted index — the metadata-
    * constrained retrieval query ("top-k among docs WHERE …") a
    * production retrieval API adds first (date/source/license filters),
    * with PRE-FILTER semantics end to end: the predicate (over attribute
    * columns the index carries — build with [[bm25IndexAbsorb]]'s
    * `carryCols`) cuts the postings scan BEFORE any scoring, AND the
    * corpus stats (n_docs, avgdl, per-term df) recompose from the
    * matching stats/posting rows only — so scores are EXACTLY
    * [[bm25TopK]] over the pre-filtered corpus (the q236 parity gate),
    * not whole-corpus scores with survivors post-filtered in. The
    * distinction matters twice for BM25: post-filtering silently returns
    * < k once the filter is selective (the q214 recall gap), and even
    * the surviving docs would carry WRONG scores (idf and avgdl are
    * corpus-level quantities — the filtered subcorpus has its own).
    *
    * Scale shape: identical to [[bm25SearchStore]] — the predicate is a
    * map-side filter on the term-bucketed postings scan (simple
    * comparisons reach parquet as PushedFilters next to the vocabulary
    * prune — Bm25PlanSpec asserts both), and the stats fold stays
    * attribute-group-sized. Carrying the attribute costs bytes per
    * posting row and buys filter-before-score; the alternative id-join
    * against a doc-metadata table would shuffle at corpus scale.
    *
    * @param predicate filter over carried attribute columns (must be
    *                  resolvable against BOTH the postings table and the
    *                  `_stats` table — i.e. reference only carryCols) */
  def bm25SearchStoreFiltered(spark: org.apache.spark.sql.SparkSession,
                              table: String, queries: Seq[(Int, Seq[String])],
                              predicate: org.apache.spark.sql.Column, k: Int,
                              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct.sorted
    val post = spark.table(table).where(predicate)
      .where(col("term").isin(vocab: _*))
    val stats = spark.table(table + "_stats").where(predicate)
      .agg(sum("n_docs").cast("double").as("n_docs"),
        (sum("sum_dl").cast("double") / sum("n_docs").cast("double")).as("avgdl"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val queryTerms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "qterm")
    scoreAndRank(post, dfreq, stats, queryTerms, k, k1, b)
  }

  /** COMPACTION leg of the persisted BM25 index: many per-batch posting
    * files (every [[bm25IndexAbsorb]] append lands its own file set per
    * bucket) rewrite as ONE tidy term-bucketed table, and the stats
    * increments fold to a single (n_docs, sum_dl) row — integer sums,
    * so the fold is EXACT and search over the compacted index is
    * hash-identical to search over the fragmented one (the q221 parity
    * gate). The small-files maintenance job every append-only store
    * family here runs (signatures q169, labels, vectors q172's
    * compaction analog), applied to postings.
    *
    * Writes to a DESTINATION table (the q169 convention — the source
    * stays readable until the swap): one scan + one bucketed write of
    * the postings, one k-row stats fold. */
  def bm25CompactIndex(spark: org.apache.spark.sql.SparkSession,
                       table: String, dst: String, buckets: Int = 8): Unit = {
    graft.sources.TableStore.dropTable(spark, dst)
    graft.sources.TableStore.dropTable(spark, dst + "_stats")
    graft.sources.TableStore.saveBucketed(spark.table(table), dst,
      Seq("term"), buckets)
    // attribute-carrying stats fold to one row per carried-attr value
    // (still exact integer sums); attribute-free stores fold to one row
    val st = spark.table(table + "_stats")
    val attrs = st.columns.filterNot(Set("n_docs", "sum_dl")).toSeq
    (if (attrs.isEmpty) st.agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
     else st.groupBy(attrs.map(col): _*)
       .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(dst + "_stats")
    spark.catalog.refreshTable(dst)
    spark.catalog.refreshTable(dst + "_stats")
  }

  /** DELETE leg of the persisted BM25 index — the takedown path the
    * append-only postings lifecycle (build q213 / absorb q217 / compact
    * q221) was missing. Two delta-sized appends, NO postings rewrite:
    *
    *   - the deleted ids land as plain (doc_id) rows in a doc-keyed
    *     TOMBSTONE table ([[bm25SearchStoreLive]] anti-joins them out —
    *     the epoch-less layout of the q263 vector store; a deleted doc
    *     id must not re-insert, the versioned-store story is the
    *     vector/token families');
    *   - the corpus stats absorb a NEGATED (−n_docs, −sum_dl) stats row
    *     computed from the deleted docs' text (CDC delete events carry
    *     the before-image), so the integer stats SUM recomposes the
    *     FINAL corpus's exact (N, avgdl) — the same mergeability that
    *     makes absorb order invisible makes deletion a negative merge.
    *
    * Caller must pass the docs' ORIGINAL text (the tokenization must
    * reproduce the rows the absorb landed, or the stats drift). */
  def bm25IndexDelete(docs: DataFrame, idCol: String, textCol: String,
                      table: String, tombTable: String,
                      buckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    val (_, stats) = postingsOf(docs, idCol, textCol)
    graft.sources.TableStore.saveBucketed(
      docs.where(length(trim(col(textCol))) > 0)
        .select(col(idCol).as("doc_id")).distinct(),
      tombTable, Seq("doc_id"), buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    stats.select((-col("n_docs")).as("n_docs"), (-col("sum_dl")).as("sum_dl"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(table + "_stats")
    spark.catalog.refreshTable(tombTable)
    spark.catalog.refreshTable(table + "_stats")
  }

  /** [[bm25SearchStore]] over a DELETE-AWARE store: postings anti-join
    * the doc-keyed tombstones before any scoring, document frequencies
    * count live postings only, and the stats sum already nets out the
    * deleted docs' negated rows — scores are EXACTLY [[bm25TopK]] over
    * the final (post-deletion) corpus. Scale shape: the tombstone side
    * is delta-sized (AQE-broadcast), keyed on the 8-byte doc id; the
    * vocabulary prune still reaches the term-bucketed scan first. */
  def bm25SearchStoreLive(spark: org.apache.spark.sql.SparkSession,
                          table: String, tombTable: String,
                          queries: Seq[(Int, Seq[String])], k: Int,
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct.sorted
    val tomb = spark.table(tombTable)
    val post = spark.table(table).where(col("term").isin(vocab: _*))
      .join(tomb, Seq("doc_id"), "left_anti")
    val stats = spark.table(table + "_stats")
      .agg(sum("n_docs").cast("double").as("n_docs"),
        (sum("sum_dl").cast("double") / sum("n_docs").cast("double")).as("avgdl"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val queryTerms = queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "qterm")
    scoreAndRank(post, dfreq, stats, queryTerms, k, k1, b)
  }

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval merge: given N ranked lists for the
    * same queries (BM25, dense ANN, a recency/authority prior …), each
    * (query, doc) scores Σ_lists 1/(rrfK + rank), summed over the lists
    * that ranked it. Rank-only fusion — no score calibration across
    * heterogeneous rankers, which is exactly why it is the default
    * hybrid merge in production search stacks.
    *
    * Engine-portable integers: each contribution quantizes to
    * ⌊10⁶/(rrfK + rank)⌋ BEFORE the sum (the [[bm25TopK]] discipline),
    * so fused scores are exact BIGINTs and the final ordering is
    * reproducible anywhere; ties break by doc id.
    *
    * Scale shape: inputs are ranked lists — queries × k rows, never
    * corpus-sized — so fusion is one union + one (query, doc) sum + one
    * per-query top-k window over model-sized frames; the corpus-sized
    * work lives in the upstream rankers.
    *
    * @param lists each (queryCol, idCol, rankCol), rank 1-based
    * @return (query_id, rank, doc_id, fused_micro), rank <= k */
  def rrfFuse(lists: Seq[DataFrame], queryCol: String, idCol: String,
              rankCol: String, k: Int = 10, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1 && rrfK >= 0, s"need k >= 1, rrfK >= 0, got $k/$rrfK")
    val u = lists.map(_.select(col(queryCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("doc_id"),
        col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
    val fused = u
      .withColumn("__c", expr(s"1000000 div ($rrfK + __r)"))
      .groupBy("query_id", "doc_id").agg(sum("__c").as("fused_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("fused_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("fused_micro"))
  }

  /** Per-rank DCG gain, micro units: ⌊10⁶ / log₂(r+1)⌋ for r = 1..k.
    * Computed ONCE driver-side and inlined as literals on both the
    * engine and the oracle side — rank-position weights are constants
    * of the metric, so no runtime float (let alone a cross-engine log)
    * ever enters the scored plan. */
  def dcgGainsMicro(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** RANKING-QUALITY EVALUATION — NDCG@k and MRR (reciprocal rank) per
    * query, the standard IR metrics (Järvelin & Kekäläinen, TOIS 2002;
    * binary relevance) a retrieval-training pipeline tracks to know
    * whether its BM25/ANN candidate generator is any good before the
    * expensive re-ranker trains on those candidates.
    *
    * Numerics: DCG's per-position gains are the [[dcgGainsMicro]]
    * INTEGER literals, so DCG/IDCG are exact BIGINT sums; NDCG and RR
    * are integer divisions (milli / micro units) — the whole metric is
    * engine-exact, no float ordering anywhere. IDCG for a query with
    * n_rel relevant docs is the gain prefix-sum at min(n_rel, k);
    * queries with no relevant docs read ndcg = 0, rr = 0.
    *
    * Scale shape: one (query, doc) equi-join of results against the
    * relevance set, one per-query aggregate, one broadcast join of the
    * queries-sized n_rel table — queries × k rows total, nothing
    * corpus-sized.
    *
    * @param results   (query_id, rank, doc_id) — ranks 1-based, ≤ k used
    * @param relevance (query_id, doc_id) binary relevant pairs
    * @return (query_id, n_rel, n_hits, dcg_micro, idcg_micro,
    *         ndcg_milli, rr_micro) */
  def rankingMetrics(results: DataFrame, relevance: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sp = results.sparkSession
    import sp.implicits._
    val gains = dcgGainsMicro(k)
    val prefix = gains.scanLeft(0L)(_ + _) // prefix(i) = gain(1)+..+gain(i)
    val gainsDf = gains.zipWithIndex.map { case (g, i) => (i + 1L, g) }
      .toDF("__gr", "__gain")
    val prefixDf = prefix.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("__cap", "idcg_micro")
    val hits = results.where(col("rank") <= k)
      .join(relevance.select(col("query_id"), col("doc_id")), Seq("query_id", "doc_id"))
      .join(broadcast(gainsDf), col("rank").cast("long") === col("__gr"))
    val perQ = hits.groupBy("query_id").agg(
      sum(col("__gain")).as("dcg_micro"),
      min(col("rank")).cast("long").as("__minr"),
      count(lit(1)).as("n_hits"))
    val nRel = relevance.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    results.select("query_id").distinct()
      .join(broadcast(nRel), Seq("query_id"), "left")
      .join(broadcast(perQ), Seq("query_id"), "left")
      .na.fill(0L, Seq("n_rel", "n_hits", "dcg_micro"))
      .join(broadcast(prefixDf),
        least(col("n_rel"), lit(k.toLong)) === col("__cap"))
      .select(col("query_id"), col("n_rel"), col("n_hits"), col("dcg_micro"),
        col("idcg_micro"),
        when(col("idcg_micro") > 0, expr("dcg_micro * 1000 div idcg_micro"))
          .otherwise(lit(0L)).as("ndcg_milli"),
        when(col("__minr").isNotNull, expr("1000000 div __minr"))
          .otherwise(lit(0L)).as("rr_micro"))
  }
}
