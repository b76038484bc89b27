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
}
