package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{lit, sum}

class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  // the operator's exact arithmetic, re-derived independently here:
  // Lucene-idf BM25 with per-term micro-integer contributions
  private def contribMicro(tf: Long, dl: Long, df: Long, n: Long,
                           avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Long =
    math.round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)) * 1e6)

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date")
  ).toDF("doc_id", "text")
  private val avgdl = (3 + 2 + 4) / 3.0

  test("single-term query ranks by tf/length-normalized score") {
    val got = RetrievalOps.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("apple")), k = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Long)].collect.toSeq
    val d1 = contribMicro(tf = 2, dl = 3, df = 2, n = 3, avgdl = avgdl)
    val d3 = contribMicro(tf = 1, dl = 4, df = 2, n = 3, avgdl = avgdl)
    assert(d1 > d3)
    assert(got == Seq((1L, 1L, 1L, d1), (1L, 2L, 3L, d3)))
  }

  test("multi-term scores sum per-term micro contributions; rarer terms weigh more") {
    val got = RetrievalOps.bm25TopK(docs, "doc_id", "text",
      Seq(2 -> Seq("banana", "date")), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect.toSeq
    val d1 = contribMicro(1, 3, 2, 3, avgdl) // banana in doc1
    val d2 = contribMicro(1, 2, 2, 3, avgdl) // banana in shorter doc2
    val d3 = contribMicro(1, 4, 1, 3, avgdl) // rare date in doc3
    assert(d3 > d2 && d2 > d1, "idf must dominate for the rarer term")
    assert(got == Seq((2L, 1L, 3L, d3), (2L, 2L, 2L, d2), (2L, 3L, 1L, d1)))
  }

  test("k truncates per query; docs without any query term never appear") {
    val got = RetrievalOps.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("apple"), 2 -> Seq("cherry")), k = 1)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect.toSeq
    assert(got.map(r => (r._1, r._3)) == Seq((1L, 1L), (2L, 3L)))
  }

  test("ties on integer score break by doc_id ascending") {
    val twin = Seq((10L, "kiwi"), (7L, "kiwi"), (2L, "pear")).toDF("doc_id", "text")
    val got = RetrievalOps.bm25TopK(twin, "doc_id", "text",
      Seq(1 -> Seq("kiwi")), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect.toSeq
    assert(got.map(_._3) == Seq(7L, 10L))
    assert(got.map(_._4).distinct.size == 1)
  }

  test("bm25IndexAbsorb/bm25SearchStore: absorbed-store search ≡ one-shot bm25TopK, any batch split") {
    val tbl = "graft_test_bm25_idx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    val queries = Seq(1 -> Seq("apple", "cherry"), 2 -> Seq("banana"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSet
    val oneShot = rows(RetrievalOps.bm25TopK(docs, "doc_id", "text", queries, k = 3))
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" % 2 === 0), "doc_id", "text", tbl)
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" % 2 === 1), "doc_id", "text", tbl)
    val stored = rows(RetrievalOps.bm25SearchStore(spark, tbl, queries, k = 3))
    assert(stored == oneShot)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats"): Unit
  }

  test("bm25IndexDelete/bm25SearchStoreLive: post-delete search ≡ one-shot bm25TopK over the survivors") {
    // the takedown law: doc-keyed tombstones + NEGATED stats rows must
    // make the delete-aware read score EXACTLY the surviving corpus —
    // wrong avgdl/df/N after a delete is BM25's silent-corruption mode
    val tbl = "graft_test_bm25_del"
    val ttbl = "graft_test_bm25_del_tomb"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    spark.sql(s"DROP TABLE IF EXISTS $ttbl")
    val queries = Seq(1 -> Seq("apple", "cherry"), 2 -> Seq("banana"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSet
    RetrievalOps.bm25IndexAbsorb(docs, "doc_id", "text", tbl)
    graft.sources.TableStore.saveBucketed(
      docs.select("doc_id").where(lit(false)), ttbl,
      Seq("doc_id"), buckets = 4)
    RetrievalOps.bm25IndexDelete(docs.where($"doc_id" === 2L), "doc_id",
      "text", tbl, ttbl, buckets = 4)
    val live = rows(RetrievalOps.bm25SearchStoreLive(spark, tbl, ttbl,
      queries, k = 3))
    val oneShot = rows(RetrievalOps.bm25TopK(docs.where($"doc_id" =!= 2L),
      "doc_id", "text", queries, k = 3))
    assert(live == oneShot,
      s"delete-aware search diverged from the survivor corpus:\n$live\nvs\n$oneShot")
    assert(live.forall(_._3 != 2L), "the deleted doc was served")
    // the stats SUM nets out: 2 rows (absorb + negated delete) recompose
    // the survivor corpus's exact integer (n_docs, sum_dl)
    val st = spark.table(tbl + "_stats")
      .agg(sum("n_docs"), sum("sum_dl")).head()
    assert(st.getLong(0) == 2L && st.getLong(1) == 3L + 4L,
      s"netted stats ${st} != survivor corpus (2 docs, 7 tokens)")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    spark.sql(s"DROP TABLE IF EXISTS $ttbl"): Unit
  }

  test("bm25CompactIndex: compacted search == fragmented search, stats fold to one row") {
    val tbl = "graft_test_bm25_compact_src"
    val dst = "graft_test_bm25_compact_dst"
    for (t <- Seq(tbl, dst); sfx <- Seq("", "_stats"))
      spark.sql(s"DROP TABLE IF EXISTS $t$sfx")
    val queries = Seq(1 -> Seq("apple", "cherry"), 2 -> Seq("banana"))
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" % 2 === 0), "doc_id", "text", tbl)
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" % 2 === 1), "doc_id", "text", tbl)
    assert(spark.table(tbl + "_stats").count() == 2)
    RetrievalOps.bm25CompactIndex(spark, tbl, dst)
    assert(spark.table(dst + "_stats").count() == 1)
    def rows(t: String) = RetrievalOps.bm25SearchStore(spark, t, queries, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSet
    assert(rows(dst) == rows(tbl))
    for (t <- Seq(tbl, dst); sfx <- Seq("", "_stats"))
      spark.sql(s"DROP TABLE IF EXISTS $t$sfx"): Unit
  }

  test("rrfFuse: hand-computed fusion, membership-sum semantics, top-k cut") {
    // list A: q1 ranks docs 10,20,30; list B: q1 ranks docs 20,10,40
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 10L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val got = RetrievalOps.rrfFuse(Seq(a, b), "query_id", "doc_id", "rank",
        k = 3, rrfK = 60)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("fused_micro"))).toSet
    // 10: 1/61 + 1/62 -> 16393 + 16129 = 32522; 20: 1/62 + 1/61 = 32522
    // (tie, doc 10 wins by id); 30: 1/63 = 15873; 40: 1/63 = 15873 —
    // k=3 keeps 10, 20, 30 (30 beats 40 by id at equal score)
    assert(got == Set((1L, 10L, 32522L), (2L, 20L, 32522L), (3L, 30L, 15873L)))
  }

  test("rankingMetrics: NDCG/MRR integer arithmetic on a hand-computed fixture") {
    val gains = RetrievalOps.dcgGainsMicro(3)
    assert(gains == Seq(1000000L, 630929L, 500000L))
    val results = Seq(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L), // q1 ranks docs 10,11,12
      (2L, 1L, 10L), (2L, 2L, 13L)                 // q2 ranks docs 10,13
    ).toDF("query_id", "rank", "doc_id")
    val rel = Seq((1L, 11L), (1L, 14L), (1L, 15L), (1L, 16L)) // q1: 4 relevant, one ranked at 2
      .toDF("query_id", "doc_id")
    val out = RetrievalOps.rankingMetrics(results, rel, k = 3)
      .orderBy("query_id").collect()
    assert(out.length == 2)
    val q1 = out(0)
    // dcg = gain(2); idcg = prefix(min(4,3)) = sum of all three gains
    val idcg = gains.sum
    assert(q1.getAs[Long]("n_rel") == 4L && q1.getAs[Long]("n_hits") == 1L)
    assert(q1.getAs[Long]("dcg_micro") == 630929L)
    assert(q1.getAs[Long]("idcg_micro") == idcg)
    assert(q1.getAs[Long]("ndcg_milli") == 630929L * 1000 / idcg)
    assert(q1.getAs[Long]("rr_micro") == 500000L) // first hit at rank 2
    val q2 = out(1) // no relevant docs: all-zero metrics, no division blowups
    assert(q2.getAs[Long]("n_rel") == 0L && q2.getAs[Long]("idcg_micro") == 0L)
    assert(q2.getAs[Long]("ndcg_milli") == 0L && q2.getAs[Long]("rr_micro") == 0L)
  }
}
