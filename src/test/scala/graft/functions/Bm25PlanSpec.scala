package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** PLAN-SHAPE gate for the persisted BM25 index search path: the claim
  * "postings are pruned to the query vocabulary by predicate pushdown
  * into the term-bucketed scan, and the store never shuffles its
  * (term, doc, tf, dl) payload" ([[RetrievalOps.bm25SearchStore]] doc —
  * the q213 scale contract) as a FAILING ASSERTION: a planner or
  * operator change that drops the pushdown or reintroduces a postings
  * shuffle breaks the build instead of silently costing a corpus-sized
  * scan-and-exchange per query at 100 TB ([[AbsorbPlanSpec]]'s
  * discipline applied to the text index). */
class Bm25PlanSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case other => other
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = finalPlan(p)
    val kids = self match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self +: kids.flatMap(allNodes)
  }

  private def scansOf(p: SparkPlan, tbl: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case s: FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains(tbl)) => s
    }

  test("bm25SearchStore: vocabulary pushdown reaches the postings scan; postings payload never shuffles") {
    val tbl = "graft_bm25_plan_store"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i alpha beta gamma delta token$i filler words epsilon zeta"))
      .toDF("doc_id", "text")
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" < 20), "doc_id", "text", tbl)
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" >= 20), "doc_id", "text", tbl)
    try {
      val res = RetrievalOps.bm25SearchStore(spark, tbl,
        Seq(1 -> Seq("alpha", "zeta"), 2 -> Seq("gamma")), k = 5)
      res.collect() // finalize the adaptive plan
      val plan = finalPlan(res.queryExecution.executedPlan)
      val scans = scansOf(plan, tbl)
        .filterNot(_.relation.location.inputFiles.exists(_.contains("_stats")))
      assert(scans.nonEmpty, s"postings scan missing:\n$plan")
      // 1. the query-vocabulary prune is PUSHED DOWN: every postings scan
      //    carries an In(term, ...) pushed filter — losing it means the
      //    full posting list is read for every query at corpus scale
      scans.foreach { s =>
        val pushed = s.metadata.getOrElse("PushedFilters", "")
        assert(pushed.contains("In(term"),
          s"vocabulary pushdown lost on the postings scan (PushedFilters=$pushed):\n$plan")
      }
      // 2. no Exchange may move postings ROWS: any shuffle whose subtree
      //    holds the postings scan AND whose output still carries the
      //    tf/dl payload is the store shuffle this spec forbids (the
      //    score aggregate's exchange is (query, doc, partial-sum) rows;
      //    df and stats travel as broadcasts)
      val offending = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, tbl).nonEmpty &&
              e.output.exists(a => a.name == "tf" || a.name == "dl") => e
      }
      assert(offending.isEmpty,
        s"postings shuffle reintroduced (${offending.size} exchange(s)):\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats"): Unit
    }
  }

  test("bm25SearchStoreFiltered: attribute predicate reaches the postings scan; scores ≡ one-shot over the pre-filtered corpus") {
    val tbl = "graft_bm25_plan_filtered"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    val docs = (0L until 40L).map(i =>
      (i, s"src${i % 4}",
        s"doc $i alpha beta gamma delta token$i filler words epsilon zeta"))
      .toDF("doc_id", "src", "text")
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" < 20), "doc_id", "text",
      tbl, carryCols = Seq("src"))
    RetrievalOps.bm25IndexAbsorb(docs.where($"doc_id" >= 20), "doc_id", "text",
      tbl, carryCols = Seq("src"))
    try {
      val queries = Seq(1 -> Seq("alpha", "zeta"), 2 -> Seq("gamma"))
      val res = RetrievalOps.bm25SearchStoreFiltered(spark, tbl, queries,
        $"src".isin("src0", "src1"), k = 5)
      val got = res.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
      // pre-filter parity: identical to a one-shot bm25TopK over the
      // filtered subcorpus — df, n_docs, avgdl all recomposed from the
      // matching postings/stats rows, not the whole corpus's
      val want = RetrievalOps.bm25TopK(docs.where($"src".isin("src0", "src1")),
          "doc_id", "text", queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"filtered-store search diverged:\ngot  $got\nwant $want")
      // the attribute filter must be PUSHED into the postings scan —
      // filtering after the read would scan every source's postings
      val plan = finalPlan(res.queryExecution.executedPlan)
      val scans = scansOf(plan, tbl)
        .filterNot(_.relation.location.inputFiles.exists(_.contains("_stats")))
      assert(scans.nonEmpty, s"postings scan missing:\n$plan")
      scans.foreach { s =>
        val pushed = s.metadata.getOrElse("PushedFilters", "")
        assert(pushed.contains("In(src") && pushed.contains("In(term"),
          s"attribute/vocabulary pushdown lost (PushedFilters=$pushed):\n$plan")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats"): Unit
    }
  }
}
