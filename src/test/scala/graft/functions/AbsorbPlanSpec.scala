package graft.functions

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** PLAN-SHAPE gate for the persisted-store absorb path: the claim "the
  * banded store scan is map-only behind a broadcast semi-join, with no
  * store-side Exchange" ([[DedupOps.absorbDropIds]] doc, the q99/q150
  * lifecycle's scale contract) held only as a PlanAudit printout until
  * round 11 — this spec makes it a failing assertion, so a planner or
  * operator change that reintroduces the full-store shuffle breaks the
  * build instead of silently costing a corpus-sized exchange per
  * increment at 100 TB. */
class AbsorbPlanSpec extends SparkSpec {
  import spark.implicits._

  /** Final physical plan with every adaptive wrapper unwrapped. */
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case other => other
  }

  /** All nodes of the (adaptive-unwrapped) tree, descending through
    * adaptive wrappers and materialized query stages (whose physical
    * subtree hangs off `plan`, not `children`). */
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

  test("absorbDropIds: banded store scan is map-only — no store-side Exchange") {
    val tbl = "graft_absorb_plan_store"
    val seed = (0L until 40L).map(i =>
      (i, s"seed document number $i with some shared filler words " +
        s"alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val incr = (100L until 110L).map(i =>
      (i, s"increment document $i fresh content entirely unrelated tokens " +
        s"lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    TableStore.dropTable(spark, tbl)
    TableStore.saveBucketed(DedupOps.minhashStore(seed, "text", "doc_id"),
      tbl, bucketCols = Seq("band", "band_key"), buckets = 4)
    try {
      val store = TableStore.loadTable(spark, tbl)
      val newBanded = DedupOps.minhashStore(incr, "text", "doc_id")
        .localCheckpoint(true) // increment is materialized in the lifecycle
      val drops = DedupOps.absorbDropIds(newBanded, store, k = 64, threshold = 0.5)
      drops.collect() // finalize the adaptive plan
      val plan = finalPlan(drops.queryExecution.executedPlan)
      assert(scansOf(plan, tbl).nonEmpty, s"store scan missing:\n$plan")
      // no Exchange may move store ROWS: any shuffle whose subtree holds
      // the store scan AND whose output still carries the signature
      // payload is the store shuffle this spec forbids. (The final
      // drop-id dedup exchange is increment-bounded — ids only — and
      // allowed.) A sort-merge semi-join regression puts an Exchange of
      // (sig, band, band_key) directly above the FileScan → caught.
      val offending = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, tbl).nonEmpty &&
              e.output.exists(_.name.startsWith("sig")) => e
      }
      assert(offending.isEmpty,
        s"store-side shuffle reintroduced (${offending.size} exchange(s)):\n$plan")
      // and the pruning semi-join is a broadcast (the increment side is
      // the build side) — a sort-merge semi would be the store shuffle
      // this spec exists to forbid
      val semiText = plan.toString
      assert(semiText.contains("BroadcastHashJoin") && semiText.contains("LeftSemi"),
        s"expected a broadcast left-semi prune:\n$semiText")
    } finally {
      TableStore.dropTable(spark, tbl)
    }
  }

  test("ivfSearchStore: cid-bucketed store scan is map-only — probe cells broadcast") {
    val tbl = "graft_ivf_plan_store"
    val rng = new scala.util.Random(41)
    val corpus = (0L until 200L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val cent = corpus.where($"vec_id" % 20 === 0).localCheckpoint(true)
    TableStore.dropTable(spark, tbl)
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(corpus, "vec_id", "embedding", cent, "vec_id"),
      tbl, bucketCols = Seq("cid"), buckets = 4)
    try {
      val store = TableStore.loadTable(spark, tbl)
      val probes = corpus.where($"vec_id" < 3)
      val res = SimilarityOps.ivfSearchStore(store, probes, cent,
        "vec_id", "vec_id", "vec_id", "embedding", k = 5,
        probeFraction = 0.25, minProbe = 2)
      res.collect()
      val plan = finalPlan(res.queryExecution.executedPlan)
      assert(scansOf(plan, tbl).nonEmpty, s"store scan missing:\n$plan")
      // the per-probe top-k exchange carries only (probe_id, nbr_id,
      // score); any Exchange that still moves the store's VECTOR payload
      // is the corpus shuffle the broadcast probe-cell join exists to
      // avoid (a sort-merge regression on cid would be caught here)
      val offending = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, tbl).nonEmpty &&
              e.output.exists(a => a.name == "embedding" || a.name.startsWith("__c")) => e
      }
      assert(offending.isEmpty,
        s"store vectors shuffled (${offending.size} exchange(s)):\n$plan")
    } finally {
      TableStore.dropTable(spark, tbl)
    }
  }
}
